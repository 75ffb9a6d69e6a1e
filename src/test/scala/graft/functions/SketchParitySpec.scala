package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The per-row sketch expressions and the typed Aggregators must implement
  * the SAME hash family: a pipeline may sketch bounded arrays map-side
  * (expressions) and row-shaped/streaming inputs via the aggregators, and
  * the signatures must be interchangeable. Also pins interpreted == codegen.
  */
class SketchParitySpec extends SharedSparkSpec {

  private def shingleTable = {
    val d = new Tables(spark, sf001).documents.filter(col("doc_id") < 100)
    d.select(col("doc_id"), graft.dsl.toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), graft.dsl.shingles(col("tk"), 5).as("sh"))
  }

  test("MinHashSignature expression == MinHashSigAgg aggregator, same family") {
    val viaExpr = shingleTable
      .select(col("doc_id"), MinHashSignature(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // aggregator path: explode, hash with the SAME seeds, aggregate
    val minhash = udaf(SketchAggregators.MinHashSigAgg)
    val viaAgg = shingleTable
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"),
        xxhash64(col("s")).as("h1"), // xxhash64 == XXH64 seed 42 == Seed1
        SimHashParityHelper.h2(col("s")).as("h2"))
      .groupBy("doc_id").agg(minhash(col("h1"), col("h2")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaAgg)
  }

  test("SimHashSignature expression == SimHashAgg aggregator") {
    val docs = new Tables(spark, sf001).documents.filter(col("doc_id") < 100)
    val viaExpr = docs
      .select(col("doc_id"), SimHashSignature(graft.dsl.toks(col("text"))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = udaf(SketchAggregators.SimHashAgg)
    val viaAgg = docs
      .select(col("doc_id"), explode(graft.dsl.toks(col("text"))).as("tk"))
      .select(col("doc_id"), xxhash64(col("tk")).as("h"))
      .groupBy("doc_id").agg(agg(col("h")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaAgg)
  }

  test("interpreted eval matches codegen; null and empty arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val lit = Literal.create(Array("alpha", "beta", "gamma"), ArrayType(StringType))
    val interpMin = MinHashSignature(lit).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaDfMin = spark.sql("SELECT array('alpha','beta','gamma') AS a")
      .select(MinHashSignature(col("a"))).collect().head.getSeq[Long](0)
    assert(interpMin == viaDfMin)
    val interpSim = SimHashSignature(lit).eval(null).asInstanceOf[Long]
    val viaDfSim = spark.sql("SELECT array('alpha','beta','gamma') AS a")
      .select(SimHashSignature(col("a"))).collect().head.getLong(0)
    assert(interpSim == viaDfSim)
    // empty array: all-MaxValue mins / zero-vote signature, not a crash
    val empty = spark.sql("SELECT CAST(array() AS array<string>) AS a")
      .select(MinHashSignature(col("a")), SimHashSignature(col("a"))).collect().head
    assert(empty.getSeq[Long](0).forall(_ == Long.MaxValue))
    assert(empty.getLong(1) == 0L)
    // null in, null out
    val nulled = spark.sql("SELECT CAST(NULL AS array<string>) AS a")
      .select(MinHashSignature(col("a")), SimHashSignature(col("a"))).collect().head
    assert(nulled.isNullAt(0) && nulled.isNullAt(1))
  }
}

/** Bridge for the aggregator-parity test: exposes the expressions' second
  * hash seed as a column function (Spark's xxhash64 only exposes seed 42). */
object SimHashParityHelper {
  import org.apache.spark.sql.Column
  def h2(c: Column): Column = {
    val e = org.apache.spark.sql.GraftShims.expression(c)
    org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(e), SketchExpressions.Seed2))
  }
}
