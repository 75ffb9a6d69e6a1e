package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q86: the count-min guarantee must hold against exact counts —
  * never an undercount, overcount bounded by ε·N. */
class CmsSpec extends SharedSparkSpec {

  test("q86: exact <= estimate <= exact + eps * total tokens") {
    val rows = SketchQueries.q86.run(spark, sf001).collect()
    assert(rows.length == 20)
    val totalTokens = new Tables(spark, sf001).documents
      .select(explode(split(col("text"), " "))).count()
    val slack = math.ceil(0.001 * totalTokens).toLong
    rows.foreach { r =>
      val (term, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$term: CMS undercounted ($est < $exact)")
      assert(est <= exact + slack, s"$term: overcount $est > $exact + $slack")
    }
  }

  test("CmsEstimateCount matches driver-side CountMinSketch.estimateCount exactly") {
    val docs = new Tables(spark, sf001).documents
    val tokens = docs.select(explode(split(col("text"), " ")).as("tok"))
    val skBytes = tokens
      .agg(count_min_sketch(col("tok"), lit(0.001d), lit(0.99d), lit(42)).as("sk"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val probes = tokens.distinct().limit(50).collect().map(_.getString(0))
    val viaExpr = tokens.distinct().limit(50)
      .withColumn("sk", lit(skBytes))
      .select(col("tok"), CmsEstimateCount(col("sk"), col("tok")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { tok =>
      assert(viaExpr(tok) == cms.estimateCount(tok),
        s"$tok: expression ${viaExpr(tok)} != driver ${cms.estimateCount(tok)}")
    }
    // and the SQL-injected form is the same implementation
    tokens.limit(5).withColumn("sk", lit(skBytes)).createOrReplaceTempView("cms_probe_v")
    val viaSql = spark.sql(
      "SELECT tok, graft_cms_estimate(sk, tok) AS est FROM cms_probe_v").collect()
    viaSql.foreach(r => assert(r.getLong(1) == cms.estimateCount(r.getString(0))))
  }
}
