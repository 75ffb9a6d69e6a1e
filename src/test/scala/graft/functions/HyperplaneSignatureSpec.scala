package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The fused-loop signature must equal a per-plane Scala model (sign of the
  * double-precision dot against each plane), and interpreted eval must match
  * the codegen path — q49's bucketing is only deterministic if both agree. */
class HyperplaneSignatureSpec extends SharedSparkSpec {

  private val planes: IndexedSeq[Double] = {
    val rng = new scala.util.Random(7L)
    IndexedSeq.fill(32 * 64)(rng.nextGaussian())
  }

  private def model(emb: Array[Float]): Long = {
    var sig = 0L
    for (p <- 0 until 32) {
      var dot = 0.0
      for (i <- 0 until math.min(emb.length, 64)) dot += emb(i).toDouble * planes(p * 64 + i)
      if (dot > 0) sig |= (1L << p)
    }
    sig
  }

  test("codegen signature == Scala model over first 100 embeddings") {
    val e = new Tables(spark, sf001).embeddings.filter(col("vec_id") < 100)
    val rows = e.select(col("embedding"),
      HyperplaneSignature(col("embedding"), planes, 64).as("sig")).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val emb = r.getSeq[Float](0).toArray
      assert(r.getLong(1) == model(emb))
    }
  }

  test("interpreted eval matches codegen; null in, null out") {
    val litEmb = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(0.5f, -1.5f, 2.0f),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interp = HyperplaneSignature(litEmb, planes, 64).eval(null).asInstanceOf[Long]
    val viaDf = spark.sql("SELECT CAST(array(0.5, -1.5, 2.0) AS array<float>) AS e")
      .select(HyperplaneSignature(col("e"), planes, 64)).collect().head.getLong(0)
    assert(interp == viaDf)
    assert(interp == model(Array(0.5f, -1.5f, 2.0f)))
    val nulled = spark.sql("SELECT CAST(NULL AS array<float>) AS e")
      .select(HyperplaneSignature(col("e"), planes, 64)).collect().head
    assert(nulled.isNullAt(0))
  }
}
