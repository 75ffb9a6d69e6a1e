package graft.operators

import graft.SharedSparkSpec

/** Cross-checks the approximate dedup paths against the exact one:
  * q24 (MinHash-LSH candidates, exact-verified) must be a subset of
  * q36 (exhaustive inverted-index Jaccard), and must not miss any
  * high-similarity pair (P(miss | J>=0.8) ≈ 3e-4 with 16×4 banding).
  */
class DedupSpec extends SharedSparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("minhash candidates ⊆ exact jaccard pairs; no high-J pair missed") {
    val minhash = pairs(SimilarityQueries.q24.run(spark, sf001))
    val exact = pairs(TextQueries.q36.run(spark, sf001))
    assert(minhash.nonEmpty, "minhash found no near-dup pairs")
    assert(minhash.subsetOf(exact),
      s"minhash produced pairs outside the exact set: ${minhash.diff(exact).take(3)}")
    val high = exact.filter(_._3 >= 0.8)
    assert(high.subsetOf(minhash),
      s"minhash missed high-similarity pairs: ${high.diff(minhash).take(3)}")
  }

  test("simhash pair list is deterministic and hamming-bounded") {
    val a = SimilarityQueries.q35.run(spark, sf001).collect().toSeq
    val b = SimilarityQueries.q35.run(spark, sf001).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall(_.getInt(2) <= 8))
  }
}
