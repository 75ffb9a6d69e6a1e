package graft.operators

import graft.SharedSparkSpec

/** q145 (MinHash band index at rest): serving from the stored bucketed
  * index must reproduce q24's near-dup pairs row-for-row, the band
  * self-join must run off the bucketing without re-shuffling its keys, and
  * the layout must build once per (session, dir).
  */
class MinhashLayoutSpec extends SharedSparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q145 equals q24 row-for-row (stored bands find the same candidates)") {
    val live = pairs(SimilarityQueries.q24.run(spark, sf001))
    val stored = pairs(SimilarityQueries.q145.run(spark, sf001))
    assert(stored == live)
    assert(stored.nonEmpty)
  }

  test("q145: band self-join runs off the bucketing — no exchange on band/bh") {
    // the fixture index fits under the broadcast threshold, where the
    // planner rightly broadcasts and bypasses the bucketing (also shuffle-
    // free); pin the 100 TB shape — an index too big to broadcast — by
    // disabling broadcast for the assertion
    val t = new graft.Tables(spark, sf001)
    val idx = spark.table(SimilarityQueries.minhashBandTable(t))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = idx.as("l")
        .join(idx.as("r"), Seq("band", "bh"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("Exchange hashpartitioning(bh") &&
        !p.contains("Exchange hashpartitioning(band"),
        "band join re-shuffled the stored bucket key:\n" + p.take(1500))
    } finally spark.conf.set(key, prev)
  }

  test("minhash band layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(SimilarityQueries.minhashBandTable(t) == SimilarityQueries.minhashBandTable(t))
  }
}
