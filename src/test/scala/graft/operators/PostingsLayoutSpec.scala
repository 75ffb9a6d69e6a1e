package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q144 (postings index at rest): the stored bucketed index must answer the
  * n-gram Jaccard query identically to q36's live shingling, the serving
  * join must run exchange-free off the bucketing, and the layout must build
  * once per (session, dir).
  */
class PostingsLayoutSpec extends SharedSparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q144 equals q36 row-for-row (the layout is lossless)") {
    val live = pairs(TextQueries.q36.run(spark, sf001))
    val stored = pairs(TextQueries.q144.run(spark, sf001))
    assert(stored == live)
    assert(stored.nonEmpty)
  }

  test("q144: self-join runs off the bucketing — no hash exchange on s, no sort") {
    // pin the 100 TB shape (an index too big to broadcast) by disabling
    // broadcast: below the threshold the planner may legitimately broadcast
    // the probe side and bypass the bucketing, which is also shuffle-free
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = TextQueries.q144.run(spark, sf001).queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("Exchange hashpartitioning(s"),
        "postings self-join re-shuffled its own bucket key:\n" + p.take(1500))
    } finally spark.conf.set(key, prev)
  }

  test("postings layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(TextQueries.postingsTable(t) == TextQueries.postingsTable(t))
  }

  test("q144 never touches the corpus: no documents scan, no text column anywhere") {
    // the point of the index at rest — sizes, candidates and Jaccard all
    // derive from the stored postings; a regression that re-shingles the
    // corpus per query would re-introduce the documents scan
    val p = TextQueries.q144.run(spark, sf001).queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"), p.take(1500))
    assert(!p.contains("text#"), p.take(1500))
  }
}
