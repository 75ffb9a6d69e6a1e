package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q181 (incremental postings maintenance): appending a delta batch into the
  * stored bucketed index must (1) answer exactly like a from-scratch build —
  * i.e. like q36's live shingling over the full corpus, (2) touch only
  * delta-sized data — the base generation's files stay byte-identical and
  * the delta files hold exactly the delta docs' postings, and (3) keep the
  * serving self-join exchange-free off the table bucketing.
  */
class PostingsAppendSpec extends SharedSparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q181 equals q36 row-for-row (the two-generation index is lossless)") {
    val live = pairs(TextQueries.q36.run(spark, sf001))
    val appended = pairs(TextQueries.q181.run(spark, sf001))
    assert(appended == live)
    assert(appended.nonEmpty)
  }

  test("the append wrote only delta-sized data into new bucket-aligned files") {
    val t = new graft.Tables(spark, sf001)
    val st = TextQueries.appendedPostingsStats(t)
    // The delta generation is new files only — base files survive the append
    // (no rewrite, no compaction-in-disguise).
    assert(st.deltaFiles.nonEmpty)
    assert((st.baseFiles & st.deltaFiles).isEmpty)
    assert(spark.table(st.table).inputFiles.toSet == st.baseFiles ++ st.deltaFiles)
    // The delta files hold EXACTLY the delta docs' postings: the append job
    // never re-shingled or re-wrote any base doc.
    val deltaRows = spark.read.parquet(st.deltaFiles.toSeq: _*).count()
    assert(deltaRows == st.deltaPostings)
    val expectedDelta = t.documents
      .filter(pmod(col("doc_id"), lit(8)) === 0)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("tk")) - 5),
          i => concat_ws(" ", slice(col("tk"), i + 1, lit(5))))).as("sh"))
      .distinct()
      .count()
    assert(deltaRows == expectedDelta,
      s"delta generation has $deltaRows postings, expected $expectedDelta")
    // And it is a small fraction of the index: the whole point of the append.
    assert(st.deltaPostings < st.basePostings / 4,
      s"delta ${st.deltaPostings} vs base ${st.basePostings} — split drifted?")
  }

  test("q181: serving join runs off the bucketing — no hash exchange on s") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = TextQueries.q181.run(spark, sf001).queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("Exchange hashpartitioning(s"),
        "appended postings self-join re-shuffled its own bucket key:\n" + p.take(1500))
    } finally spark.conf.set(key, prev)
  }

  test("appended layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(TextQueries.appendedPostingsStats(t).table ==
      TextQueries.appendedPostingsStats(t).table)
  }
}
