package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q183 (incremental minhash band maintenance): appending a delta batch
  * into the stored (band, bh)-bucketed index must answer exactly like the
  * from-scratch build (q145, itself pinned to the live q24), touch only
  * delta-sized data, and keep the candidate self-join exchange-free.
  */
class MinhashAppendSpec extends SharedSparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q183 equals q24 and q145 row-for-row (the two-generation index is lossless)") {
    val live = pairs(SimilarityQueries.q24.run(spark, sf001))
    val stored = pairs(SimilarityQueries.q145.run(spark, sf001))
    val appended = pairs(SimilarityQueries.q183.run(spark, sf001))
    assert(appended == live)
    assert(appended == stored)
    assert(appended.nonEmpty)
  }

  test("the append wrote only the delta docs' band rows into new files") {
    val t = new graft.Tables(spark, sf001)
    val st = SimilarityQueries.appendedBandStats(t)
    assert(st.deltaFiles.nonEmpty)
    assert((st.baseFiles & st.deltaFiles).isEmpty)
    assert(spark.table(st.table).inputFiles.toSet == st.baseFiles ++ st.deltaFiles)
    val deltaRows = spark.read.parquet(st.deltaFiles.toSeq: _*).count()
    assert(deltaRows == st.deltaRows)
    // Exactly Bands rows per eligible delta doc — nothing re-signed.
    val eligibleDelta = t.documents
      .filter(pmod(col("doc_id"), lit(8)) === 0)
      .filter(size(split(col("text"), " ")) >= 5)
      .count()
    assert(deltaRows == eligibleDelta * SimilarityQueries.Bands,
      s"delta generation has $deltaRows band rows, expected ${eligibleDelta} x Bands")
    // Base + delta == one full build (LayoutBuildBoundsSpec's closed form).
    val full = spark.table(SimilarityQueries.minhashBandTable(t)).count()
    assert(st.baseRows + st.deltaRows == full)
  }

  test("q183: candidate join runs off the bucketing — no exchange on band/bh") {
    // q183's candidate pairs hide behind a localCheckpoint in the served
    // plan, so assert on the join itself (the MinhashLayoutSpec pattern);
    // the MULTI-GENERATION scan is the new thing under test here. Broadcast
    // disabled to pin the 100 TB shape (an index too big to broadcast).
    val t = new graft.Tables(spark, sf001)
    val idx = spark.table(SimilarityQueries.appendedBandStats(t).table)
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
        "appended band self-join re-shuffled its bucket keys:\n" + p.take(1500))
    } finally spark.conf.set(key, prev)
  }

  test("appended band layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(SimilarityQueries.appendedBandStats(t).table ==
      SimilarityQueries.appendedBandStats(t).table)
  }
}
