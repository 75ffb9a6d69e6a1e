package graft.operators

import graft.SharedSparkSpec

/** q184 (index compaction): folding the two-generation postings index back
  * to one file per bucket must lose nothing, collapse the file count to
  * exactly the bucket count, and buy back the single-generation serving
  * plan — no exchange AND no per-partition sort (Spark reports a bucketed
  * scan as sorted only when every bucket holds ≤1 file, so q181's
  * multi-generation plan needs local sorts where q184's must not).
  */
class PostingsCompactSpec extends SharedSparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q184 equals q36 row-for-row (compaction is lossless)") {
    val live = pairs(TextQueries.q36.run(spark, sf001))
    val compacted = pairs(TextQueries.q184.run(spark, sf001))
    assert(compacted == live)
    assert(compacted.nonEmpty)
  }

  test("compaction folds the generations to exactly one file per bucket") {
    val t = new graft.Tables(spark, sf001)
    val st = TextQueries.compactedPostingsStats(t)
    assert(st.filesAfter == 8, s"expected 8 bucket files, got ${st.filesAfter}")
    assert(st.filesBefore > st.filesAfter,
      s"append left ${st.filesBefore} files; compaction must shrink that")
    // Nothing lost in the fold.
    val rows = spark.table(st.table).count()
    val appended = TextQueries.appendedPostingsStats(t)
    assert(rows == appended.basePostings + appended.deltaPostings)
  }

  test("q184: no exchange ever; the sort is elidable ONLY post-compaction") {
    // Spark reports a bucketed scan's output ordering only under the legacy
    // flag (the files-per-bucket check was deemed too costly to run by
    // default, SPARK-28709 lineage) — enable it to make the ordering
    // visible, then the contrast is exact: the compacted table (1 file per
    // bucket) serves its self-join with NO exchange and NO sort, while the
    // two-generation appended table still needs the local sorts (multiple
    // sorted files per bucket concatenate unsorted). That delta IS the
    // compaction payoff.
    val t = new graft.Tables(spark, sf001)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      def planOf(table: String): String = {
        val idx = spark.table(table)
        idx.as("a").join(idx.as("b"), Seq("s"))
          .queryExecution.executedPlan.toString
      }
      val compacted = planOf(TextQueries.compactedPostingsStats(t).table)
      assert(compacted.contains("Bucketed: true"), compacted.take(1500))
      assert(!compacted.contains("Exchange hashpartitioning(s"), compacted.take(1500))
      assert(!compacted.contains("Sort ["),
        "compacted one-file-per-bucket join still sorts:\n" + compacted.take(1500))
      val appended = planOf(TextQueries.appendedPostingsStats(t).table)
      assert(!appended.contains("Exchange hashpartitioning(s"), appended.take(1500))
      assert(appended.contains("Sort ["),
        "multi-generation join unexpectedly sort-free — contrast assertion stale")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
