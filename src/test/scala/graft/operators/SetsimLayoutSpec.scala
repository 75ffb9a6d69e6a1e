package graft.operators

import graft.SharedSparkSpec

/** q230 (set-sim prefix index at rest): serving q151's exact join from the
  * stored bucketed prefix + shingle-array tables must reproduce q151
  * row-for-row (the DuckDB hash gate additionally proves the layout
  * round-trip lossless), the prefix candidate self-join must run off the
  * `s` bucketing without re-shuffling it, the layout must build once per
  * (session, dir), and the served plan must never scan documents text
  * (the corpus pass is paid at build).
  */
class SetsimLayoutSpec extends SharedSparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q230 equals q151 row-for-row (stored indexes find the same pairs)") {
    val live = rows(TextQueries.q151.run(spark, sf001))
    val stored = rows(TextQueries.q230.run(spark, sf001))
    assert(stored == live)
    assert(stored.nonEmpty)
  }

  test("q230: prefix self-join runs off the bucketing — no exchange on s") {
    val t = new graft.Tables(spark, sf001)
    val (preT, _) = TextQueries.setsimIndexTables(t)
    val idx = spark.table(preT)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = idx.as("a")
        .join(idx.as("b"), Seq("s"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("Exchange hashpartitioning(s#") &&
        !p.contains("Exchange hashpartitioning(s,"),
        "prefix join re-shuffled the stored bucket key:\n" + p.take(1500))
    } finally spark.conf.set(key, prev)
  }

  test("setsim layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(TextQueries.setsimIndexTables(t) == TextQueries.setsimIndexTables(t))
  }

  test("the served plan reads the layout, never documents text") {
    val df = TextQueries.q230.run(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    val docScans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet"))
    assert(docScans == 0, s"served layout plan scans documents:\n${plan.take(1500)}")
    assert(plan.contains("Bucketed: true"), "serve must read the bucketed layout")
  }
}
