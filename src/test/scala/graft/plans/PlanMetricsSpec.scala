package graft.plans

import graft.SharedSparkSpec

/** Runtime evidence for the scale claims: not "the plan STRING says
  * pushdown" but "the filter/shuffle METRICS show it happened".
  *
  * Numbers are compared as RATIOS: the final ORDER BY's range partitioner
  * runs a sampling job over the same stage, so absolute operator metrics
  * double-count — but both sides of every ratio double together. Record-level
  * parquet filtering is off by default in Spark (pushdown prunes row groups
  * and pages), so the scan emits the file's rows and the FilterExec is where
  * selectivity must show up. */
class PlanMetricsSpec extends SharedSparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q02: the filter keeps well under a third of scanned rows") {
    val r = PlanMetrics.run(q("q02_filter"))
    assert(r.scanOutputRows.nonEmpty && r.filterOutputRows.nonEmpty)
    assert(r.filterOutputRows.min < r.scanOutputRows.max / 3,
      s"filter kept ${r.filterOutputRows.min} of ${r.scanOutputRows.max} scanned rows")
    assert(r.rows > 0)
  }

  test("q69: the bloom probe discards most fact rows before the join") {
    val r = PlanMetrics.run(q("q69_bloom_join"))
    // two filters run: the dim's brand filter (smaller output) and the
    // fact's might_contain probe (the larger one) — the probe must cut the
    // fact stream to a fraction of the scanned rows before the semi-join
    val probe = r.filterOutputRows.max
    val factScan = r.scanOutputRows.max
    assert(probe < factScan / 4,
      s"bloom probe kept $probe of $factScan scanned fact rows — probe ineffective")
    assert(r.rows > 0 && r.rows <= probe)
  }

  test("q10: map-side partial aggregation keeps the shuffle tiny") {
    val r = PlanMetrics.run(q("q10_agg_groupby"))
    assert(r.shuffleBytesWritten.nonEmpty)
    // partial aggregation reduces the groupBy shuffle to |groups| rows per
    // task: bytes written must be KB-scale, not data-scale
    assert(r.shuffleBytesWritten.sum < 512 * 1024,
      s"agg shuffle wrote ${r.shuffleBytesWritten.sum} bytes — partials lost?")
  }
}
