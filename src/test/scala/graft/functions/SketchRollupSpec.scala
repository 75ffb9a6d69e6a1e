package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q143 (mergeable HLL rollup): the claim under test is that re-aggregation
  * is LOSSLESS — unioning the stored per-day sketches answers the per-type
  * NDV as well as sketching the raw events directly — and that the estimate
  * is within the advertised lgK=12 error of the exact distinct count.
  */
class SketchRollupSpec extends SharedSparkSpec {

  private def t = new graft.Tables(spark, sf001)

  test("q143: union of daily sketches == direct per-type sketch (re-aggregation lossless)") {
    val rolled = SketchQueries.q143.run(spark, sf001)
      .select(col("event_type"), col("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = t.events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled.keySet == direct.keySet)
    // same lgK on both paths: HLL registers merge by max, so the union of
    // the partition-of-days sketches carries the same state as one sketch
    // over all days — estimates must agree exactly
    rolled.foreach { case (k, v) => assert(v == direct(k), s"$k: union $v != direct ${direct(k)}") }
  }

  test("q143: estimates within 5 standard errors of exact NDV; exact columns exact") {
    val rows = SketchQueries.q143.run(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val exact = t.events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("ndv"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rsd = 1.04 / math.sqrt(1 << 12) // lgK=12
    rows.foreach { case (et, nDays, nEvents, approx) =>
      val (ndv, days, events) = exact(et)
      assert(nDays == days, s"$et: n_days $nDays != $days")
      assert(nEvents == events, s"$et: n_events $nEvents != $events")
      assert(math.abs(approx - ndv) <= math.max(5 * rsd * ndv, 1.0),
        s"$et: approx $approx vs exact $ndv outside 5 sigma")
    }
  }
}
