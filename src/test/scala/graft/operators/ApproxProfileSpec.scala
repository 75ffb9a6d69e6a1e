package graft.operators

import graft.SharedSparkSpec

/** q138 (approx profiler) against q126 (exact profiler): the sketched NDV
  * must land within the advertised HLL++ error of the exact count, and
  * every NON-sketched statistic must be bit-identical — the approximate
  * variant is allowed to approximate exactly one thing. */
class ApproxProfileSpec extends SharedSparkSpec {

  test("q138: sketched NDVs within bound, all other stats equal q126 exactly") {
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    val exact = byCol(RelationalQueries.q126.run(spark, sf001))
    val approx = byCol(RelationalQueries.q138.run(spark, sf001))
    assert(approx.keySet == exact.keySet && approx.keySet ==
      Set("l_discount", "l_extendedprice", "l_quantity"))
    approx.foreach { case (c, (nRows, nNulls, ndv, minV, maxV, meanV)) =>
      val (eRows, eNulls, eNdv, eMin, eMax, eMean) = exact(c)
      assert((nRows, nNulls, minV, maxV, meanV) == (eRows, eNulls, eMin, eMax, eMean),
        s"$c: non-sketched stats diverged from the exact profile")
      // HLL++ at rsd=0.02: allow 5 standard errors — tight enough that a
      // broken sketch (or sketching the wrong column) fails, loose enough
      // to never flake on this fixed dataset.
      assert(math.abs(ndv - eNdv) <= math.max(1.0, 5 * 0.02 * eNdv),
        s"$c: approx NDV $ndv vs exact $eNdv out of bound")
    }
  }

  test("neither profiler plans an Expand; q138 stays one-pass") {
    // Round 18: q126's exact NDVs split into per-column single-distinct
    // aggregations (two-level group-by, scans pruned to one column each),
    // so the multi-distinct Expand — every input row ×4 through the first
    // hash aggregate — is gone from BOTH profilers. q138's advantage is
    // now pass count alone: the sketch is one corpus pass, the exact
    // profile four (its subtrees overlap inside one job, but each is its
    // own scan).
    def planOf(q: graft.EngineQuery) =
      q.run(spark, sf001).queryExecution.executedPlan.toString
    assert(!planOf(RelationalQueries.q126).contains("Expand"),
      "q126's exact profile re-grew a multi-distinct Expand")
    assert(!planOf(RelationalQueries.q138).contains("Expand"),
      "q138 plans an Expand — the approximate profiler lost its one-pass shape")
    assert(planOf(RelationalQueries.q138).split("FileScan").length - 1 == 1,
      "q138 must stay ONE corpus pass")
  }
}
