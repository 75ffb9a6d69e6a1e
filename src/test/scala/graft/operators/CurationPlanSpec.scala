package graft.operators

import graft.SharedSparkSpec

/** Scale-shape audit of the curation trilogy's SERVED plans: the whole
  * point of the memoized artifacts (corpus postings, pair list, docMeta,
  * frozen store) is that the pipeline makes its decisions off id-scale
  * checkpoints — the corpus TEXT may be scanned only by the
  * decontamination shingle passes. This pins that with a hard bound on
  * text-reading FileScans in each query's executed plan, so a refactor
  * that quietly rebases a stage back onto live text re-reads fails here,
  * not in a 100× scale-up.
  */
class CurationPlanSpec extends SharedSparkSpec {

  /** FileScan nodes over documents whose ReadSchema includes `text`. */
  private def textScans(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet") &&
        l.contains("text"))
  }

  test("curation funnels read text only in the decontamination passes") {
    // Each benchmarkHitIds call contributes 2 text scans (the eval set and
    // the candidate side). q214 decontaminates once -> <= 2; q215 builds
    // the store (1 call) and cleans the batch (1 call) -> <= 4; q216 runs
    // one call per generation plus the store's -> <= 8. Every OTHER stage
    // must come from checkpoints (Scan ExistingRDD), contributing zero.
    assert(textScans(CurationQueries.q214.run(spark, sf001)) <= 2)
    assert(textScans(CurationQueries.q215.run(spark, sf001)) <= 4)
    assert(textScans(CurationQueries.q216.run(spark, sf001)) <= 8)
  }

  test("no curation plan contains a cartesian or corpus-scale unpartitioned window") {
    for (q <- CurationQueries.all) {
      val df = q.run(spark, sf001)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: cartesian in plan")
      assert(!graft.plans.PlanMetrics.hasUnpartitionedWindow(df),
        s"${q.name}: unpartitioned window in the SERVED plan (build-time " +
          "windows must hide behind localCheckpoint)")
    }
  }
}
