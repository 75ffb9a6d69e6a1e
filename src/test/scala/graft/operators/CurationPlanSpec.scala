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
    // Each benchmarkHitIds call contributes 1 text scan (the candidate
    // side; the src0 eval-shingle set is a session-memoized checkpoint
    // since round 12 and contributes zero). q214 decontaminates once
    // -> <= 2; q215 builds the store (1 call) and cleans the batch
    // (1 call) -> <= 4; q216 runs one call per generation plus the
    // store's -> <= 8 (bounds kept at the pre-memoization level so a cold
    // first evaluation, which builds the eval checkpoint inline, still
    // passes). Every OTHER stage must come from checkpoints
    // (Scan ExistingRDD), contributing zero.
    assert(textScans(CurationQueries.q214.run(spark, sf001)) <= 2)
    assert(textScans(CurationQueries.q215.run(spark, sf001)) <= 4)
    assert(textScans(CurationQueries.q216.run(spark, sf001)) <= 8)
  }

  test("warm curation plans read no text at all") {
    // Once the session artifacts exist (docMeta, corpus postings, eval
    // shingles, the corpus-wide decontamination hit set), EVERY stage of
    // every funnel — including decontamination — decides off id-scale
    // checkpoints: a second evaluation's plan must contain zero
    // text-reading scans. This pins the standing-hit-set discipline the
    // way the ≤-bounds above pin the cold build. The one exception is
    // q227: its REFERENCE changes per run, so a warm evaluation still
    // pays exactly the two by-design text reads — the new suite's shingle
    // set (delta-sized in production, where benchmarks are their own
    // table) and the corpus-candidate sweep no changed reference can
    // avoid — and nothing else (kept state and old suite are standing).
    for (q <- CurationQueries.all) {
      q.run(spark, sf001)
      val bound = if (q.name.startsWith("q227")) 2 else 0
      assert(textScans(q.run(spark, sf001)) <= bound,
        s"${q.name}: warm plan reads more corpus text than its contract")
    }
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

  test("no broadcast builds from the store/ledger; no corpus pair artifact in incremental plans") {
    // The round-10 scale-killer was `broadcast(storeKeys)` /
    // `broadcast(ledgerKeys)` — a hint that ships the curated CORPUS's
    // digest set (~320 GB at 100 TB) to every task. The fixed shape is
    // q90's asymmetry: store/ledger streams map-side, only batch-derived
    // frames may be a broadcast build side. Pinned structurally: every
    // explicit hint in the incremental funnels' analyzed plans must be a
    // BROADCAST whose build side is neither a digest frame (output column
    // `key` — the store/ledger keys) nor the delta-join's STREAM side
    // (output column `is_ref` — ref ∪ delta postings). The absence of any
    // SHUFFLE_HASH hint additionally proves the full-corpus pair artifact
    // (ngramJaccardPairsFrom's hinted self-join) is out of the served
    // incremental plans — near-dup pairs now form delta-only.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (q <- Seq(CurationQueries.q215, CurationQueries.q216)) {
      val df = q.run(spark, sf001)
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      for (h <- hints) {
        assert(h.hints.strategy.exists(_.toString.toLowerCase.contains("broadcast")),
          s"${q.name}: non-broadcast join hint in the incremental plan: ${h.hints}")
        val out = h.child.output.map(_.name).toSet
        assert(!out.contains("key"),
          s"${q.name}: broadcast whose build side is a digest frame (store/ledger)")
        assert(!out.contains("is_ref"),
          s"${q.name}: broadcast whose build side is the corpus-side postings stream")
      }
    }
  }

  test("q227's kept semi-join sits BELOW the candidate shingle explode") {
    // The delta sweep's candidate pass must fan out shingles only for docs
    // that can still drop: the kept-ids semi-join is built UNDER the
    // Generate structurally, and this pins that no optimizer change (or
    // refactor back to a shared post-explode candidate frame) re-orders it
    // — a LeftSemi join whose left subtree contains a Generate would mean
    // the corpus-scale explode ran first and the semi-join filtered its
    // output.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    CurationQueries.q227.run(spark, sf001) // warm the standing state
    val plan = CurationQueries.q227.run(spark, sf001).queryExecution.optimizedPlan
    val semis = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, "expected the kept-ids LeftSemi in the warm q227 plan")
    for (j <- semis)
      assert(j.left.collect { case g: Generate => g }.isEmpty,
        "kept semi-join applied ABOVE a shingle explode — candidate fan-out must be kept-only")
  }

  test("generation slicing is window-free and an ascending cover of the batch") {
    import org.apache.spark.sql.functions._
    val t = new graft.Tables(spark, sf001)
    val ids = t.documents.filter(col("doc_id") % 10 === 0).select("doc_id")
    val gens = CurationQueries.generations(ids, 3)
    // The round-10 form (`ntile(3).over(Window.orderBy("doc_id"))`) hid a
    // batch-scale unpartitioned window behind the localCheckpoint; the
    // served-plan ban above couldn't see it. This asserts the PRE-checkpoint
    // build plan is window-free too.
    assert(!graft.plans.PlanMetrics.hasUnpartitionedWindow(gens),
      "generation assignment must not use an unpartitioned window")
    val rows = gens.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length == ids.count(), "generations must cover the batch exactly")
    val byGen = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byGen.keySet.subsetOf(Set(1, 2, 3)))
    for (g <- 1 to 2; if byGen.contains(g) && byGen.contains(g + 1))
      assert(byGen(g).max < byGen(g + 1).min,
        s"generation $g must precede generation ${g + 1} in doc_id order")
  }
}
