package graft.plans

import graft.SharedSparkSpec

/** Physical-plan invariants the scale design depends on, enforced as tests —
  * a silent regression (a lost broadcast, a crossJoin sneaking in, a dead
  * pushdown, the as-of exec gaining an exchange) should fail CI, not wait
  * for a human to re-read PLANS.md. String assertions run on the initial
  * executedPlan at sf0.001 (pre-AQE — strategy choices, pushdown metadata
  * and operator shapes are all visible there).
  */
class PlanInvariantsSpec extends SharedSparkSpec {

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf001).queryExecution.executedPlan.toString

  test("q01: projection pruning reaches the scan (no unprojected columns)") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"), p.take(800))
  }

  test("q02: filter conjuncts are pushed to the parquet reader") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    assert(p.contains("GreaterThanOrEqual") || p.contains("LessThanOrEqual"), p.take(800))
  }

  test("q03/q04: dimension sides broadcast, fact never shuffles for the join") {
    assert(plan("q03_join_broadcast").contains("BroadcastHashJoin"))
    val p4 = plan("q04_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p4).length >= 3, p4.take(1500))
  }

  test("q10: aggregation is two-phase (map-side partials)") {
    assert(plan("q10_agg_groupby").contains("partial_"))
  }

  test("q16: top-k is TakeOrderedAndProject, never a global sort") {
    assert(plan("q16_topk").contains("TakeOrderedAndProject"))
  }

  test("q24: LSH pipeline is map-only sigs + SMJ banding; no cartesian, no agg shuffle for sigs") {
    // The candidate pipeline sits behind a localCheckpoint boundary in q24
    // (self-releasing materialization), so its shape is asserted on the
    // pre-checkpoint plan it is built from.
    import graft.operators.SimilarityQueries.{minhashCandidatePairs, shingled}
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val p = minhashCandidatePairs(shingled(docs)).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "crossJoin snuck into the LSH pipeline")
    assert(!p.contains("ObjectHashAggregate"), "signature fell back to the aggregator shuffle")
    assert(p.contains("graft_minhash_sig"), p.take(800))
    assert(p.contains("SortMergeJoin"), "band self-join lost its merge hint")
    // And the full query consumes it through the checkpoint boundary (the
    // ExistingRDD scan), still cartesian-free.
    val full = plan("q24_dedup_minhash")
    assert(full.contains("ExistingRDD"), full.take(800))
    assert(!full.contains("CartesianProduct"), "crossJoin snuck into q24 verification")
  }

  test("q70: exact ntile ranks under a PARTITIONED window (no global single-partition window)") {
    val p = plan("q70_ntile_bucket")
    assert("windowspecdefinition\\(pid#".r.findFirstIn(p).isDefined, p.take(1200))
    // every window in the plan carries a partition spec — a bare
    // windowspecdefinition(<orderCol> ASC ...) is the single-partition form
    assert("windowspecdefinition\\(c_acctbal".r.findFirstIn(p).isEmpty, p.take(1200))
    // correctness depends on the counts and ranks subtrees seeing the SAME
    // range-partition boundaries: RangePartitioner samples with a seed from
    // rdd.id, so two independently-executed range exchanges could disagree.
    // AQE must canonicalize the duplicated subtrees onto shared stages
    // (ReusedExchange nodes in the FINAL adaptive plan — reuse is a runtime
    // decision, invisible pre-execution); if reuse ever breaks, fail loudly
    // here instead of silently mis-bucketing.
    val df = graft.SparkEntry.queries("q70_ntile_bucket")(spark, sf001)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("ReusedExchange"),
      "q70's range exchange is not reused — pid offsets and ranks may see different boundaries:\n" + fin.take(1500))
  }

  test("q91: the lang predicate prunes PARTITIONS at planning time, not rows") {
    val p = plan("q91_partitioned_layout")
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p).isDefined,
      "lang predicate did not reach PartitionFilters:\n" + p.take(1200))
    // and the pruned scan reads no lang data column (it's a directory key)
    assert(!p.contains("DataFilters: [isnotnull(lang"), p.take(1200))
  }

  test("q90: incremental dedup broadcasts batch state; corpus side never hash-shuffles") {
    val p = plan("q90_dedup_incremental")
    // both the batch-digest probe and the hit-set anti-filter are broadcasts
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p.take(1500))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p.take(1500))
  }

  test("q94: matching bucketed layouts join with no exchange on the join keys") {
    val p = plan("q94_bucketed_join")
    assert(p.contains("Bucketed: true"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      "bucketed join keys hash-shuffled:\n" + p.take(1500))
  }

  test("q92: centroids broadcast; per-vector argmin partial-aggregates before its exchange") {
    val p = plan("q92_kmeans_step")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // min(struct(dist,cid)) reduces k candidate rows to 1 per vector
    // map-side, so the corpus-wide exchange carries one row per vector
    assert(p.contains("partial_min"), p.take(1200))
  }

  test("q25: broadcast queries stream the corpus map-side with partial top-k") {
    val p = plan("q25_knn_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("WindowGroupLimit"), "partial top-k before the shuffle is gone")
  }

  test("q43: native as-of exec with exactly one exchange per side") {
    val p = plan("q43_join_asof_native")
    assert(p.contains("AsOfJoin "), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p.take(1500))
  }

  test("q49: signature is the fused expression; candidates dedup as bare ids") {
    val p = plan("q49_embed_neardup_lsh")
    assert(p.contains("graft_hyperplane_sig"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("SortMergeJoin"), "band self-join lost its merge hint")
  }

  test("q36: shingle self-join is shuffled-hash (no sort of the exploded index)") {
    val p = plan("q36_dedup_ngram_jaccard")
    assert(p.contains("ShuffledHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("q68: salted join replicates the dim and joins on (key, salt)") {
    val p = plan("q68_salted_join")
    assert(p.contains("Generate explode"), "dim-side salt replication is gone")
    val joinLine = p.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.contains("salt"), s"join no longer keyed on salt: $joinLine")
  }

  test("q69: bloom probe filters the fact before the semi-join") {
    val p = plan("q69_bloom_join")
    assert(p.contains("might_contain"), p.take(1200))
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("q71: transition window shuffles by user_id (partitioned, not global)") {
    val p = plan("q71_transitions")
    // the lead() window must sit on a user_id hash exchange; a lost
    // partitionBy would surface as a single-partition global-sort window
    // (the final output ORDER BY is a separate, legitimate range exchange)
    assert(p.contains("hashpartitioning(user_id"), p.take(1200))
    val windowLine = p.linesIterator.find(_.contains("Window [")).getOrElse("")
    assert(windowLine.contains("user_id"), s"window lost its partition spec: $windowLine")
  }

  test("q109: decoded features join/aggregate without media bytes in any exchange") {
    val p = plan("q109_multimodal_pipeline")
    // media decodes inside mapPartitions (the codec boundary); everything
    // that shuffles afterwards is (doc_id, doubles). If the binary `media`
    // column ever appears below an Exchange, payload bytes are being
    // shuffled — the exact thing the multimodal design forbids.
    val afterExchange = p.split("Exchange").drop(1).mkString
    assert(!afterExchange.contains("media#"),
      "media binary column crossed an exchange:\n" + p.take(1500))
    assert(p.contains("SerializeFromObject"), "decode left the typed codec boundary")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "centroid codebook stopped broadcasting:\n" + p.take(1200))
    assert(p.contains("partial_"), "argmin/profile lost map-side partials")
  }

  test("q110: LM vocab broadcasts onto tokens; per-doc reduction partial-aggregates") {
    val p = plan("q110_lm_perplexity")
    // the token->probability join must be a broadcast (Zipf vocab), never a
    // shuffle of the exploded token stream
    assert(p.contains("BroadcastHashJoin"),
      "vocab join stopped broadcasting — exploded tokens would shuffle:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"), "normalizer crossJoin must broadcast")
    assert(p.contains("partial_"), "per-doc cross-entropy lost map-side partials")
  }

  test("q112: intra-doc dedup is map-only — zero hash exchanges, only the output sort") {
    val p = plan("q112_intradoc_dedup")
    assert(!p.contains("Exchange hashpartitioning"),
      "per-document block dedup grew a corpus-scale shuffle:\n" + p.take(1500))
    // exactly ONE fold per doc: the explode(array(...)) barrier keeps the
    // n_dropped filter from re-running the aggregate below the projections
    assert("aggregate\\(".r.findAllIn(p).length == 1,
      "q112 fold is evaluated more than once per document:\n" + p.take(1500))
  }

  test("q113: all three SCD2 windows share ONE user_id exchange") {
    val p = plan("q113_scd2_history")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(1500))
    assert(p.contains("hashpartitioning(user_id"), p.take(1200))
  }

  test("q116: PIT probe routes through the native as-of exec, no interval join blow-up") {
    val p = plan("q116_pit_join")
    assert(p.contains("AsOfJoin "), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "PIT lookup degenerated to an unbounded interval join:\n" + p.take(1200))
  }

  test("q115: per-lang top-k pushes WindowGroupLimit below the shuffle") {
    val p = plan("q115_weighted_sample")
    assert(p.contains("WindowGroupLimit"),
      "weighted-sample rank lost its partial top-k:\n" + p.take(1200))
  }

  test("q125: the batch index broadcasts; the corpus postings never hash-shuffle for the probe") {
    val p = plan("q125_dedup_incremental_fuzzy")
    // the operator's asymmetry: corpus postings stream map-side under a
    // broadcast of the (small) batch index — if the probe degrades to a
    // shuffle join, the standing index pays a corpus-wide exchange per
    // ingest batch.
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(800))
  }

  test("q70: exact ntile reads customer exactly once in the executed plan") {
    // the round-5 shape derived the per-pid counts three times (triangular
    // self-join + total aggregate, each re-planned from the raw table —
    // three scans and two nested-loop joins in the dump); offsets and total
    // now derive from ONE counts aggregate via windows over the
    // parallelism-sized counts table, so after AQE's exchange reuse the
    // executed plan touches customer once
    val df = graft.SparkEntry.queries("q70_ntile_bucket")(spark, sf001)
    df.collect()
    // the adaptive plan string appends the pre-execution "Initial Plan"
    // (where the duplicated subtrees are still visible) — assert on the
    // final section only
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(fin).length
    assert(scans == 1, s"q70 executed $scans customer scans, expected 1:\n" + fin.take(1500))
    assert(!fin.contains("BroadcastNestedLoopJoin"), fin.take(1500))
  }

  test("q133: the fact scan carries a dynamic partition-pruning filter from the dim") {
    val p = plan("q133_dpp_join")
    // runtime pruning: the partitioned fact's PartitionFilters must contain
    // a dynamicpruning expression fed by the filtered dim's broadcast — a
    // static IN-list here would mean the predicate was resolved at plan
    // time (wrong: it lives on the dim attribute), and no filter at all
    // means every lang directory is scanned.
    assert(p.contains("dynamicpruning"),
      "fact scan lost its dynamic partition-pruning subquery:\n" + p.take(1200))
    assert(p.contains("PartitionFilters"), p.take(800))
  }

  test("q55: guards prune pairs before any text moves; the DP is banded and width-pinned") {
    // Round 18 shape (guide §8): pairs form on (doc_id, length)-only rows
    // — the id test and the length pre-guard live in the BLOCK join, and
    // no levenshtein may appear there (texts haven't been attached yet);
    // the DP evaluates after the text fetches, in its BANDED threshold
    // form; and the pair frame pins its width explicitly so AQE's
    // coalesce-by-bytes cannot fold the CPU-heavy DP stage into one task
    // (the 27-s-at-any-core-count straggler the sf1x decade exposed).
    val p = plan("q55_dedup_fuzzy")
    val blockJoin = p.linesIterator
      .find(l => l.contains("Join") && l.contains("doc_a") && l.contains("abs(("))
      .getOrElse("")
    assert(blockJoin.nonEmpty, "lost the guarded block join:\n" + p.take(1200))
    assert(!blockJoin.contains("levenshtein"),
      "the DP crept back into the block join (texts shuffled by block):\n" + blockJoin)
    assert(p.contains("levenshtein"), p.take(800))
    // banded: the threshold argument is present in the DP expression
    assert(p.linesIterator.exists(l =>
      l.contains("levenshtein") && l.contains("FLOOR")),
      "levenshtein lost its banded threshold argument:\n" + p.take(1200))
    assert(p.contains("hashpartitioning(doc_a") && p.contains("REPARTITION_BY_NUM"),
      "the pair frame lost its explicit width pin:\n" + p.take(1200))
  }
}
