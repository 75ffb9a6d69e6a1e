package graft.functions

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.functions._

/** Percentiles and sketches (engine extensions beyond SURVEY.md §2's core
  * rows, in the q11 "distinct/approximate aggregation" family).
  *
  * q40 is exact and oracle-checked (Spark `percentile` and DuckDB
  * `quantile_cont` share the linear-interpolation definition). q41 exercises
  * the approximate sketches — HLL++ (`approx_count_distinct`) and the
  * quantile sketch (`percentile_approx`) — whose exact outputs are
  * engine-specific, so it is covered by a ScalaTest accuracy bound against
  * the exact values instead of a SQL oracle. At 100 TB the sketch versions
  * are the ones you run: mergeable, bounded-memory, one pass.
  */
object SketchQueries {

  val q40 = EngineQuery(
    "q40_percentiles",
    Some("""SELECT l_returnflag,
           |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           |       round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50
           |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem
        .groupBy("l_returnflag")
        .agg(
          round4(percentile(col("l_extendedprice"), lit(0.5))).as("p50"),
          round4(percentile(col("l_extendedprice"), lit(0.95))).as("p95"),
          round4(percentile(col("l_quantity"), lit(0.5))).as("qty_p50")))
  }

  val q41 = EngineQuery("q41_approx_sketch", None) { t =>
    orderedByAll(
      t.lineitem
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_p50")))
  }

  /** Count-min-sketch heavy-hitter estimation — the third classic mergeable
    * sketch next to HLL (q41) and the quantile sketch: one pass over the
    * exploded token stream builds a fixed-size CMS (ε=0.1%, δ=1%, seeded →
    * deterministic), and the exact top-20 terms (q26's list) are estimated
    * from it EXECUTOR-side: the 1-row sketch broadcasts onto the top-k rows
    * and `CmsEstimateCount` probes the serialized sketch bytes in-plan —
    * the whole query is one declarative job, no driver-side collect or
    * estimateCount loop. Estimates are engine-specific → no SQL oracle;
    * CmsSpec asserts the CMS guarantee exact ≤ est ≤ exact + ε·N. At 100 TB
    * the sketch is ~KBs per partition and merges associatively — the only
    * way to track term frequencies without a corpus-wide shuffle. */
  val q86 = EngineQuery("q86_cms_freq", None) { t =>
    val tokens = t.documents.select(explode(toks(col("text"))).as("tok"))
    val sk = tokens
      .agg(count_min_sketch(col("tok"), lit(0.001d), lit(0.99d), lit(42)).as("sk"))
    val top = tokens.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok"))
      .limit(20)
    top.crossJoin(broadcast(sk))
      .select(col("tok").as("term"), col("exact").as("exact_cnt"),
        CmsEstimateCount(col("sk"), col("tok")).as("est_cnt"))
      .orderBy(col("term"))
  }

  /** Equi-depth (decile) histogram via broadcast bounds — the huge-scale
    * sibling of q70's exact ntile: ONE aggregation computes the 9 decile
    * cut points, they broadcast, and every row buckets map-only by
    * counting bounds below it — no ranking, no per-row window, no second
    * shuffle of the data. Exact-percentile parity with DuckDB's
    * quantile_cont is established by q40; strict `>` comparisons against
    * the RAW bounds are engine-stable because an interpolated bound never
    * coincides with (or straddles within an ulp of) a 2-decimal data
    * value, and non-interpolated bounds are exact data values identical in
    * both engines. */
  val q99 = EngineQuery(
    "q99_equidepth_hist",
    Some("""WITH b AS (SELECT quantile_cont(c_acctbal,
           |             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
           |           FROM customer),
           |a AS (SELECT c_acctbal,
           |        1 + len(list_filter(bounds, x -> c_acctbal > x)) AS bucket
           |      FROM customer CROSS JOIN b)
           |SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n,
           |       round(min(c_acctbal), 4) AS lo, round(max(c_acctbal), 4) AS hi
           |FROM a GROUP BY bucket ORDER BY ALL""".stripMargin)) { t =>
    val pcts = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val bounds = t.customer.agg(percentile(col("c_acctbal"), pcts).as("bounds"))
    orderedByAll(
      t.customer.select(col("c_acctbal"))
        .crossJoin(broadcast(bounds))
        .withColumn("bucket",
          aggregate(col("bounds"), lit(1),
            (acc, x) => acc + when(col("c_acctbal") > x, 1).otherwise(0)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round4(min(col("c_acctbal"))).as("lo"),
          round4(max(col("c_acctbal"))).as("hi")))
  }

  /** Misra-Gries capacity for q121 (error ≤ n/65 of the token stream). */
  private[graft] val MgCap = 64

  /** The merged corpus-level MG summary + the exact stream length, exposed
    * for MisraGriesSpec's bound checks: (term, est_cnt) rows, one per
    * surviving counter, plus n_total on every row. */
  private[graft] def mgSummary(t: graft.Tables): org.apache.spark.sql.DataFrame = {
    val mg = udaf(new SketchAggregators.MisraGriesAgg(MgCap))
    val tokens = t.documents.select(explode(toks(col("text"))).as("tok"))
    // Group by the SCAN partition id: partial aggregation reduces each
    // partition's tokens into ONE cap-entry summary map-side, and — because
    // every pid lives in exactly one task — the exchange carries one row
    // per partition and the final aggregate never merges two buffers. That
    // makes the result DETERMINISTIC (Aggregator merge order under a global
    // single group is arrival-order nondeterministic) while keeping the
    // token stream un-shuffled: the only exchanged state is |partitions| ×
    // cap counters, whatever the corpus size.
    // Materialized once (lazy localCheckpoint, q24's pattern): three
    // consumers below (merge, kth threshold, n_total) would otherwise each
    // re-run the corpus scan + MG pass; the checkpointed state is
    // |partitions| rows of cap-entry maps — KBs at any corpus size.
    val partials = tokens
      .groupBy(spark_partition_id().as("pid"))
      .agg(mg(col("tok")).as("summary"), count(lit(1)).as("np"))
      .localCheckpoint(eager = false)
    val n = partials.agg(sum(col("np")).as("n_total"))
    // Multiway merge, declaratively (the same algebra as MisraGriesAgg.merge
    // over all partials at once): sum per-item counts across summaries,
    // subtract the (cap+1)-th largest combined count, drop the non-positive.
    val combined = partials
      .select(explode(col("summary")).as(Seq("term", "cnt")))
      .groupBy("term").agg(sum(col("cnt")).as("c"))
    val kth = combined
      .select(col("c"))
      .orderBy(col("c").desc)
      .limit(MgCap + 1)
      .agg(when(count(lit(1)) > MgCap, min(col("c"))).otherwise(lit(0L)).as("kth"))
    combined.crossJoin(broadcast(kth)).crossJoin(broadcast(n))
      .filter(col("c") > col("kth"))
      .select(col("term"), (col("c") - col("kth")).as("est_cnt"), col("n_total"))
  }

  /** Misra-Gries heavy hitters — the deterministic counter-based sibling of
    * q86's CMS: one un-shuffled pass summarizes each scan partition into 64
    * counters, the per-partition summaries merge declaratively, and the
    * top-10 surviving counters are reported with the guarantee interval
    * [est, est + n/(cap+1)] that the true count provably lies in. Estimates
    * are summary-construction-specific → no SQL oracle; MisraGriesSpec
    * asserts the MG guarantees against exact counts. */
  val q121 = EngineQuery("q121_heavy_hitters", None) { t =>
    orderedByAll(
      mgSummary(t)
        .orderBy(col("est_cnt").desc, col("term"))
        .limit(10)
        .select(col("term"), col("est_cnt"),
          (col("est_cnt") + (col("n_total") / (MgCap + 1)).cast("long"))
            .as("upper_bound")))
  }

  /** Mergeable HLL sketch ROLLUP (DataSketches `hll_sketch_agg` /
    * `hll_union_agg`) — the pre-aggregation pattern that carries distinct
    * counts at 100 TB. q41/q138's `approx_count_distinct` keeps its HLL++
    * partials OPAQUE (they exist only inside one aggregation); here the
    * sketch is a first-class VALUE: built once per (event_type, day) — the
    * only corpus pass — then any coarser NDV (per event_type here) is a
    * union of the stored sketch bytes, never a re-scan of raw events. This
    * is exactly the nightly-rollup-table shape: persist the daily sketches,
    * answer month/quarter/all-time distinct-user questions by unioning
    * KB-sized states. The estimate is merge-order invariant (HLL registers
    * combine by max) → deterministic across runs, but engine-specific → no
    * SQL oracle; SketchRollupSpec asserts union-of-parts == sketch-of-whole
    * (re-aggregation is lossless) and 5σ accuracy vs the exact NDV at the
    * lgK=12 rsd, and that the exact columns riding along stay exact. */
  val q143 = EngineQuery("q143_sketch_rollup", None) { t =>
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        count(lit(1)).as("n_events"))
    orderedByAll(
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("n_events")).as("n_events"),
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("approx_users")))
  }

  private val QAlpha = 0.01
  private[graft] val QGamma = (1 + QAlpha) / (1 - QAlpha)

  /** Per-(event_type, day) DDSketch bucket counts rolled up to per-type —
    * the single corpus pass, then map-explode + per-bucket sum (exact,
    * order-invariant merge). Shared by q149 and its spec. */
  private[graft] def ddPerBucket(t: graft.Tables): org.apache.spark.sql.DataFrame = {
    val dd = udaf(new SketchAggregators.DdSketchAgg(QGamma))
    t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dd(col("value")).as("sk"))
      .select(col("event_type"), explode(col("sk")).as(Seq("bucket", "cnt")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Mergeable QUANTILE rollup — q143's never-rescan-raw economics for
    * percentiles: per-(event_type, day) DDSketch maps (bucket → count,
    * [[SketchAggregators.DdSketchAgg]]) are built in ONE events pass; any
    * coarser grain's p50/p95/p99 is then served by SUMMING the stored
    * KB-sized maps — never re-reading events — with the SAME α=1% relative
    * -error guarantee as a direct sketch, because DDSketch merge is exact.
    * (`percentile_approx`'s KLL partials are opaque to one aggregation;
    * a persisted-rollup quantile table needs the sketch as a VALUE.)
    * Extraction is plain SQL over the merged counts: cumulative sum in
    * bucket order, first bucket whose cumulative count reaches ⌈q·n⌉, then
    * the midpoint 2γ^i/(γ+1). Deterministic (exact integer bucket counts,
    * order-invariant merge) but engine-specific → no SQL oracle;
    * QuantileRollupSpec asserts rollup == sketch-of-whole exactly and the
    * α bound per quantile vs exact sorted values. */
  val q149 = EngineQuery("q149_quantile_rollup", None) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("bucket")
    val cum = ddPerBucket(t)
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
    def estAt(q: Double) =
      round4(lit(2.0) * pow(lit(QGamma),
        min(when(col("cum") >= ceil(lit(q) * col("n")), col("bucket")))) / (QGamma + 1))
    orderedByAll(
      cum.groupBy("event_type")
        .agg(max(col("n")).as("n"),
          estAt(0.50).as("p50"), estAt(0.95).as("p95"), estAt(0.99).as("p99")))
  }

  /** Audience-overlap estimation by HLL inclusion–exclusion —
    * |A∩B| ≈ |A| + |B| − |A∪B| with the union estimated from MERGED sketch
    * bytes (`hll_union`), never from re-scanned raw data. q143 stores the
    * per-audience sketches; this composes them: the corpus pass builds one
    * KB-sized sketch per event_type (5 rows), and every pairwise overlap —
    * all C(5,2) of them — is scalar math on broadcast sketch bytes. At
    * 100 TB the alternative (an exact distinct-intersection join per pair)
    * is a corpus-scale shuffle PER PAIR; this is one corpus pass total, and
    * adding audiences grows the pair table quadratically in AUDIENCES, not
    * data. Estimates are merge-order invariant (registers combine by max)
    * → deterministic, but engine-specific → no SQL oracle; HllOverlapSpec
    * pins each pair's estimate within 5σ (lgK=12 rsd per sketch, ×3
    * sketches) of the exact intersection and the identity
    * est_inter = est_a + est_b − est_union on the emitted rows. */
  val q167 = EngineQuery("q167_audience_overlap", None) { t =>
    val sk = t.events.groupBy(col("event_type").as("atype"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        count(lit(1)).as("n_events"))
    val a = sk.select(col("atype").as("type_a"), col("sk").as("sk_a"))
    val b = sk.select(col("atype").as("type_b"), col("sk").as("sk_b"))
    val est = (c: org.apache.spark.sql.Column) =>
      hll_sketch_estimate(c).cast("long")
    orderedByAll(
      a.join(broadcast(b), col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          est(col("sk_a")).as("est_a"), est(col("sk_b")).as("est_b"),
          est(hll_union(col("sk_a"), col("sk_b"))).as("est_union"))
        .withColumn("est_inter",
          greatest(lit(0L), col("est_a") + col("est_b") - col("est_union"))))
  }

  val all: Seq[EngineQuery] = Seq(q40, q41, q86, q99, q121, q143, q149, q167)
}
