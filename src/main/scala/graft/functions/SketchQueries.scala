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

  val all: Seq[EngineQuery] = Seq(q40, q41, q86)
}
