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

  val all: Seq[EngineQuery] = Seq(q40, q41)
}
