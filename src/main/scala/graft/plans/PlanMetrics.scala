package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Runtime plan-metrics evidence: execute a DataFrame's OWN physical plan
  * (so its operator metrics populate — `df.count()` would build a separate
  * QueryExecution and leave them at zero) and report what actually flowed:
  * rows out of each scan, each filter, and bytes through each shuffle.
  * This is the runtime counterpart of the string assertions in
  * PlanInvariantsSpec: "the filter is pushed down" becomes "the scan
  * emitted N ≪ total rows".
  */
object PlanMetrics {

  final case class Report(
      rows: Long,
      scanOutputRows: Seq[Long],
      filterOutputRows: Seq[Long],
      shuffleBytesWritten: Seq[Long],
      shuffleRecordsWritten: Seq[Long],
      generateOutputRows: Seq[Long])

  /** Execute `df` via its own executed plan (RDD count — no driver
    * materialization of the result set) and collect operator metrics. */
  def run(df: DataFrame): Report = {
    val plan = df.queryExecution.executedPlan
    val rows = plan.execute().count()
    // AQE hides work behind leaf wrappers: AdaptiveSparkPlanExec carries the
    // final tree in `executedPlan`, materialized stages sit behind
    // QueryStageExec.plan, reused exchanges behind ReusedExchangeExec.child —
    // none of which `SparkPlan.collect` descends into.
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case r: ReusedExchangeExec => nodes(r.child)
        case other => other.children.flatMap(nodes)
      }
      (p +: below) ++ p.subqueries.flatMap(nodes)
    }
    val all = nodes(plan)
    def metric(p: SparkPlan, name: String): Option[Long] =
      p.metrics.get(name).map(_.value)
    Report(
      rows = rows,
      scanOutputRows = all.collect { case s: FileSourceScanExec =>
        metric(s, "numOutputRows").getOrElse(0L) },
      filterOutputRows = all.collect { case f: FilterExec =>
        metric(f, "numOutputRows").getOrElse(0L) },
      shuffleBytesWritten = all.collect { case e: ShuffleExchangeExec =>
        metric(e, "shuffleBytesWritten").getOrElse(0L) },
      shuffleRecordsWritten = all.collect { case e: ShuffleExchangeExec =>
        metric(e, "shuffleRecordsWritten").getOrElse(0L) },
      generateOutputRows = all.collect { case g: GenerateExec =>
        metric(g, "numOutputRows").getOrElse(0L) })
  }

  /** Does the (pre-execution) physical plan contain a window with NO
    * partition spec? Such a window funnels its whole input through ONE
    * task — fine for group/histogram/top-k-scale frames, a scale-killer
    * on corpus-scale ones. Detection only; pair with
    * [[unpartitionedWindowInputs]] to bound what actually flowed. */
  def hasUnpartitionedWindow(df: DataFrame): Boolean = {
    // executedPlan, NOT sparkPlan: building it does not execute anything
    // (AQE returns its initial tree), and unlike sparkPlan its DPP
    // subqueries are already physical — sparkPlan's still wrap logical
    // plans and traversing them throws (q133/q146).
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case other => other.children.flatMap(nodes)
      }
      (p +: below) ++ p.subqueries.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).exists {
      case w: WindowExec => w.partitionSpec.isEmpty
      case _ => false
    }
  }

  /** Execute `df` and report, for every unpartitioned window in the plan,
    * the rows that flowed INTO it (nearest descendant with a populated
    * row metric — the single-partition exchange or aggregate feeding it).
    * -1 when no metric is reachable (nothing executed below the window). */
  def unpartitionedWindowInputs(df: DataFrame): Seq[Long] = {
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case r: ReusedExchangeExec => nodes(r.child)
        case other => other.children.flatMap(nodes)
      }
      (p +: below) ++ p.subqueries.flatMap(nodes)
    }
    def inputRows(p: SparkPlan): Option[Long] =
      p.metrics.get("numOutputRows").map(_.value)
        .orElse(p.metrics.get("shuffleRecordsWritten").map(_.value))
        .orElse(p match {
          case a: AdaptiveSparkPlanExec => inputRows(a.executedPlan)
          case q: QueryStageExec => inputRows(q.plan)
          case r: ReusedExchangeExec => inputRows(r.child)
          case _ => p.children.view.flatMap(inputRows(_)).headOption
        })
    nodes(plan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        w.children.view.flatMap(inputRows(_)).headOption.getOrElse(-1L)
    }
  }
}
