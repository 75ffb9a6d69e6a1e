package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** q139: AQE's skew-join must actually fire (skew=true on the executed
  * sort-merge join, the hot partition split into multiple reads) AND must
  * not change a single output row vs the plain join — the whole point of
  * an adaptive optimization is that it is invisible in the result. */
class SkewJoinSpec extends SharedSparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case r: ReusedExchangeExec => nodes(r.child)
      case other => other.children.flatMap(nodes)
    }
    (p +: below) ++ p.subqueries.flatMap(nodes)
  }

  test("q139: executed SMJ is skew=true with >=2 splits of the hot partition; rows equal the plain join") {
    val df = AdvancedQueries.q139.run(spark, sf001)
    val rows = df.collect() // materializes the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "AQE did not mark the join skewed:\n" + plan.take(2000))
    val skewSplits = nodes(df.queryExecution.executedPlan)
      .collect { case r: AQEShuffleReadExec =>
        r.metrics.get("numSkewedSplits").map(_.value).getOrElse(0L) }
    assert(skewSplits.sum >= 2,
      s"hot partition was not split (numSkewedSplits=${skewSplits.sum})")
    // adaptive plan must be row-invisible: same result as the plain join
    // in the default (parent) session
    val docs = new graft.Tables(spark, sf001).documents
    val dim = docs.select(col("lang")).distinct()
      .withColumn("tier",
        when(col("lang") === "en", lit("head")).otherwise(lit("tail")))
    val plain = docs.join(dim, "lang").groupBy("tier")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        substring(max(col("text")), 1, 40).as("sample_text"))
      .orderBy("tier").collect()
    assert(rows.toSeq == plain.toSeq)
  }
}
