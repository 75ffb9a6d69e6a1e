package graft.plans

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** The binned range join must return exactly the rows of the naive BETWEEN
  * join (which Spark plans as a broadcast nested-loop), including boundary
  * values, negative values, and ranges spanning many bins — and its plan
  * must be an equi-join on the bin, not a nested loop. */
class RangeJoinSpec extends SharedSparkSpec {

  test("binned == naive BETWEEN join; equi-join plan") {
    import spark.implicits._
    // deterministic pseudo-random points and ranges, both signs, bin-edge hits
    val pts = (0 until 400)
      .map(i => (i.toLong, (i * 37 % 211) - 50.0)).toDF("pid", "v")
    val rgs = (0 until 120)
      .map { i =>
        val lo = (i * 53 % 173) - 60.0
        (i.toLong, lo, lo + (i % 7) * 25.0)
      }.toDF("rid", "lo", "hi")

    val binned = RangeJoin.binned(pts, col("v"), rgs, col("lo"), col("hi"), binWidth = 30.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(rgs, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(binned == naive)

    val plan = RangeJoin.binned(pts, col("v"), rgs, col("lo"), col("hi"), 30.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
  }
}
