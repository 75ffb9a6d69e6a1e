package graft.operators

import graft.SharedSparkSpec
import java.sql.Timestamp

/** Micro-fixture for the as-of join's boundary semantics (SURVEY.md §7.5.1):
  * ts == o_orderdate is INCLUDED (<=), ties on ts resolve to max event_id,
  * and orders with no prior event get the (-1, 0.0) sentinels.
  */
class AsofJoinSpec extends SharedSparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join boundary semantics") {
    val dir = tmpDir("asof")
    // (event_id, ts, user_id, value)
    Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (11L, ts("2024-01-01 11:00:00"), 1L, 2.0), // == order ts → included
      (12L, ts("2024-01-01 11:00:00"), 1L, 3.0), // tie: higher event_id wins
      (13L, ts("2024-01-01 12:00:00"), 1L, 4.0), // after order → excluded
      (20L, ts("2024-01-02 00:00:00"), 2L, 9.0)) // after user-2 order
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // (o_orderkey, o_custkey, o_orderdate)
    Seq(
      (100L, 1L, ts("2024-01-01 11:00:00")),
      (200L, 2L, ts("2024-01-01 00:00:00")), // no event at or before
      (300L, 3L, ts("2024-01-01 00:00:00"))) // user with no events at all
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    for (q <- Seq(WindowQueries.q09, WindowQueries.q43)) {
      val out = q.run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      assert(out == List((100L, 12L, 3.0), (200L, -1L, 0.0), (300L, -1L, 0.0)), q.name)
    }
  }

  test("native as-of exec equals union+window formulation on real data") {
    val a = WindowQueries.q09.run(spark, sf001).collect().map(_.toSeq).toList
    val b = WindowQueries.q43.run(spark, sf001).collect().map(_.toSeq).toList
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("native as-of plan contains AsOfJoinExec and one sort per side") {
    val df = WindowQueries.q43.run(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert("(?i)sort".r.findAllIn(plan).size >= 2)
  }
}
