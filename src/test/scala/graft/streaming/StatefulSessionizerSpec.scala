package graft.streaming

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The custom-state sessionizer must agree with the declarative
  * session_window aggregation, in batch mode (complete groups) and in
  * streaming mode (closed sessions emitted incrementally, open sessions
  * flushed by event-time timeout when the watermark passes — driven here by
  * a far-future sentinel file processed as a second micro-batch). */
class StatefulSessionizerSpec extends SharedSparkSpec {

  /** Expected sessions via the declarative formulation. */
  private def expectedSessions(events: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .select(col("user_id"), col("mn").cast("long"), col("mx").cast("long"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def asSet(ds: org.apache.spark.sql.Dataset[StatefulSessionizer.Sess]) =
    ds.collect().map(s => (s.user_id, s.start_sec, s.end_sec, s.n_events)).toSet

  test("batch flatMapGroupsWithState == session_window aggregation") {
    val events = new Tables(spark, sf001).events
    val got = asSet(StatefulSessionizer.sessionizeBatch(events, 30))
    assert(got == expectedSessions(events))
    assert(got.nonEmpty)
  }

  test("secondary-sort batch sessionizer == flatMapGroupsWithState path") {
    val events = new Tables(spark, sf001).events
    val sorted = asSet(StatefulSessionizer.sessionizeBatchSorted(events, 30))
    assert(sorted == asSet(StatefulSessionizer.sessionizeBatch(events, 30)))
    assert(sorted == expectedSessions(events))
  }

  test("streaming with event-time timeout emits the same sessions") {
    val t = new Tables(spark, sf001)
    val events = t.events
    // Stage: batch 1 = the real events; batch 2 = one far-future sentinel
    // event that advances the watermark past every open session's timeout.
    val dir = tmpDir("sessionizer_stream")
    val in = events.select("event_id", "ts", "user_id")
    in.coalesce(1).write.parquet(s"$dir/in/batch1")
    in.sparkSession.sql(
      "SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'2030-01-01 00:00:00' AS ts, CAST(-1 AS BIGINT) AS user_id")
      .write.parquet(s"$dir/in/batch2")
    val schema = spark.read.parquet(s"$dir/in/batch1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*")
      .withWatermark("ts", "1 second")
    val q = StatefulSessionizer.sessionizeStream(stream.toDF(), 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    implicit val enc = org.apache.spark.sql.Encoders.product[StatefulSessionizer.Sess]
    val got = asSet(spark.table("sessions_out").as[StatefulSessionizer.Sess])
      .filter(_._1 >= 0) // drop the sentinel user
    assert(got == expectedSessions(events))
    // and directly against the oracled q46 batch path (end-to-end twin,
    // mirroring q21's streaming-equivalence test)
    assert(got == asSet(StatefulSessionizer.sessionizeBatch(events, 30)))
  }
}
