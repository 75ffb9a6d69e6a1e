package graft.streaming

import graft.{SharedSparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The stateful rate monitor must agree with q176's declarative rolling
  * z-score in batch mode (complete groups, one invocation) and in streaming
  * mode (hours finalized incrementally as the watermark passes their end —
  * driven here by two far-future sentinel files, the q147 staging pattern:
  * eviction runs against the PREVIOUS batch's watermark, so the first
  * sentinel advances it and the second flushes against it). */
class StatefulRateMonitorSpec extends SharedSparkSpec {

  private def asSet(rows: Seq[StatefulRateMonitor.Spike]) =
    rows.map(s => (s.event_type, s.hh, s.cnt, s.n_prev,
      BigDecimal(s.z).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSet

  private def declarative(): Set[(String, Long, Long, Long, BigDecimal)] =
    SparkEntry.queries("q176_rate_spike")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getDouble(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSet

  test("batch flatMapGroupsWithState == declarative q176 rolling z") {
    val events = new Tables(spark, sf001).events
    val got = asSet(StatefulRateMonitor.spikeBatch(events).collect().toSeq)
    assert(got.nonEmpty)
    assert(got == declarative())
  }

  test("streaming watermark-driven emission matches the batch contract") {
    val t = new Tables(spark, sf001)
    val events = t.events
    val dir = tmpDir("rate_monitor_stream")
    val in = events.select("event_id", "ts", "user_id", "event_type", "value", "props")
    in.coalesce(1).write.parquet(s"$dir/in/b1")
    for ((y, b) <- Seq(2030 -> "b2", 2031 -> "b3"))
      in.sparkSession.sql(
        s"""SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'$y-01-01 00:00:00' AS ts,
           |CAST(-1 AS BIGINT) AS user_id, 'sentinel' AS event_type,
           |CAST(0.0 AS DOUBLE) AS value, '' AS props""".stripMargin)
        .write.parquet(s"$dir/in/$b")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*")
      .withWatermark("ts", "1 second")
    val q = StatefulRateMonitor.spikeStream(stream.toDF())
      .writeStream.format("memory").queryName("rate_spikes_out")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    implicit val enc = org.apache.spark.sql.Encoders.product[StatefulRateMonitor.Spike]
    val got = asSet(spark.table("rate_spikes_out")
      .as[StatefulRateMonitor.Spike].collect().toSeq)
      .filter(_._1 != "sentinel")
    assert(got == asSet(StatefulRateMonitor.spikeBatch(events).collect().toSeq))
  }

  test("hourSec floors toward -inf for pre-epoch instants (date_trunc parity)") {
    // 1969-12-31T23:30:00Z = -1800s; date_trunc('hour') floors it to -3600s.
    // Truncating division would give 0 — one hour late.
    val pre = StatefulRateMonitor.Ev("x", new java.sql.Timestamp(-1800L * 1000))
    assert(pre.hourSec == -3600L)
    val post = StatefulRateMonitor.Ev("x", new java.sql.Timestamp(1800L * 1000))
    assert(post.hourSec == 0L)
    // Cross-check against Spark's own date_trunc on the same instants.
    val got = spark.sql(
      """SELECT CAST(unix_seconds(date_trunc('hour',
        |  timestamp_millis(-1800000))) AS BIGINT)""".stripMargin)
      .collect()(0).getLong(0)
    assert(got == pre.hourSec)
  }
}
