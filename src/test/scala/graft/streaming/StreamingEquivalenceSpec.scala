package graft.streaming

import graft.SharedSparkSpec
import org.apache.spark.sql.streaming.Trigger

/** SURVEY.md §5.2.4: the Structured Streaming twin of q21 over the same
  * files must produce exactly the batch result (availableNow trigger,
  * complete output mode so no window is withheld by the final watermark).
  */
class StreamingEquivalenceSpec extends SharedSparkSpec {

  test("q21 streaming twin equals batch result") {
    val batch = StreamingQueries.q21.run(spark, sf001)
      .collect().map(_.toSeq).toSet

    val q = StreamingQueries.tumblingStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q21_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q21_stream_test").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q52 stream-stream interval join equals batch result") {
    val batch = StreamingQueries.q52.run(spark, sf001)
      .collect().map(_.toSeq).toSet

    val q = StreamingQueries.intervalJoinStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q52_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q52_stream_test").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q73 sliding-window streaming twin equals batch result") {
    val batch = StreamingQueries.q73.run(spark, sf001)
      .collect().map(_.toSeq).toSet

    val q = StreamingQueries.slidingStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q73_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q73_stream_test").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q80 stream-static join twin equals batch result") {
    val batch = StreamingQueries.q80.run(spark, sf001)
      .collect().map(_.toSeq).toSet

    val q = StreamingQueries.streamStaticStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q80_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("q80_stream_test").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup within watermark drops re-sent events") {
    val t = new graft.Tables(spark, sf001)
    val dir = tmpDir("streamdedup")
    // batch 1 and batch 2 contain overlapping event_ids (a re-delivery)
    val ev = t.events.select("event_id", "ts", "user_id")
    ev.filter(org.apache.spark.sql.functions.col("event_id") < 600)
      .coalesce(1).write.parquet(s"$dir/in/b1")
    ev.filter(org.apache.spark.sql.functions.col("event_id").between(400, 999))
      .coalesce(1).write.parquet(s"$dir/in/b2")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .withWatermark("ts", "10 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 1000L).toSeq) // each event exactly once
  }

  test("q74 batch replay-dedup equals the streaming dedup of the same replay") {
    val t = new graft.Tables(spark, sf001)
    val dir = tmpDir("streamdedup74")
    import org.apache.spark.sql.functions._
    // the same replay q74 constructs in batch: full stream + every 10th event
    val ev = t.events.select("event_id", "ts", "event_type")
    ev.coalesce(1).write.parquet(s"$dir/in/b1")
    ev.filter(pmod(col("event_id"), lit(10)) === 0)
      .coalesce(1).write.parquet(s"$dir/in/b2")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .withWatermark("ts", "10 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup74_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup74_out")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = StreamingQueries.q74.run(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
