package graft.streaming

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The foreachBatch sink must (a) land every micro-batch and (b) be
  * idempotent under batch replay — a replayed (df, batchId) call replaces
  * its own partition instead of duplicating rows. */
class BatchSinkSpec extends SharedSparkSpec {

  test("streaming foreachBatch sink lands all batches; replay is idempotent") {
    val t = new Tables(spark, sf001)
    val dir = tmpDir("batchsink")
    val ev = t.events.select("event_id", "user_id", "value")
    ev.filter(col("event_id") < 500).coalesce(1).write.parquet(s"$dir/in/f1")
    ev.filter(col("event_id") >= 500).coalesce(1).write.parquet(s"$dir/in/f2")
    val schema = spark.read.parquet(s"$dir/in/f1").schema

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .writeStream
      .foreachBatch(BatchSink.idempotentParquet(s"$dir/out"))
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == ev.count())
    assert(out.select("batch_id").distinct().count() == 2)

    // simulate a failure replay: re-deliver batch 0's data with batchId 0
    val replayed = spark.read.parquet(s"$dir/in/f1")
    BatchSink.idempotentParquet(s"$dir/out")(replayed, 0L)
    val after = spark.read.parquet(s"$dir/out")
    assert(after.count() == ev.count(), "replay must not duplicate rows")
    assert(after.select("event_id").distinct().count() == ev.count())
  }
}
