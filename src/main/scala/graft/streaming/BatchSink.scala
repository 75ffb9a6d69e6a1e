package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once streaming egress via foreachBatch: partition the output by
  * batch id and make each batch's write an idempotent overwrite of ITS OWN
  * partition. Structured Streaming replays a batch after a failure with the
  * SAME batchId, so the replayed write lands on the same directory and
  * replaces any partial output — at-least-once delivery plus idempotent
  * writes = effective exactly-once, the standard pattern for sinks without
  * transactional commit. Dynamic partition overwrite keeps every OTHER
  * batch's partition untouched (same mechanism as LayoutWriter
  * .upsertPartitions).
  */
object BatchSink {

  /** `writeStream.foreachBatch(BatchSink.idempotentParquet(dir))`. */
  def idempotentParquet(path: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
}
