package graft.streaming

import graft.SharedSparkSpec
import graft.operators.SinkQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** q211's contract driven by REAL structured streaming: the CDC change
  * feed arrives as three staged generation files, a foreachBatch sink
  * applies each micro-batch through the IDENTICAL partition-sliced
  * mutation path the engine's batch form uses, and the finished store
  * must equal the batch-applied store row-for-row. Also pins the
  * partition-isolation property: a batch touching partitions P leaves
  * every other partition's files byte-identical (path + size).
  */
class StreamCdcSpec extends SharedSparkSpec {

  private def storeRows(dir: String) =
    spark.read.parquet(dir)
      .select("p", "o_orderkey", "prio", "total")
      .collect().map(_.toSeq).toSet

  test("foreachBatch CDC apply == batch apply == q211's oracled state; untouched partitions immutable") {
    val t = new graft.Tables(spark, sf001)
    val dir = tmpDir("stream_cdc")
    val base = t.orders
      .select((col("o_orderkey") % 8).cast("int").as("p"), col("o_orderkey"),
        col("o_orderpriority").as("prio"), col("o_totalprice").as("total"))

    // Reference: batch-apply all three generations in order.
    val batchStore = s"$dir/batch"
    graft.sources.LayoutWriter.writePartitioned(base, batchStore, Seq("p"))
    val changes = SinkQueries.cdcChanges(t).localCheckpoint()
    for (g <- 0 until 3)
      SinkQueries.cdcApplyBatch(spark, batchStore,
        changes.filter(col("gen") === g))

    // Partition isolation: apply a batch whose changes all land in ONE
    // partition (keys ≡ 0 mod 8) to a fresh store and verify files under
    // every other partition survive untouched. (A generation batch touches
    // all partitions — key mod 3 is independent of key mod 8 — so the
    // isolation property needs a partition-restricted batch to observe.)
    val isoStore = s"$dir/iso"
    graft.sources.LayoutWriter.writePartitioned(base, isoStore, Seq("p"))
    val g0 = changes.filter(col("o_orderkey") % 8 === 0)
    val touched = g0.select((col("o_orderkey") % 8).cast("int").as("p"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(touched === Set(0))
    def files(root: String): Map[String, Long] = {
      val buf = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          buf(p.toString) = java.nio.file.Files.size(p)
      }
      buf.toMap
    }
    val before = files(isoStore).filterNot { case (path, _) =>
      touched.exists(tp => path.contains(s"p=$tp")) }
    SinkQueries.cdcApplyBatch(spark, isoStore, g0)
    val after = files(isoStore).filterNot { case (path, _) =>
      touched.exists(tp => path.contains(s"p=$tp")) }
    assert(before === after,
      "a partition outside the batch's slice was rewritten")

    // The REAL stream: one generation file per trigger, foreachBatch
    // applying through the identical mutation path.
    val streamStore = s"$dir/stream"
    graft.sources.LayoutWriter.writePartitioned(base, streamStore, Seq("p"))
    for (g <- 0 until 3)
      changes.filter(col("gen") === g)
        .select("op", "o_orderkey", "prio", "total")
        .coalesce(1).write.parquet(s"$dir/in/g$g")
    val schema = spark.read.parquet(s"$dir/in/g0").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        SinkQueries.cdcApplyBatch(spark, streamStore, batch)
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    assert(storeRows(streamStore) === storeRows(batchStore))
    assert(storeRows(streamStore).nonEmpty)
    // And the engine's q211 (memoized store) agrees with this batch store's
    // aggregate — the same rows the DuckDB oracle hash-matches.
    val q211 = graft.SparkEntry.queries("q211_cdc_stream_apply")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val agg = graft.dsl.orderedByAll(spark.read.parquet(batchStore)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("total")) / 1000000, 4).as("total_m")))
      .collect().map(_.toSeq).toSeq
    assert(q211 === agg)
  }
}
