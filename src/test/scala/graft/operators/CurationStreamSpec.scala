package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** q216's contract driven by REAL structured streaming: the daily batch
  * arrives as three id-ordered staged files, a foreachBatch sink runs each
  * micro-batch through the SAME [[CurationQueries.curationStep]] the engine
  * uses (frozen store + sequentially maintained ledger), and the
  * accumulated survivor counts must equal both q216's deterministic batch
  * form and q215's one-shot rules — stream ≡ batch ≡ oracle.
  */
class CurationStreamSpec extends SharedSparkSpec {

  test("foreachBatch-driven curation ingest == q216 == q215") {
    val t = new graft.Tables(spark, sf001)
    val dir = tmpDir("curation_stream")
    // Stage the batch docs (doc_id % 10 == 0) as three id-ordered files
    // using the engine's own window-free slicer (so the stream's slices are
    // exactly q216's — though CurationStepProps proves any ascending split
    // decides identically); explicit ascending mtimes pin the file source's
    // replay order (the step function's precondition).
    val batch = CurationQueries.generations(
      t.documents.filter(col("doc_id") % 10 === 0).select("doc_id"), 3)
    for (g <- 1 to 3) {
      val p = s"$dir/in/g$g"
      batch.filter(col("gen") === g).select("doc_id")
        .coalesce(1).write.parquet(p)
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach { f =>
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(1000000L + g * 60000L))
      }
    }
    var st = CurationQueries.FunnelState.frozen(t)
    val perStage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val schema = spark.read.parquet(s"$dir/in/g1").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
      .writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        val sliceIds = mb.select("doc_id").localCheckpoint()
        val (next, frames) = CurationQueries.curationStep(t, sliceIds, st)
        st = next
        perStage("raw") += frames.raw.count()
        perStage("quality") += frames.quality.count()
        perStage("exact") += frames.exact.count()
        perStage("neardup") += frames.nearDup.count()
        perStage("clean") += frames.clean.count()
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish within 180 s")

    // Stream-accumulated counts equal the engine's q216 report rows...
    def funnel(name: String): Map[String, Long] =
      CurationQueries.all.find(_.name == name).get.run(spark, sf001)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val s216 = funnel("q216_curation_stream")
    assert(perStage("raw") == s216("batch_raw"))
    assert(perStage("quality") == s216("quality"))
    assert(perStage("exact") == s216("exact_dedup"))
    assert(perStage("neardup") == s216("near_dedup"))
    assert(perStage("clean") == s216("decontaminate"))
    // ...and q216 ≡ q215 row-for-row (the shared-oracle invariant, asserted
    // directly so a fixture change can't hide behind two separate gates).
    assert(s216 == funnel("q215_curation_incremental"))
    assert(perStage("clean") > 0, "degenerate fixture: nothing survived")
  }
}
