package graft.streaming

import graft.SharedSparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** q187's contract driven by REAL structured streaming: the corpus arrives
  * as four staged document files, a foreachBatch sink shingles each
  * micro-batch and appends its postings into the same bucketed table
  * (batch 0 overwrites, later batches append — the exact write path the
  * engine's batch form uses), and the finished index must answer the
  * n-gram similarity query exactly like the live computation.
  */
class StreamIngestSpec extends SharedSparkSpec {

  test("foreachBatch-ingested postings index == live q36 answer, generation sizes add up") {
    val t = new graft.Tables(spark, sf001)
    val dir = tmpDir("stream_ingest")
    // Stage the four generations as separate files; the file source replays
    // them one per trigger in mtime order.
    for (g <- 0 until 4)
      t.documents.filter(pmod(col("doc_id"), lit(4)) === g)
        .select("doc_id", "text")
        .coalesce(1).write.parquet(s"$dir/in/g$g")
    val tbl = "graft_postings_stream_test"
    val schema = spark.read.parquet(s"$dir/in/g0").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.sources.LayoutWriter.writeBucketed(
          TextQueries.invPostings(batch), tbl, "s", 8,
          if (batchId == 0L) "overwrite" else "append")
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // The streamed index answers exactly like live shingling...
    val served = TextQueries.servePostingsJaccard(spark.table(tbl))
      .collect().map(_.toSeq).toSeq
    val live = TextQueries.q36.run(spark, sf001).collect().map(_.toSeq).toSeq
    assert(served == live)
    assert(served.nonEmpty)
    // ...and matches the engine's deterministic batch form of the same
    // contract (q187) row-for-row, including total index size.
    val st = TextQueries.ingestedPostingsStats(t)
    assert(spark.table(tbl).count() == st.generationRows.sum)
    assert(st.generationRows.forall(_ > 0))
    val q187 = TextQueries.q187.run(spark, sf001).collect().map(_.toSeq).toSeq
    assert(q187 == live)
  }
}
