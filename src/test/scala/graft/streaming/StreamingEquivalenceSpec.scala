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

  test("q124 stream-stream LEFT OUTER join: matches eager, null-extensions watermark-gated") {
    import org.apache.spark.sql.functions._
    val batch = StreamingQueries.q124.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val q = StreamingQueries.intervalLeftJoinStream(spark, sf001)
      .writeStream.format("memory").queryName("q124_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamedRows = spark.table("q124_stream_test").collect()
    val streamed = streamedRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // Inner matches emit eagerly: every matched batch row must be streamed.
    val batchMatched = batch.filter(_._3 != -1L)
    assert(batchMatched.subsetOf(streamed), "matched rows missing from the stream")
    // Null-extended rows only exist for batch-unmatched purchases...
    val streamedUnmatched = streamed.filter(_._3 == -1L)
    val batchUnmatched = batch.filter(_._3 == -1L)
    assert(streamedUnmatched.subsetOf(batchUnmatched),
      "stream declared a purchase view-less that batch matched")
    // ...and every unmatched purchase the final watermark has PASSED must
    // have been flushed. Final watermark = min over both sides of
    // (side's max event time - 2h delay); a purchase's state is safely
    // evictable once the watermark clears its whole 1h lookback window.
    val t = new graft.Tables(spark, sf001)
    val maxTs = t.events
      .groupBy(col("event_type"))
      .agg(max(col("ts").cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wm = math.min(maxTs("purchase"), maxTs("view")) - 2 * 3600
    val flushCutoff = wm - 3600 // clear of the full lookback window
    val pTs = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mustFlush = batchUnmatched.filter { case (_, pid, _) => pTs(pid) < flushCutoff }
    assert(mustFlush.subsetOf(streamedUnmatched),
      s"${(mustFlush -- streamedUnmatched).size} watermark-cleared unmatched purchases never flushed")
    assert(batchMatched.nonEmpty && mustFlush.nonEmpty, "fixture degenerate")
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

  test("q90 incremental dedup equals its streaming twin's admit set") {
    import org.apache.spark.sql.functions._
    val q = StreamingQueries.incrementalDedupStream(spark, sf001)
      .writeStream.format("memory").queryName("q90_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val admitted = spark.table("q90_stream_test").collect()
    // Survivor-agnostic invariant (valid at any SF): the streamed admit
    // set contains exactly the batch-fresh digests, one survivor each.
    val t = new graft.Tables(spark, sf001)
    val keyed = t.documents.select(col("doc_id"), col("lang"),
      sha2(lower(trim(col("text"))), 256).as("key"))
    val freshKeys = keyed.filter(col("doc_id") % 10 === 0)
      .join(keyed.filter(col("doc_id") % 10 =!= 0).select("key"),
        Seq("key"), "left_anti")
      .select("key").distinct()
      .collect().map(_.getString(0).toUpperCase).toSet
    val streamedKeys = admitted.map(_.getString(2)).toSeq
    assert(streamedKeys.toSet == freshKeys, "admitted digest set diverged from batch")
    assert(streamedKeys.distinct.size == streamedKeys.size, "a digest was admitted twice")
    // Per-lang counts equal the ORACLED q90 output (at sf0.001 every
    // duplicate group is single-lang, so survivor choice can't move a
    // count across langs).
    val streamedByLang = admitted.groupBy(_.getString(1))
      .map { case (l, rs) => l -> rs.length.toLong }
    val batch = graft.SparkEntry.queries("q90_dedup_incremental")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedByLang == batch, s"per-lang admit counts: $streamedByLang vs $batch")
    assert(batch.nonEmpty)
  }

  test("checkpoint recovery: a restarted stream resumes exactly-once, no loss, no dupes") {
    import org.apache.spark.sql.functions._
    val t = new graft.Tables(spark, sf001)
    val dir = tmpDir("streamrecover")
    // three micro-batch files; the first run is stopped after it has
    // committed SOME of them, the second run resumes from the checkpoint
    val ev = t.events.select("event_id", "ts", "event_type")
    ev.filter(col("event_id") % 3 === 0).coalesce(1).write.parquet(s"$dir/in/b1")
    ev.filter(col("event_id") % 3 === 1).coalesce(1).write.parquet(s"$dir/in/b2")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    def run() = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // run 1 commits b1+b2, then the query goes away (downtime); b3 lands
    run()
    val afterRun1 = spark.read.parquet(s"$dir/out").count()
    val run1Expected = ev.filter(col("event_id") % 3 < 2).count()
    assert(afterRun1 == run1Expected)
    ev.filter(col("event_id") % 3 === 2).coalesce(1).write.parquet(s"$dir/in/b3")
    // run 2 resumes from the checkpoint: the file-source log knows b1/b2
    // are committed, so ONLY b3 is processed — no loss, no re-emission
    run()
    val out = spark.read.parquet(s"$dir/out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == out.distinct.toSeq, "restart re-emitted committed rows")
    assert(out.toSeq == (0L until ev.count()).toSeq, "restart lost rows")
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

  test("q147 chained-window streaming twin (two stateful aggs) equals batch result") {
    val batch = StreamingQueries.q147.run(spark, sf001)
      .collect().map(_.toSeq).toSet

    // Append mode is REQUIRED here — multiple stateful operators don't run
    // in complete mode; the far-future sentinel batch advances the final
    // watermark past every real hour so append withholds nothing.
    val q = StreamingQueries.chainedWindowStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q147_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Sentinel hours are dropped HERE, not in the stream — a post-agg
    // filter would push below the watermark to the scan and prune the
    // sentinel file before it can advance the watermark.
    val streamed = spark.table("q147_stream_test").collect().map(_.toSeq)
      .filterNot(_(1) == "sentinel").toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q182 rate-rollup streaming twin (chained aggs over the rate table) equals batch") {
    val batch = StreamingQueries.q182.run(spark, sf001)
      .collect().map(_.toSeq).toSet
    val q = StreamingQueries.rateRollupStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q182_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // Sentinel days dropped post-collection (the q147 rule: a pre-agg
    // filter would prune the sentinel file below the watermark).
    val streamed = spark.table("q182_stream_test").collect().map(_.toSeq)
      .filterNot(_(1) == "sentinel").toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q195 seasonal-anomaly streaming twin (stateful day counts + static baseline) equals batch") {
    val batch = StreamingQueries.q195.run(spark, sf001)
      .collect().map(_.toSeq).toSet
    val q = StreamingQueries.seasonalStream(spark, sf001)
      .writeStream
      .format("memory")
      .queryName("q195_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // Sentinel days never reach the sink: the post-agg inner join against
    // the baseline (which has no 'sentinel' type) drops them AFTER they
    // advanced the watermark — so no post-collection filter is needed.
    val streamed = spark.table("q195_stream_test").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
