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
}
