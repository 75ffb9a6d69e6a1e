package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user RUNNING funnel state on Spark 4's arbitrary-state v2 surface
  * (`transformWithState` + `StatefulProcessor`, the RocksDB-backed
  * successor of q46's flatMapGroupsWithState): the q59 ordered funnel
  * (signup → first click at-or-after it → first purchase at-or-after
  * that), maintained incrementally so a dashboard can read per-user stage
  * NOW instead of recomputing three corpus joins per refresh.
  *
  * State per user is three epoch-micro timestamps (a `ValueState`, O(1) —
  * never the user's event history) with a PROCESSING-TIME TTL: a user idle
  * past the TTL is evicted wholesale by the state store, which is what
  * bounds state on a forever-running stream (the v2 API does the eviction
  * declaratively — q46 had to encode the same idea as an event-time
  * timeout).
  *
  * Batch-boundary contract: within a batch the update is EXACT (set
  * algebra over the batch's events — no order sensitivity, ties included,
  * matching q59's min-over-filter semantics); across batches the state
  * carries (t1, t2, t3) forward, which is exact whenever a user's funnel
  * prefix doesn't retroactively move earlier (a signup arriving batches
  * after that user's clicks can leave t2 one eligible-click too late —
  * the standard bounded-state funnel trade; unbounded exactness would
  * mean keeping every click/purchase forever). StreamingFunnelSpec runs
  * the full corpus through `transformWithState` and asserts the emitted
  * stages reproduce q59's three conversion counts exactly.
  */
object StatefulFunnel {

  final case class FEv(user_id: Long, ts: java.sql.Timestamp, event_type: String) {
    def us: Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
  }

  /** Funnel timestamps in epoch micros; -1 = stage not reached. */
  final case class FState(t1: Long, t2: Long, t3: Long)

  /** Per-user stage snapshot emitted every batch the user appears in. */
  final case class FunnelRow(user_id: Long, stage: Int, t1_us: Long, t2_us: Long, t3_us: Long)

  final class FunnelProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, FEv, FunnelRow] {

    @transient private var state: ValueState[FState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FState](
        "funnel", Encoders.product[FState], TTLConfig(ttl))

    override def handleInputRows(
        user: Long, rows: Iterator[FEv], timerValues: TimerValues): Iterator[FunnelRow] = {
      val evs = rows.toSeq
      val prior = if (state.exists()) state.get() else FState(-1L, -1L, -1L)
      def minOpt(prev: Long, batch: Seq[Long]): Long =
        (if (prev >= 0) batch :+ prev else batch).minOption.getOrElse(-1L)
      // q59's stage algebra over (prior state ∪ this batch) — pure set
      // minimums, no ordering sensitivity within the batch:
      val t1 = minOpt(prior.t1, evs.collect { case e if e.event_type == "signup" => e.us })
      val t2 = if (t1 < 0) -1L
        else minOpt(prior.t2,
          evs.collect { case e if e.event_type == "click" && e.us >= t1 => e.us })
      val t3 = if (t2 < 0) -1L
        else minOpt(prior.t3,
          evs.collect { case e if e.event_type == "purchase" && e.us >= t2 => e.us })
      val ns = FState(t1, t2, t3)
      state.update(ns)
      val stage = if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0
      Iterator.single(FunnelRow(user, stage, t1, t2, t3))
    }
  }

  /** The events stream keyed by user, run through the processor. Caller
    * supplies a STREAMING DataFrame (readStream); output mode Update —
    * each batch re-emits the snapshot of every user it touched. */
  def funnelStream(events: DataFrame, ttl: java.time.Duration): Dataset[FunnelRow] = {
    implicit val evEnc: Encoder[FEv] = Encoders.product[FEv]
    implicit val outEnc: Encoder[FunnelRow] = Encoders.product[FunnelRow]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.select(col("user_id"), col("ts"), col("event_type")).as[FEv]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
