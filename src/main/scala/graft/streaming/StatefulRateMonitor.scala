package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-rate anomaly monitor — the arbitrary-state twin of q176's
  * declarative rolling z-score (as StatefulSessionizer is to q22): per event
  * type, each hour's count is scored against the EXACT integer sums of its
  * trailing ≤24 closed hours. The streaming form keeps a ring of recent
  * hour-counts in state and finalizes an hour the moment the watermark
  * passes its end — its 24 predecessors closed earlier by construction, so
  * a spike alert fires one watermark-delay after the hour completes, not at
  * end-of-day batch.
  *
  * Scale shape: state per type is ≤ RetainHours hour-count cells (pruned
  * each emission), independent of event volume; the per-type series is
  * inherently serial (any keyed time-series is), and at production volumes
  * the micro-batch would pre-combine (type, hour) partial counts with a
  * windowed aggregation ahead of this operator (q147's chained-stateful
  * shape) so the stateful task sees cells, not raw events.
  *
  * Determinism: [[zScore]] is the same IEEE op sequence as q176's SQL and
  * DataFrame expression — sub, div, mul, div, add, sqrt, div over exact
  * integer sums — so batch q177 ≡ q176 bit-for-bit before the shared 4dp
  * round (StatefulRateMonitorSpec pins batch ≡ stream ≡ oracle).
  */
object StatefulRateMonitor {

  /** One raw event (streaming input). The ts column stays in the Dataset —
    * projecting it away would strip the watermark EventTimeTimeout needs. */
  final case class Ev(event_type: String, ts: java.sql.Timestamp) {
    // floorDiv, not /: integer division truncates toward zero, which for
    // pre-1970 instants rounds the hour UP — diverging from the
    // date_trunc('hour') floor the batch contract (q176) uses.
    def hourSec: Long = Math.floorDiv(ts.getTime, 3600000L) * 3600L
  }
  /** One (type, hour) count cell (batch input — the rate table). */
  final case class RateCell(event_type: String, hh: Long, cnt: Long)
  /** One scored hour. `z` is unrounded; callers round4 at the edge. */
  final case class Spike(event_type: String, hh: Long, cnt: Long, n_prev: Long, z: Double)
  /** Streaming state: open/closed hour counts + the newest hour already
    * emitted (so re-fired timeouts never double-emit). */
  final case class Ring(cells: Map[Long, Long], emittedUpTo: Long)

  /** Trailing window and the minimum history to score against — shared
    * with q176's SQL. Both are ROW-based (ROWS 24..1 PRECEDING): the
    * predecessors are the previous OBSERVED hours, gaps skipped, so the
    * streaming state must retain trailing CELLS, not a time range. */
  val WindowHours = 24
  val MinHistory = 12

  /** Identical IEEE op sequence to q176's expression tree — NEVER reorder. */
  def zScore(cnt: Long, s1: Long, s2: Long, n: Int): Double =
    (cnt.toDouble - s1.toDouble / n) /
      math.sqrt((s2.toDouble - s1.toDouble * s1 / n) / (n - 1) + 1.0)

  /** Score every cell of one type against its sorted predecessors. `cells`
    * must be the complete set for the emitted range; cells below `fromExcl`
    * are history only (already emitted). */
  private def score(cells: Seq[RateCell], fromExcl: Long, toIncl: Long): List[Spike] = {
    val arr = cells.sortBy(_.hh).toArray
    val out = List.newBuilder[Spike]
    var i = 0
    while (i < arr.length) {
      val c = arr(i)
      if (c.hh > fromExcl && c.hh <= toIncl) {
        var j = i - 1
        var n = 0
        var s1 = 0L
        var s2 = 0L
        while (j >= 0 && j >= i - WindowHours) {
          n += 1; s1 += arr(j).cnt; s2 += arr(j).cnt * arr(j).cnt; j -= 1
        }
        if (n >= MinHistory)
          out += Spike(c.event_type, c.hh, c.cnt, n.toLong, zScore(c.cnt, s1, s2, n))
      }
      i += 1
    }
    out.result()
  }

  /** Batch contract (q177): the corpus collapses to the (type, hour) rate
    * table through one combinable aggregate FIRST; the stateful operator
    * then scores time-scale cells. flatMapGroupsWithState(NoTimeout) in
    * batch sees each complete group once. */
  def spikeBatch(events: DataFrame): Dataset[Spike] = {
    implicit val senc = Encoders.product[Spike]
    implicit val renc = Encoders.product[Ring]
    implicit val cenc = Encoders.product[RateCell]
    implicit val strEnc = Encoders.STRING
    events
      .groupBy(col("event_type"),
        graft.dsl.epochSec(date_trunc("hour", col("ts"))).as("hh"))
      .agg(count(lit(1)).as("cnt"))
      .as[RateCell]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[RateCell], _: GroupState[Ring]) =>
          score(it.toVector, Long.MinValue, Long.MaxValue).iterator
      }
  }

  /** Streaming mode: merge each micro-batch's events into the per-type
    * hour ring; an hour emits when the watermark passes its END (so its
    * count is final — and every predecessor closed earlier). The timeout
    * re-fires on each watermark advance to flush newly-closed hours even
    * when the type sees no new data. `events` must carry a watermark. */
  def spikeStream(events: DataFrame): Dataset[Spike] = {
    implicit val senc = Encoders.product[Spike]
    implicit val renc = Encoders.product[Ring]
    implicit val eenc = Encoders.product[Ev]
    implicit val strEnc = Encoders.STRING
    events.select(col("event_type"), col("ts")).as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: String, it: Iterator[Ev], state: GroupState[Ring]) =>
          val prior = state.getOption.getOrElse(Ring(Map.empty, Long.MinValue))
          val merged =
            if (it.isEmpty) prior
            else {
              var cells = prior.cells
              it.foreach { e =>
                val h = e.hourSec
                cells = cells.updated(h, cells.getOrElse(h, 0L) + 1L)
              }
              prior.copy(cells = cells)
            }
          // Hours whose end the watermark has passed are final.
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          val closedUpTo = wmSec - 3600L
          val out = score(
            merged.cells.toSeq.map { case (h, c) => RateCell(k, h, c) },
            merged.emittedUpTo, closedUpTo)
          // The frontier advances with the watermark even through empty
          // hours (a closed hour can never receive a new event).
          val emittedUpTo = math.max(merged.emittedUpTo, closedUpTo)
          // ROWS-semantics retention: the last WindowHours EMITTED cells
          // (future hours' lookback) plus every still-open cell.
          val (closedCells, openCells) =
            merged.cells.partition { case (h, _) => h <= emittedUpTo }
          val pruned =
            (closedCells.toSeq.sortBy(-_._1).take(WindowHours) ++ openCells).toMap
          state.update(Ring(pruned, emittedUpTo))
          // Re-arm just past the current watermark: fires on its next
          // advance, flushing hours the new watermark closes.
          state.setTimeoutTimestamp((wmSec + 1L) * 1000L)
          out.iterator
      }
  }
}
