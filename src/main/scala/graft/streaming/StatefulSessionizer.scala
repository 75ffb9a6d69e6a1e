package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via KeyValueGroupedDataset.flatMapGroupsWithState
  * — the arbitrary-state Structured Streaming surface (SURVEY.md §2 group H).
  * q22 covers the declarative session_window aggregation; this module is the
  * escape hatch for session logic session_window can't express (per-session
  * payloads, custom merge rules), kept semantically aligned with it: a new
  * session starts when ts - prev_ts >= gap.
  *
  * State per user is O(1) (the open session only); completed sessions are
  * emitted as soon as they close. In streaming mode the open session is
  * flushed by an event-time timeout once the watermark passes last_ts + gap —
  * so state size is bounded by |active users in the gap window|, which is
  * what makes this run forever at scale.
  */
object StatefulSessionizer {

  /** One event. The raw timestamp column stays in the Dataset — projecting
    * it away would strip the stream's watermark, which EventTimeTimeout
    * requires. Microseconds are derived in [[us]]. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long) {
    def us: Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
  }
  /** One closed session. */
  final case class Sess(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)
  /** The open-session state. */
  final case class Acc(startUs: Long, lastUs: Long, n: Long)

  private def toSess(user: Long, a: Acc): Sess =
    Sess(user, a.startUs / 1000000L, a.lastUs / 1000000L, a.n)

  /** Fold sorted events into (closed sessions, open session). */
  private def fold(prior: Option[Acc], evs: Seq[Ev], gapUs: Long): (List[Sess], Option[Acc], Long) = {
    var closed = List.empty[Sess]
    var cur = prior
    var user = 0L
    evs.foreach { e =>
      user = e.user_id
      cur match {
        case Some(a) if e.us - a.lastUs >= gapUs =>
          closed ::= toSess(user, a)
          cur = Some(Acc(e.us, e.us, 1))
        case Some(a) =>
          cur = Some(Acc(a.startUs, e.us, a.n + 1))
        case None =>
          cur = Some(Acc(e.us, e.us, 1))
      }
    }
    (closed.reverse, cur, user)
  }

  private def asEvents(events: DataFrame): Dataset[Ev] = {
    implicit val enc = Encoders.product[Ev]
    events.select(col("user_id"), col("ts"), col("event_id")).as[Ev]
  }

  /** Batch mode via SECONDARY SORT — the scale path: repartition by user,
    * sort each partition by (user, ts, event_id), then fold runs of the
    * same user with O(1) state in one streaming pass. Unlike
    * [[sessionizeBatch]] (which must materialize a user's events to sort
    * them — a hot-key memory hazard), per-key cost here is constant no
    * matter how many events one user has; the sort is Spark's spillable
    * external sort. */
  def sessionizeBatchSorted(events: DataFrame, gapMinutes: Int): Dataset[Sess] = {
    implicit val enc = Encoders.product[Sess]
    val gapUs = gapMinutes * 60L * 1000000L
    import org.apache.spark.sql.functions.col
    asEvents(events)
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        new Iterator[Sess] {
          private var pending: List[Sess] = Nil
          private var curUser = 0L
          private var cur: Acc = null
          private def step(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val e = it.next()
              if (cur == null) { curUser = e.user_id; cur = Acc(e.us, e.us, 1) }
              else if (e.user_id != curUser) {
                pending = toSess(curUser, cur) :: Nil
                curUser = e.user_id; cur = Acc(e.us, e.us, 1)
              } else if (e.us - cur.lastUs >= gapUs) {
                pending = toSess(curUser, cur) :: Nil
                cur = Acc(e.us, e.us, 1)
              } else cur = Acc(cur.startUs, e.us, cur.n + 1)
            }
            if (pending.isEmpty && !it.hasNext && cur != null) {
              pending = toSess(curUser, cur) :: Nil
              cur = null
            }
          }
          override def hasNext: Boolean = { step(); pending.nonEmpty }
          override def next(): Sess = {
            step(); val h = pending.head; pending = pending.tail; h
          }
        }
      }
  }

  /** Batch mode: each group is complete, so the trailing session is emitted
    * too. Exercises the same flatMapGroupsWithState machinery (NoTimeout).
    * NOTE: materializes one user's events to sort them — fine for bounded
    * per-user volumes; [[sessionizeBatchSorted]] is the unbounded-key path. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): Dataset[Sess] = {
    implicit val enc = Encoders.product[Sess]
    implicit val accEnc = Encoders.product[Acc]
    implicit val lenc = Encoders.scalaLong
    val gapUs = gapMinutes * 60L * 1000000L
    asEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[Acc]) =>
          val evs = it.toVector.sortBy(e => (e.us, e.event_id))
          val (closed, open, _) = fold(state.getOption, evs, gapUs)
          (closed ++ open.map(toSess(user, _))).iterator
      }
  }

  /** Streaming mode: closed sessions emit immediately; the open session is
    * held in state with an event-time timeout at last_ts + gap, and flushed
    * when the watermark passes it. `events` must carry a watermark on ts. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int): Dataset[Sess] = {
    implicit val enc = Encoders.product[Sess]
    implicit val accEnc = Encoders.product[Acc]
    implicit val lenc = Encoders.scalaLong
    val gapUs = gapMinutes * 60L * 1000000L
    asEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[Acc]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSess(user, _)).iterator
            state.remove()
            out
          } else {
            val evs = it.toVector.sortBy(e => (e.us, e.event_id))
            val (closed, open, _) = fold(state.getOption, evs, gapUs)
            open match {
              case Some(a) =>
                state.update(a)
                state.setTimeoutTimestamp((a.lastUs + gapUs) / 1000L)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
