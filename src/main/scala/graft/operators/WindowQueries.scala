package graft.operators

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, as-of join, and sessionization (SURVEY.md §2 q09, q14,
  * q15, q22).
  *
  * Scale notes: every query here shuffles exactly once, on its partition key
  * (customer / user), then does a per-partition sort — the canonical
  * distributed window pattern. The as-of join is the union+window formulation
  * (SURVEY.md §7.5.1): no crossJoin, no per-row subquery; cost is one shuffle
  * + sort over (events ∪ orders), which survives 100× data growth, unlike a
  * per-order lookup.
  */
object WindowQueries {

  /** As-of join: for each order, the most recent event of the same user with
    * ts <= o_orderdate (ties on ts broken by max event_id — mirrored in the
    * oracle's ORDER BY ts DESC, event_id DESC LIMIT 1). Sentinels -1/0.0
    * keep the output null-free (determinism rules, SURVEY.md §7.4).
    */
  /** Shared by q09 (union+window formulation) and q43 (native merge exec). */
  val asofOracleSql: String =
    """SELECT o_orderkey,
      |       coalesce(ev.event_id, -1) AS last_event_id,
      |       coalesce(ev.value, 0.0)   AS last_value
      |FROM orders LEFT JOIN LATERAL (
      |  SELECT event_id, value FROM events e
      |  WHERE e.user_id = orders.o_custkey AND e.ts <= orders.o_orderdate
      |  ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) ev ON TRUE
      |ORDER BY ALL""".stripMargin

  val q09 = EngineQuery("q09_join_asof", Some(asofOracleSql)) { t =>
    val ev = t.events.select(
      col("user_id").as("k"), col("ts"), col("event_id"), col("value"),
      lit(0).as("tag"), lit(null).cast("long").as("o_orderkey"))
    val od = t.orders.select(
      col("o_custkey").as("k"), col("o_orderdate").as("ts"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
      lit(1).as("tag"), col("o_orderkey"))
    // tag sorts events (0) before orders (1) at equal ts → "<=" semantics;
    // event_id asc means last() picks the max event_id among equal-ts events.
    val w = Window.partitionBy("k")
      .orderBy(col("ts").asc, col("tag").asc, col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedByAll(
      ev.unionByName(od)
        .withColumn("last_event_id", last(col("event_id"), ignoreNulls = true).over(w))
        .withColumn("last_value", last(col("value"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(
          col("o_orderkey"),
          coalesce(col("last_event_id"), lit(-1L)).as("last_event_id"),
          coalesce(col("last_value"), lit(0.0)).as("last_value")))
  }

  val q14 = EngineQuery(
    "q14_window_rank",
    Some("""SELECT * FROM (
           |  SELECT o_custkey, o_orderkey, o_totalprice,
           |    CAST(row_number() OVER (PARTITION BY o_custkey
           |         ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
           |    CAST(rank() OVER (PARTITION BY o_custkey
           |         ORDER BY o_totalprice DESC) AS INT) AS rnk,
           |    CAST(dense_rank() OVER (PARTITION BY o_custkey
           |         ORDER BY o_totalprice DESC) AS INT) AS drnk
           |  FROM orders) t WHERE rn <= 3 ORDER BY ALL""".stripMargin)) { t =>
    val wTotal = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    orderedByAll(
      t.orders
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(wTotal).as("rn"),
          rank().over(wPrice).as("rnk"),
          dense_rank().over(wPrice).as("drnk"))
        .filter(col("rn") <= 3))
  }

  val q15 = EngineQuery(
    "q15_window_analytic",
    Some("""SELECT user_id, event_id, epoch_us(ts)//1000000 AS ts_sec,
           |  coalesce(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), -999999.0) AS lag_v,
           |  coalesce(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), -999999.0) AS lead_v,
           |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum,
           |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
           |FROM events ORDER BY ALL""".stripMargin)) { t =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = w.rowsBetween(-2, 0)
    orderedByAll(
      t.events.select(
        col("user_id"), col("event_id"), epochSec(col("ts")).as("ts_sec"),
        coalesce(lag(col("value"), 1).over(w), lit(-999999.0)).as("lag_v"),
        coalesce(lead(col("value"), 1).over(w), lit(-999999.0)).as("lead_v"),
        round4(sum(col("value")).over(running)).as("run_sum"),
        round4(avg(col("value")).over(moving)).as("mov_avg")))
  }

  /** Sessionization with a 30-minute inactivity gap. Spark's session_window
    * starts a new session when ts - prev_ts >= gap; the oracle's
    * gaps-and-islands formulation uses the same >= comparison. Both engines
    * read events.ts at microsecond precision, so boundary decisions agree.
    */
  /** Time-weighted average over irregular samples — the telemetry/feature
    * aggregation a plain avg() gets wrong: each observation holds until the
    * next one (step-hold), so its weight is its holding DURATION, and
    * twa = Σ(value·dur)/Σ(dur) per user. lead() within the per-user time
    * order supplies the durations (the final open-ended sample carries no
    * duration and drops out), then one aggregation; single-sample users
    * have no held interval and are excluded by the Σdur > 0 gate on both
    * engines. Same scale shape as q71: one shuffle on user_id for the
    * window, one for the rollup. */
  val q102 = EngineQuery(
    "q102_time_weighted_avg",
    Some("""WITH s AS (SELECT user_id, value, epoch_us(ts)//1000000 AS tsec,
           |             epoch_us(lead(ts) OVER (PARTITION BY user_id
           |                      ORDER BY ts, event_id))//1000000 AS nxt
           |           FROM events),
           |d AS (SELECT user_id, value, nxt - tsec AS dur FROM s
           |      WHERE nxt IS NOT NULL)
           |SELECT user_id, round(sum(value * dur) / sum(dur), 4) AS twa,
           |       CAST(sum(dur) AS BIGINT) AS span_secs
           |FROM d GROUP BY user_id HAVING sum(dur) > 0 ORDER BY ALL""".stripMargin)) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    orderedByAll(
      t.events
        .select(col("user_id"), col("value"), epochSec(col("ts")).as("tsec"),
          epochSec(lead(col("ts"), 1).over(w)).as("nxt"))
        .filter(col("nxt").isNotNull)
        .withColumn("dur", col("nxt") - col("tsec"))
        .groupBy("user_id")
        .agg(round4(sum(col("value") * col("dur")) / sum(col("dur"))).as("twa"),
          sum(col("dur")).as("span_secs"))
        .filter(col("span_secs") > 0))
  }

  val q22 = EngineQuery(
    "q22_sessionize",
    Some("""WITH x AS (
           |  SELECT user_id, event_id, ts,
           |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |              >= INTERVAL 30 MINUTE
           |         THEN 1 ELSE 0 END AS ns
           |  FROM events),
           |y AS (
           |  SELECT user_id, ts,
           |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                  ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM x),
           |s AS (
           |  SELECT user_id, sid, count(*) AS n,
           |         min(ts) AS mn, max(ts) AS mx
           |  FROM y GROUP BY user_id, sid)
           |SELECT user_id,
           |  CAST(count(*) AS BIGINT) AS session_cnt,
           |  CAST(max(epoch_us(mx)//1000000 - epoch_us(mn)//1000000) AS BIGINT) AS max_sess_secs,
           |  round(avg(CAST(n AS DOUBLE)), 4) AS avg_sess_n
           |FROM s GROUP BY user_id ORDER BY ALL""".stripMargin)) { t =>
    val sessions = t.events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    orderedByAll(
      sessions
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("session_cnt"),
          max(epochSec(col("mx")) - epochSec(col("mn"))).as("max_sess_secs"),
          round4(avg(col("n").cast("double"))).as("avg_sess_n")))
  }

  /** The same as-of join through the native merge-based operator
    * (graft.plans.AsOfJoin): custom LogicalPlan + Strategy + SparkPlan.
    * Identical semantics and oracle as q09; one exchange + sort per side
    * and an O(n+m) streaming merge instead of the unioned window sort. */
  val q43 = EngineQuery("q43_join_asof_native", Some(asofOracleSql)) { t =>
    val orders = t.orders
    val events = t.events.select("user_id", "ts", "event_id", "value")
    val joined = graft.plans.AsOfJoin.asof(
      orders, events,
      leftKey = orders("o_custkey"), rightKey = events("user_id"),
      leftTime = orders("o_orderdate"), rightTime = events("ts"),
      rightTieBreak = Seq(events("event_id")))
    orderedByAll(
      joined.select(
        col("o_orderkey"),
        coalesce(col("event_id"), lit(-1L)).as("last_event_id"),
        coalesce(col("value"), lit(0.0)).as("last_value")))
  }

  /** Cohort retention: users grouped by first-activity week, counted as
    * active per (cohort, week offset). Two aggregations on user_id — the
    * cohort assignment and the weekly-active dedup — then one count-distinct
    * per cell; all shuffles key on user_id so AQE reuses the exchange. Week
    * offsets are exact integer arithmetic on epoch seconds (both engines
    * truncate weeks to Monday), so the oracle hash-matches.
    */
  val q58 = EngineQuery(
    "q58_cohort_retention",
    Some("""WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
           |           FROM events GROUP BY 1),
           |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
           |SELECT CAST(epoch_us(cohort)//1000000 AS BIGINT) AS cohort_sec,
           |       CAST((epoch_us(wk)//1000000 - epoch_us(cohort)//1000000)//604800 AS INT)
           |         AS week_offset,
           |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
           |FROM a JOIN f USING (user_id)
           |GROUP BY 1, 2 ORDER BY ALL""".stripMargin)) { t =>
    val f = t.events.groupBy("user_id")
      .agg(min(date_trunc("week", col("ts"))).as("cohort"))
    val a = t.events
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    orderedByAll(
      a.join(f, "user_id")
        .select(col("user_id"),
          epochSec(col("cohort")).as("cohort_sec"),
          expr("CAST((CAST(wk AS LONG) - CAST(cohort AS LONG)) DIV 604800 AS INT)")
            .as("week_offset"))
        .groupBy("cohort_sec", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users")))
  }

  /** Ordered funnel: signup → first click at-or-after it → first purchase
    * at-or-after that. Each stage is a groupBy(user) min-timestamp plus one
    * equi-join on user_id with a time residual — stages chain but every
    * shuffle keys on user_id, so the funnel depth adds joins, not new
    * partitionings. Single-row output (stage conversion counts).
    */
  val q59 = EngineQuery(
    "q59_funnel",
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
           |            WHERE event_type = 'signup' GROUP BY 1),
           |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           |       JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
           |       WHERE e.event_type = 'click' GROUP BY 1),
           |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           |       JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
           |       WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
           |       CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_after,
           |       CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_after""".stripMargin)) { t =>
    val ev = t.events
    def stage(typ: String, prev: Option[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
      val base = ev.filter(col("event_type") === typ)
        .select(col("user_id"), col("ts"))
      val gated = prev match {
        case None => base
        case Some(p) => base.join(p, Seq("user_id")).filter(col("ts") >= col("t"))
      }
      gated.groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    val s1 = stage("signup", None)
    val s2 = stage("click", Some(s1))
    val s3 = stage("purchase", Some(s2))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
  }

  /** Window distribution functions — ntile / percent_rank / cume_dist over
    * a unique total order (price, key): one shuffle on the partition key,
    * one per-partition sort, same distributed-window shape as q14/q15. */
  val q61 = EngineQuery(
    "q61_window_dist",
    Some("""SELECT o_orderkey,
           |       CAST(ntile(4) OVER w AS INT) AS quartile,
           |       round(percent_rank() OVER w, 4) AS pr,
           |       round(cume_dist() OVER w, 4) AS cd
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
           |ORDER BY ALL""".stripMargin)) { t =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orderedByAll(
      t.orders.select(
        col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round4(percent_rank().over(w)).as("pr"),
        round4(cume_dist().over(w)).as("cd")))
  }

  /** Time-series gap fill + forward fill: a dense hourly grid per user
    * (sequence + explode — generated distributed, never on the driver),
    * left-joined to the hourly aggregate, missing hours forward-filled with
    * `last(ignoreNulls)` over an unbounded-preceding window. Shuffles once
    * on user_id for the grid join and once for the fill window; the fill
    * copies the already-rounded value, so no new float ops can diverge
    * between engines. */
  val q62 = EngineQuery(
    "q62_gapfill",
    Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS lo,
           |                  date_trunc('hour', max(ts)) AS hi
           |           FROM events WHERE user_id < 5 GROUP BY 1),
           |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
           |         FROM b),
           |agg AS (SELECT user_id, date_trunc('hour', ts) AS hr, round(sum(value), 4) AS v
           |        FROM events WHERE user_id < 5 GROUP BY 1, 2),
           |j AS (SELECT g.user_id, g.hr, a.v FROM grid g
           |      LEFT JOIN agg a ON g.user_id = a.user_id AND g.hr = a.hr)
           |SELECT user_id, CAST(epoch_us(hr)//1000000 AS BIGINT) AS hr_sec,
           |       coalesce(last_value(v IGNORE NULLS) OVER (
           |         PARTITION BY user_id ORDER BY hr
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v_filled
           |FROM j ORDER BY ALL""".stripMargin)) { t =>
    val ev = t.events.filter(col("user_id") < 5)
    val b = ev.groupBy("user_id").agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val grid = b.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hr"))
    val agg = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(round4(sum(col("value"))).as("v"))
    val w = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderedByAll(
      grid.join(agg, Seq("user_id", "hr"), "left")
        .select(col("user_id"), epochSec(col("hr")).as("hr_sec"),
          coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0)).as("v_filled")))
  }

  /** Last-touch conversion attribution — for every purchase, credit the most
    * recent prior click/view by the same user within a 24 h lookback, then
    * roll conversions, revenue and touch-to-convert lag up per channel
    * ('none' when no touch qualifies). The marketing-analytics twin of the
    * as-of join: instead of joining per conversion (a per-row lookup that
    * dies at scale), the touch is carried FORWARD through the user's event
    * sequence by `last(_, ignoreNulls)` over ROWS UNBOUNDED PRECEDING..1
    * PRECEDING — one user-keyed exchange + per-partition sort for the whole
    * corpus, the same single-shuffle shape as q22/q59, then a channel-scale
    * (≤3 rows) rollup. The event_type filter pushes to the scan.
    *
    * Determinism: the window orders by (ts, event_id) — a total order, so
    * ties at the same timestamp resolve identically in both engines; the two
    * `last_value IGNORE NULLS` calls are non-null on exactly the same rows,
    * so touch_ts/touch_type always come from the same touch event. Lags are
    * integer epoch-second differences (both engines floor µs identically,
    * SURVEY §7.4.3) — exact BIGINT sums, no float accumulation. */
  val q163 = EngineQuery(
    "q163_attribution",
    Some("""WITH seq AS (
           |  SELECT user_id, ts, event_id, event_type, value,
           |    last_value(CASE WHEN event_type IN ('click','view') THEN ts END IGNORE NULLS)
           |      OVER w AS touch_ts,
           |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
           |      OVER w AS touch_type
           |  FROM events
           |  WHERE event_type IN ('click','view','purchase')
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           |SELECT CASE WHEN touch_ts IS NOT NULL AND touch_ts >= ts - INTERVAL 24 HOURS
           |            THEN touch_type ELSE 'none' END AS channel,
           |       CAST(count(*) AS BIGINT) AS n_purchases,
           |       round(sum(value), 4) AS sum_value,
           |       CAST(coalesce(sum(CASE WHEN touch_ts IS NOT NULL AND touch_ts >= ts - INTERVAL 24 HOURS
           |         THEN epoch_us(ts)//1000000 - epoch_us(touch_ts)//1000000 END), 0) AS BIGINT) AS sum_lag_sec
           |FROM seq WHERE event_type = 'purchase'
           |GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val isTouch = col("event_type").isin("click", "view")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seq = t.events
      .filter(col("event_type").isin("click", "view", "purchase"))
      .withColumn("touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
    val attributed = col("touch_ts").isNotNull &&
      col("touch_ts") >= col("ts") - expr("INTERVAL 24 HOURS")
    orderedByAll(
      seq.filter(col("event_type") === "purchase")
        .groupBy(when(attributed, col("touch_type")).otherwise("none").as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          round4(sum(col("value"))).as("sum_value"),
          coalesce(sum(when(attributed,
            epochSec(col("ts")) - epochSec(col("touch_ts")))), lit(0L))
            .as("sum_lag_sec")))
  }

  /** Exponential moving average per key — the recursive smoother
    * (ewma_t = α·x_t + (1−α)·ewma_{t−1}, α = 0.3, seeded with the first
    * value) that no SQL window frame expresses directly because each output
    * depends on ALL prior inputs with geometric weights. Two standard
    * escapes exist: the closed-form window sum Σ x_i·(1−α)^(t−i) — which
    * overflows/loses precision as (1−α)^(−i) grows — and the explicit
    * left fold over the key's ordered history. This takes the fold: collect
    * each customer's order totals sorted by (date, key) and fold
    * `acc ← 0.3·x + 0.7·acc` with a higher-order `aggregate`.
    *
    * Determinism across engines is the fold itself: Spark's `aggregate`
    * and DuckDB's `list_reduce` both left-fold seeded with element 1, so
    * the doubles are BIT-IDENTICAL (same trick as dsl.foldSum) — a window
    * sum would associate differently per engine. Scale shape: one shuffle
    * keyed by o_custkey carrying (8B key, 8B ts, 8B id, 8B value); the
    * per-key array is orders-per-customer — a bounded constant (~10) in
    * this schema, so the fold is O(1) per key at any corpus size. */
  val q170 = EngineQuery(
    "q170_ewma",
    Some("""WITH s AS (SELECT o_custkey, count(*) AS n_orders,
           |            list(o_totalprice ORDER BY o_orderdate, o_orderkey) AS vals
           |          FROM orders GROUP BY 1)
           |SELECT o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
           |       round(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 4) AS ewma
           |FROM s WHERE n_orders >= 10 ORDER BY ALL""".stripMargin)) { t =>
    val grouped = t.orders.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sort_array(collect_list(struct(
        col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))).as("xs"))
    orderedByAll(
      grouped.filter(col("n_orders") >= 10)
        .withColumn("vals", transform(col("xs"), s => s.getField("o_totalprice")))
        .select(col("o_custkey"), col("n_orders"),
          round4(aggregate(
            slice(col("vals"), lit(2), size(col("vals")) - 1),
            element_at(col("vals"), 1),
            (acc, x) => lit(0.3) * x + lit(0.7) * acc)).as("ewma")))
  }

  /** Event-rate spike detection — rolling z-score of each hour's event
    * count per type against its trailing 24 hours (the streaming-ops
    * anomaly monitor: ingestion spikes, bot bursts, pipeline stalls all
    * show up as |z| outliers in the rate series before anything else).
    *
    * Scale shape: the corpus collapses FIRST through one combinable
    * (type, hour) count — the only corpus-scale exchange; the rolling
    * window then runs over the rate table, whose size is types × hours in
    * retention (time-scale, not corpus-scale — unchanged by 100× event
    * volume). Per-type series sort within one task is bounded by the
    * retention window, the same discipline as q161's histogram windows.
    *
    * Determinism: mean and variance are derived from EXACT integer
    * window sums (Σcnt, Σcnt² over ROWS 24..1 PRECEDING) through an
    * identical expression tree on both engines — never from the engines'
    * own avg/stddev accumulators, whose summation orders differ. The
    * variance is +1.0-regularized so flat histories (var = 0) yield a
    * finite damped z instead of a NaN on both sides. */
  /** Shared with q177 (the stateful twin in graft.streaming) — both are
    * gated by the SAME oracle, so declarative and arbitrary-state forms
    * can never drift apart. */
  private[graft] val RateSpikeSql: String =
    """WITH c AS (SELECT event_type,
           |    epoch_us(date_trunc('hour', ts))//1000000 AS hh,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM events GROUP BY 1, 2),
           |w AS (SELECT event_type, hh, cnt,
           |    CAST(count(cnt) OVER win AS BIGINT) AS n_prev,
           |    sum(cnt) OVER win AS s1,
           |    sum(cnt * cnt) OVER win AS s2
           |  FROM c
           |  WINDOW win AS (PARTITION BY event_type ORDER BY hh
           |                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
           |SELECT event_type, hh, cnt, n_prev,
           |  round((CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / n_prev)
           |        / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_prev)
           |               / (n_prev - 1) + 1.0), 4) AS z
           |FROM w WHERE n_prev >= 12 ORDER BY ALL""".stripMargin

  val q176 = EngineQuery("q176_rate_spike", Some(RateSpikeSql)) { t =>
    val c = t.events
      .groupBy(col("event_type"),
        epochSec(date_trunc("hour", col("ts"))).as("hh"))
      .agg(count(lit(1)).as("cnt"))
    val win = Window.partitionBy("event_type").orderBy("hh").rowsBetween(-24, -1)
    val w = c.select(col("event_type"), col("hh"), col("cnt"),
      count(col("cnt")).over(win).as("n_prev"),
      sum(col("cnt")).over(win).as("s1"),
      sum(col("cnt") * col("cnt")).over(win).as("s2"))
    orderedByAll(w.filter(col("n_prev") >= 12).select(
      col("event_type"), col("hh"), col("cnt"), col("n_prev"),
      round4((col("cnt").cast("double") - col("s1").cast("double") / col("n_prev"))
        / sqrt((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n_prev"))
          / (col("n_prev") - 1) + 1.0)).as("z")))
  }

  val all: Seq[EngineQuery] =
    Seq(q09, q14, q15, q22, q43, q58, q59, q61, q62, q102, q163, q170, q176)
}
