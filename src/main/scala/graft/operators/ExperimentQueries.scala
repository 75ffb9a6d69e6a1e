package graft.operators

import graft.EngineQuery
import graft.dsl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation analytics (SURVEY.md §2 Part B, round 9): the A/B- and
  * lifecycle-measurement layer of an event platform — variance-reduced
  * treatment effects (q201 CUPED), censored time-to-event curves (q202
  * Kaplan-Meier), and proportion significance tests (q203). All three
  * collapse the event corpus to USER-scale rows in one combinable
  * exchange and do their statistics on aggregates — event volume only
  * changes the first stage. All oracle-checked: the statistics are
  * closed-form arithmetic over exact counts (plus covar/var aggregates,
  * rounded at 4dp like every float).
  *
  * Period/arm assignments are data-driven and deterministic: the CUPED
  * pre/post split is the corpus midpoint (scale-free — a literal date
  * would rot when the fixture regenerates), arms are user-id parity (the
  * same hash-assignment shape as q72/q169).
  */
object ExperimentQueries {

  /** q201: CUPED variance reduction (Deng et al., WSDM'13 — the default
    * trick of every large experimentation platform): adjust each user's
    * post-period metric Y by their PRE-period covariate X,
    * Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), which strictly shrinks
    * variance by corr² without biasing the mean. One user-scale exchange
    * builds (x, y) per user; θ/X̄ are a 1-row aggregate broadcast back
    * (driver-sized-model shape); the per-arm report compares raw vs
    * adjusted mean and variance — var_y_adj ≤ var_y is the spec-pinned
    * CUPED contract. */
  val q201 = EngineQuery(
    "q201_cuped",
    Some("""WITH b AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
           |           FROM events),
           |u AS (SELECT user_id,
           |        sum(CASE WHEN epoch_us(ts) < b.mid THEN value ELSE 0 END) AS x,
           |        sum(CASE WHEN epoch_us(ts) >= b.mid THEN value ELSE 0 END) AS y,
           |        user_id % 2 = 0 AS treat
           |      FROM events CROSS JOIN b GROUP BY user_id, b.mid),
           |th AS (SELECT covar_pop(x, y) / var_pop(x) AS theta, avg(x) AS xbar
           |       FROM u),
           |adj AS (SELECT u.treat, u.y, u.y - th.theta * (u.x - th.xbar) AS y_adj
           |        FROM u CROSS JOIN th)
           |SELECT CAST(treat AS INT) AS treat, CAST(count(*) AS BIGINT) AS n_users,
           |  round(avg(y), 4) AS mean_y,
           |  round(avg(y_adj), 4) AS mean_y_adj,
           |  round(var_pop(y), 4) AS var_y,
           |  round(var_pop(y_adj), 4) AS var_y_adj
           |FROM adj GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val mid = t.events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2)
        .cast("long").as("mid"))
    val u = t.events.crossJoin(broadcast(mid))
      .groupBy(col("user_id"), (col("user_id") % 2 === 0).as("treat"))
      .agg(
        sum(when(unix_micros(col("ts")) < col("mid"), col("value")).otherwise(0.0)).as("x"),
        sum(when(unix_micros(col("ts")) >= col("mid"), col("value")).otherwise(0.0)).as("y"))
    val th = u.agg(
      (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("theta"),
      avg(col("x")).as("xbar"))
    val adj = u.crossJoin(broadcast(th))
      .select(col("treat"), col("y"),
        (col("y") - col("theta") * (col("x") - col("xbar"))).as("y_adj"))
    orderedByAll(adj
      .groupBy(col("treat").cast("int").as("treat"))
      .agg(count(lit(1)).as("n_users"),
        round4(avg(col("y"))).as("mean_y"),
        round4(avg(col("y_adj"))).as("mean_y_adj"),
        round4(var_pop(col("y"))).as("var_y"),
        round4(var_pop(col("y_adj"))).as("var_y_adj")))
  }

  /** q202: Kaplan-Meier survival curve for time-to-first-purchase with
    * right censoring at the observation window's end — the estimator
    * behind every retention/conversion-lag analysis that can't just drop
    * users who haven't converted YET (dropping them biases the curve; KM's
    * at-risk denominators handle it exactly). Users collapse to
    * (duration, event?) in one exchange at µs precision (unix_micros on
    * both engines — second-truncated arithmetic would mis-bucket exact
    * day boundaries); the life table and the product-limit cumsum (via
    * exp∘Σln) run over DAY-scale rows — the unpartitioned windows scan
    * ≤ observation-window-days rows, the pinned-benign time-scale class.
    * A terminal all-remaining-die row (n_risk == d) would put ln(0) into
    * the cumsum; both engines drop it identically (S touches 0 and the
    * curve ends). */
  val q202 = EngineQuery(
    "q202_kaplan_meier",
    Some("""WITH bounds AS (SELECT max(ts) AS tend FROM events),
           |u AS (SELECT user_id, min(ts) AS t0,
           |        min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
           |      FROM events GROUP BY user_id),
           |d AS (SELECT u.user_id,
           |        CASE WHEN u.tp IS NOT NULL
           |          THEN CAST(floor((epoch_us(u.tp) - epoch_us(u.t0)) / 86400000000.0) AS BIGINT)
           |          ELSE CAST(floor((epoch_us(b.tend) - epoch_us(u.t0)) / 86400000000.0) AS BIGINT) END AS dur,
           |        CASE WHEN u.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
           |      FROM u CROSS JOIN bounds b),
           |g AS (SELECT dur AS day, sum(ev) AS d_events,
           |        sum(1 - ev) AS d_censored
           |      FROM d GROUP BY dur),
           |o AS (SELECT day, d_events, d_censored,
           |        (SELECT count(*) FROM d) -
           |          coalesce(sum(d_events + d_censored) OVER (ORDER BY day
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
           |      FROM g),
           |s AS (SELECT day, d_events, n_risk,
           |        exp(sum(ln(1.0 - CAST(d_events AS DOUBLE) / n_risk))
           |            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) AS surv
           |      FROM o WHERE d_events < n_risk)
           |SELECT CAST(day AS BIGINT) AS day, CAST(d_events AS BIGINT) AS d_events,
           |  CAST(n_risk AS BIGINT) AS n_risk, round(surv, 4) AS surv
           |FROM s ORDER BY ALL""".stripMargin)) { t =>
    val tend = t.events.agg(max(col("ts")).as("tend"))
    val u = t.events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
    val d = u.crossJoin(broadcast(tend))
      .select(
        when(col("tp").isNotNull,
          floor((unix_micros(col("tp")) - unix_micros(col("t0"))) / 86400000000.0))
          .otherwise(
            floor((unix_micros(col("tend")) - unix_micros(col("t0"))) / 86400000000.0))
          .cast("long").as("dur"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"))
    val total = d.agg(count(lit(1)).as("total"))
    val g = d.groupBy(col("dur").as("day"))
      .agg(sum(col("ev")).as("d_events"), sum(lit(1L) - col("ev")).as("d_censored"))
    val wPrev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val o = g.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("d_events") + col("d_censored")).over(wPrev), lit(0L)))
      .filter(col("d_events") < col("n_risk"))
      .withColumn("surv",
        exp(sum(log(lit(1.0) - col("d_events").cast("double") / col("n_risk"))).over(wCum)))
    orderedByAll(o.select(col("day"), col("d_events"), col("n_risk"),
      round4(col("surv")).as("surv")))
  }

  /** q203: two-proportion z-test on an A/B split — the readout primitive
    * of an experimentation platform: arms by user-id parity, conversion =
    * heavy purchaser (≥ 14 purchase events), z = (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁))
    * under the pooled null, |z| ≥ 1.96 flags at the 5% level. One
    * user-scale exchange, then a 2-row pivot and closed-form arithmetic —
    * the statistics cost nothing at any event volume. (The fixture's arms
    * are random, so a significant read here is the false-positive rate
    * doing its job — the ARITHMETIC is the contract, hash-matched.) */
  val q203 = EngineQuery(
    "q203_ab_ztest",
    Some("""WITH u AS (SELECT user_id, user_id % 2 AS arm,
           |        count(*) FILTER (WHERE event_type = 'purchase') AS np
           |      FROM events GROUP BY user_id),
           |c AS (SELECT arm, count(*) AS n,
           |        sum(CASE WHEN np >= 14 THEN 1 ELSE 0 END) AS conv
           |      FROM u GROUP BY arm),
           |w AS (SELECT
           |    max(CASE WHEN arm = 0 THEN n END) AS n0,
           |    max(CASE WHEN arm = 0 THEN conv END) AS c0,
           |    max(CASE WHEN arm = 1 THEN n END) AS n1,
           |    max(CASE WHEN arm = 1 THEN conv END) AS c1
           |  FROM c),
           |z AS (SELECT n0, c0, n1, c1,
           |    CAST(c0 AS DOUBLE)/n0 AS p0, CAST(c1 AS DOUBLE)/n1 AS p1,
           |    CAST(c0 + c1 AS DOUBLE)/(n0 + n1) AS pp FROM w)
           |SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
           |  CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           |  round(p0, 4) AS rate_control, round(p1, 4) AS rate_treat,
           |  round((p1 - p0) / sqrt(pp * (1 - pp) * (1.0/n0 + 1.0/n1)), 4) AS z,
           |  CAST(CASE WHEN abs((p1 - p0) / sqrt(pp * (1 - pp) * (1.0/n0 + 1.0/n1))) >= 1.96
           |    THEN 1 ELSE 0 END AS INT) AS significant
           |FROM z""".stripMargin)) { t =>
    val u = t.events
      .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
    val c = u.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("np") >= 14, 1L).otherwise(0L)).as("conv"))
    val w = c.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("conv"))).as("c0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("conv"))).as("c1"))
    val p0 = col("c0").cast("double") / col("n0")
    val p1 = col("c1").cast("double") / col("n1")
    val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    val z = (p1 - p0) / sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    w.select(col("n0").as("n_control"), col("c0").as("conv_control"),
      col("n1").as("n_treat"), col("c1").as("conv_treat"),
      round4(p0).as("rate_control"), round4(p1).as("rate_treat"),
      round4(z).as("z"),
      when(abs(z) >= 1.96, 1).otherwise(0).cast("int").as("significant"))
  }

  /** q212: conversion-lag percentiles — the timing half of the funnel
    * story (q59/q141 count who converts, q202 models who hasn't yet; q212
    * reports HOW LONG converters take): per user, the lag from first view
    * to the first subsequent purchase, summarized as exact p50/p90/mean.
    * The corpus collapses to user-scale (view, purchase) firsts in two
    * combinable exchanges + one user-keyed join; the exact percentiles
    * are order statistics over the user-scale lag table — corpus-fraction
    * ranks, so the shared [[graft.functions.GlobalRank]] core selects
    * them (no TakeOrdered driver merge, no unpartitioned rank window),
    * and ONE aggregate row leaves the cluster. µs precision on both
    * engines (unix_micros ≡ epoch_us — second-truncated arithmetic would
    * mis-rank near-tied lags). */
  val q212 = EngineQuery(
    "q212_conversion_lag",
    Some("""WITH v AS (SELECT user_id, min(ts) AS tv FROM events
           |           WHERE event_type = 'view' GROUP BY 1),
           |p AS (SELECT e.user_id, min(e.ts) AS tp
           |      FROM events e JOIN v ON e.user_id = v.user_id
           |      WHERE e.event_type = 'purchase' AND e.ts > v.tv GROUP BY 1),
           |l AS (SELECT v.user_id,
           |        (epoch_us(p.tp) - epoch_us(v.tv)) / 1000000.0 AS lag_sec
           |      FROM v JOIN p ON v.user_id = p.user_id),
           |r AS (SELECT user_id, lag_sec,
           |        row_number() OVER (ORDER BY lag_sec, user_id) AS rn,
           |        count(*) OVER () AS n FROM l)
           |SELECT CAST(max(n) AS BIGINT) AS n_users,
           |  round(min(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN lag_sec END), 4) AS p50_sec,
           |  round(min(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN lag_sec END), 4) AS p90_sec,
           |  round(avg(lag_sec), 4) AS mean_sec
           |FROM r""".stripMargin)) { t =>
    val v = t.events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
    val p = t.events.filter(col("event_type") === "purchase")
      .join(v.withColumnRenamed("user_id", "v_uid"),
        col("user_id") === col("v_uid") && col("ts") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
    val l = v
      .join(p.withColumnRenamed("user_id", "p_uid"), col("user_id") === col("p_uid"))
      .select(col("user_id"),
        ((unix_micros(col("tp")) - unix_micros(col("tv"))) / 1000000.0).as("lag_sec"))
    // The total comes out of GlobalRank's offset pass — no separate count()
    // job over the lag table before the range exchange.
    val (ranked, n) = graft.functions.GlobalRank
      .withGlobalIdAndCount(l, Seq(col("lag_sec"), col("user_id")))
    if (n == 0L) {
      // Degenerate corpus (no converter ever): the oracle's aggregate over
      // the empty lag table yields ONE all-NULL row, not n_users = 0.
      t.spark.range(1).select(
        lit(null).cast("bigint").as("n_users"),
        lit(null).cast("double").as("p50_sec"),
        lit(null).cast("double").as("p90_sec"),
        lit(null).cast("double").as("mean_sec"))
    } else {
      val k50 = math.ceil(n * 0.5).toLong
      val k90 = math.ceil(n * 0.9).toLong
      ranked.agg(
        lit(n).as("n_users"),
        round4(min(when(col("gid") === k50 - 1, col("lag_sec")))).as("p50_sec"),
        round4(min(when(col("gid") === k90 - 1, col("lag_sec")))).as("p90_sec"),
        round4(avg(col("lag_sec"))).as("mean_sec"))
    }
  }

  /** q213: per-priority ship-latency percentiles — exact p50/p90/p99 of
    * order→ship lag through the THIRD exact-percentile mechanism in the
    * engine (q40's percentile aggregate, q196/q200/q212's GlobalRank
    * order statistics, and here the BOUNDED-DOMAIN HISTOGRAM: lags are
    * integer days, so the corpus collapses to per-(priority, day) counts
    * in one combinable exchange and the percentile is a cumulative-count
    * threshold over ≤ a-few-thousand day rows per priority — domain-scale
    * windows, no ranking machinery at all). The right mechanism whenever
    * the value domain is small relative to the corpus (days, ages, status
    * codes): at 100 TB the histogram is the ONLY exact-percentile path
    * whose state doesn't grow with rows. Both engines compute day lags as
    * DATE differences (µs-time truncation identical). */
  val q213 = EngineQuery(
    "q213_ship_latency",
    Some("""WITH lag AS (SELECT o.o_orderpriority AS prio,
           |        datediff('day', CAST(o.o_orderdate AS DATE),
           |                 CAST(l.l_shipdate AS DATE)) AS d
           |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
           |h AS (SELECT prio, d, count(*) AS c FROM lag GROUP BY 1, 2),
           |cum AS (SELECT prio, d, c,
           |        sum(c) OVER (PARTITION BY prio ORDER BY d
           |                     ROWS UNBOUNDED PRECEDING) AS cc,
           |        sum(c) OVER (PARTITION BY prio) AS n
           |      FROM h)
           |SELECT prio, CAST(max(n) AS BIGINT) AS n_items,
           |  CAST(min(CASE WHEN cc >= ceil(n * 0.5) THEN d END) AS INT) AS p50_days,
           |  CAST(min(CASE WHEN cc >= ceil(n * 0.9) THEN d END) AS INT) AS p90_days,
           |  CAST(min(CASE WHEN cc >= ceil(n * 0.99) THEN d END) AS INT) AS p99_days
           |FROM cum GROUP BY prio ORDER BY ALL""".stripMargin)) { t =>
    val lag = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")).as("d"))
    val h = lag.groupBy(col("prio"), col("d")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("prio").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("prio")
    val cum = h
      .withColumn("cc", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    orderedByAll(cum.groupBy(col("prio"))
      .agg(max(col("n")).as("n_items"),
        min(when(col("cc") >= ceil(col("n") * 0.5), col("d"))).cast("int").as("p50_days"),
        min(when(col("cc") >= ceil(col("n") * 0.9), col("d"))).cast("int").as("p90_days"),
        min(when(col("cc") >= ceil(col("n") * 0.99), col("d"))).cast("int").as("p99_days")))
  }

  val all: Seq[EngineQuery] = Seq(q201, q202, q203, q212, q213)
}
