package graft.operators

import graft.EngineQuery
import graft.dsl._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical evaluation & monitoring (SURVEY.md §2 Part B, round 9):
  * the measurement layer a production data/model pipeline runs NEXT TO its
  * transforms — is the quality model calibrated (q190), how uncertain is
  * this corpus metric (q192), is today's traffic seasonally anomalous
  * (q193). All three are exact, closed-form and oracle-checked: no RNG
  * (bootstrap weights come from a deterministic integer LCG both engines
  * evaluate bit-identically), no unbounded state (every aggregate is
  * combinable, every window partition is group-scale).
  *
  * Scale notes (100 TB north star):
  *  - q190 is map-side scoring (the frozen model is a 64-double literal
  *    expression — the same driver-sized-model broadcast shape as q37's
  *    centroids) + ONE combinable 10-bucket aggregation.
  *  - q192 amplifies ×32 map-side but partial-aggregates in the same
  *    stage: the exchange carries 32×|types| partial rows, not 32× the
  *    corpus — the "online/Poisson bootstrap" (Owen & Eckles 2012) that
  *    made resampling feasible on clusters in the first place. The rank
  *    window sees 32 rows per type.
  *  - q193 reduces the corpus to a (type, day) count table in one
  *    combinable exchange; the seasonal baseline and z-scores are
  *    time-scale arithmetic, invariant to event volume.
  */
object EvalQueries {

  /** Frozen linear scorer for q190: w_j = (((j-1)·37 mod 19) − 9)/10 for
    * j = 1..64 — a closed-form weight vector both engines derive from
    * integer arithmetic, standing in for "the published weights of the
    * current quality-classifier release" (versioned-model serving, like
    * q186 encodes against frozen quantizers). Fold order is position-
    * ascending, the q25 numeric contract. */
  private def frozenScore(emb: Column): Column = {
    val dot = aggregate(
      transform(sequence(lit(1), lit(64)), j =>
        (((j - 1) * 37 % 19).cast("double") - 9.0) / 10.0
          * element_at(emb, j).cast("double")),
      lit(0.0), (a, x) => a + x)
    lit(1.0) / (lit(1.0) + exp(-dot))
  }

  /** q190: model-calibration audit — score every vector with the FROZEN
    * release classifier and compare predicted probability to realized
    * positive rate per score decile (the reliability-diagram table every
    * ML eval stack draws). A well-calibrated model has mean_score ≈
    * pos_rate per bucket; drift between them is the signal to recalibrate
    * before the filter mislabels a corpus. Map-only scoring under a
    * literal model + one 10-row aggregation — nothing here scales with
    * corpus size except the single combinable exchange. */
  val q190 = EngineQuery(
    "q190_calibration",
    Some("""WITH s AS (
           |  SELECT vec_id, label,
           |    1.0 / (1.0 + exp(-(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list_transform(generate_series(1, 64),
           |        j -> (CAST(((j-1)*37) % 19 AS DOUBLE) - 9.0) / 10.0
           |             * CAST(embedding[j] AS DOUBLE))),
           |      (a, b) -> a + b)))) AS score
           |  FROM embeddings)
           |SELECT CAST(least(floor(score*10), 9) AS INT) AS bucket,
           |  CAST(count(*) AS BIGINT) AS n,
           |  round(avg(score), 4) AS mean_score,
           |  round(avg(CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END), 4) AS pos_rate
           |FROM s GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val scored = t.embeddings
      .select(col("label"), frozenScore(col("embedding")).as("score"))
    orderedByAll(scored
      .groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round4(avg(col("score"))).as("mean_score"),
        round4(avg(when(col("label") < 5, 1.0).otherwise(0.0))).as("pos_rate")))
  }

  /** Bootstrap replicate count for q192 — 32 gives p05/p95 as the 2nd/31st
    * order statistics, enough for a monitoring CI at 32× map-side cost. */
  val BootReplicates = 32

  /** q192: Poisson-bootstrap confidence intervals for per-type mean event
    * value — the uncertainty a metrics pipeline must attach to every
    * corpus-level number before anyone compares two of them. Classic
    * resampling draws n rows WITH replacement per replicate — impossible
    * to coordinate distributed; the online bootstrap replaces it with an
    * independent Poisson(1) weight per (row, replicate), which is
    * MAP-SIDE: each row derives its 32 weights from a deterministic
    * integer hash (LCG over event_id and replicate — identical BIGINT
    * arithmetic on both engines, mod-before-multiply so nothing exceeds
    * 2^62), and the replicate means partial-aggregate in the same stage.
    * Weights follow the Poisson(1) pmf thresholds (e⁻¹, 2e⁻¹, 5e⁻¹/2, …
    * capped at 4). The CI is the 2nd/31st order statistic of the 32
    * replicate means — a 32-row window per type. Replicate means are
    * rounded to 6dp BEFORE ranking so both engines rank identical doubles
    * (distributed sum order is ulp-unstable; adjacent replicate means
    * differ by sampling noise ≫ 1e-6, so the rounding never reorders
    * real differences). */
  val q192 = EngineQuery(
    "q192_bootstrap_ci",
    Some("""WITH r AS (SELECT unnest(generate_series(1, 32)) AS r),
           |w AS (SELECT event_type, value, r.r,
           |        CAST(((((event_id + r.r * 1013904223) % 2147483647) * 2654435761)
           |              % 2147483647) AS DOUBLE) / 2147483647.0 AS u
           |      FROM events CROSS JOIN r),
           |k AS (SELECT event_type, r, value,
           |        CASE WHEN u < 0.367879 THEN 0 WHEN u < 0.735759 THEN 1
           |             WHEN u < 0.919699 THEN 2 WHEN u < 0.981012 THEN 3
           |             ELSE 4 END AS k
           |      FROM w),
           |m AS (SELECT event_type, r,
           |        round(sum(k * value) / sum(k), 6) AS bm
           |      FROM k GROUP BY 1, 2),
           |rk AS (SELECT event_type, bm,
           |        row_number() OVER (PARTITION BY event_type
           |                           ORDER BY bm, r) AS rn
           |      FROM m),
           |ci AS (SELECT event_type,
           |        round(min(CASE WHEN rn = 2 THEN bm END), 4) AS ci_lo,
           |        round(min(CASE WHEN rn = 31 THEN bm END), 4) AS ci_hi
           |      FROM rk GROUP BY 1),
           |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |        round(avg(value), 4) AS mean FROM events GROUP BY 1)
           |SELECT pt.event_type, pt.n, pt.mean, ci.ci_lo, ci.ci_hi
           |FROM pt JOIN ci USING (event_type) ORDER BY ALL""".stripMargin)) { t =>
    val base = t.events.select(col("event_id"), col("event_type"), col("value"))
    val reps = base
      .withColumn("r", explode(sequence(lit(1), lit(BootReplicates))))
      .withColumn("u",
        ((((col("event_id") + col("r") * 1013904223L) % 2147483647L)
          * 2654435761L) % 2147483647L).cast("double") / 2147483647.0)
      .withColumn("k",
        when(col("u") < 0.367879, 0).when(col("u") < 0.735759, 1)
          .when(col("u") < 0.919699, 2).when(col("u") < 0.981012, 3)
          .otherwise(4))
    val means = reps.groupBy(col("event_type"), col("r"))
      .agg(round(sum(col("k") * col("value")) / sum(col("k")), 6).as("bm"))
    val ranked = means.withColumn("rn", row_number().over(
      Window.partitionBy("event_type").orderBy(col("bm"), col("r"))))
    val ci = ranked.groupBy("event_type").agg(
      round4(min(when(col("rn") === 2, col("bm")))).as("ci_lo"),
      round4(min(when(col("rn") === BootReplicates - 1, col("bm")))).as("ci_hi"))
    val point = base.groupBy("event_type").agg(
      count(lit(1)).as("n"), round4(avg(col("value"))).as("mean"))
    orderedByAll(point.join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean"), col("ci_lo"), col("ci_hi")))
  }

  /** q193: seasonal-baseline anomaly detection — is each (type, day)'s
    * event count anomalous AGAINST ITS OWN WEEKDAY's history, not against
    * a flat mean (q176's spike rule)? Traffic has day-of-week structure; a
    * quiet Sunday is normal, the same count on a Tuesday is an incident.
    * Baseline = mean/std of daily counts per (type, weekday) across the
    * observed weeks (population std — exact 0 only when all counts equal,
    * guarded out on both engines identically); z = (cnt − mean)/std,
    * |z| ≥ 1.5 flags. The corpus collapses to a (type, day) count table in
    * one combinable exchange; baseline join and z-math are calendar-scale.
    * Weekday alignment: Spark dayofweek() is 1..7 Sunday-first, DuckDB's
    * 0..6 — the Spark side subtracts 1 (join-internal only, not output). */
  /** q193's DuckDB mirror — shared with its streaming twin q195 (the
    * q176/q177 `RateSpikeSql` convention): both forms must hash-match the
    * same batch truth. */
  val SeasonalAnomalySql: String =
    """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
      |               count(*) AS cnt
      |           FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, dayofweek(day) AS dow,
      |        CAST(count(*) AS BIGINT) AS n_days,
      |        avg(cnt) AS mean_raw,
      |        stddev_pop(cnt) AS std_cnt
      |      FROM d GROUP BY 1, 2)
      |SELECT d.event_type, CAST(epoch(d.day) AS BIGINT) AS day_sec,
      |  CAST(d.cnt AS BIGINT) AS cnt, b.n_days,
      |  round(b.mean_raw, 4) AS mean_cnt,
      |  round((d.cnt - b.mean_raw) / b.std_cnt, 4) AS z,
      |  CAST(CASE WHEN abs((d.cnt - b.mean_raw) / b.std_cnt) >= 1.5
      |       THEN 1 ELSE 0 END AS INT) AS is_anomaly
      |FROM d JOIN b ON d.event_type = b.event_type
      |            AND dayofweek(d.day) = b.dow
      |WHERE b.std_cnt > 0
      |ORDER BY ALL""".stripMargin

  val q193 = EngineQuery(
    "q193_seasonal_anomaly",
    Some(SeasonalAnomalySql)) { t =>
    // b derives FROM d: rename b's keys so the join resolves against two
    // distinct attribute sets (Spark's derived-self-join ambiguity).
    val d = t.events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("day")) - 1)
    val b = d
      .groupBy(col("event_type").as("b_type"), col("dow").as("b_dow"))
      .agg(count(lit(1)).as("n_days"), avg(col("cnt")).as("mean_raw"),
        stddev_pop(col("cnt")).as("std_cnt"))
    val z = (col("cnt") - col("mean_raw")) / col("std_cnt")
    orderedByAll(d
      .join(b, col("event_type") === col("b_type") && col("dow") === col("b_dow"))
      .filter(col("std_cnt") > 0)
      .select(col("event_type"), epochSec(col("day")).as("day_sec"),
        col("cnt"), col("n_days"), round4(col("mean_raw")).as("mean_cnt"),
        round4(z).as("z"),
        when(abs(z) >= 1.5, 1).otherwise(0).cast("int").as("is_anomaly")))
  }

  val all: Seq[EngineQuery] = Seq(q190, q192, q193)
}
