package graft.functions

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.functions._

/** Scalar-function breadth: string/date/math (q18), JSON (q19), and
  * array/higher-order functions (q20) — SURVEY.md §2 Part B.
  *
  * All of these are `org.apache.spark.sql.functions` built-ins, so they stay
  * inside whole-stage codegen; no UDFs on the hot path (the deliberate UDF
  * exercise lives in q27/q28 only).
  */
object ScalarFuncQueries {

  val q18 = EngineQuery(
    "q18_scalar_funcs",
    Some("""SELECT o_orderkey,
           |  upper(substring(o_orderpriority, 1, 1)) AS prio1,
           |  concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           |  CAST(length(o_orderpriority) AS INT) AS prio_len,
           |  CAST(year(o_orderdate) AS INT) AS y,
           |  CAST(month(o_orderdate) AS INT) AS m,
           |  CAST(day(o_orderdate) AS INT) AS d,
           |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INT) AS days_to,
           |  round(o_totalprice * 0.9, 4) AS disc_price,
           |  round(abs(o_totalprice - 250000.0), 4) AS dev,
           |  CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS bucket
           |FROM orders ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.orders.select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("prio1"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
        length(col("o_orderpriority")).as("prio_len"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate").cast("date")).as("days_to"),
        // 4dp, not 2: o_totalprice has 2-decimal values, so ×0.9 lands
        // exactly on .xx5 — Spark (shortest-repr HALF_UP) and DuckDB
        // (binary multiply-round) disagree on that boundary; at 4dp the
        // product's decimal expansion terminates and no rounding occurs.
        round(col("o_totalprice") * 0.9, 4).as("disc_price"),
        round4(abs(col("o_totalprice") - 250000.0)).as("dev"),
        when(col("o_totalprice") > 250000, "big").otherwise("small").as("bucket")))
  }

  val q19 = EngineQuery(
    "q19_json",
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           |       CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 4) AS avg_k
           |FROM (SELECT event_type,
           |             CAST(json_extract_string(props, '$.k') AS INT) AS k
           |      FROM events) t
           |GROUP BY event_type ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.events
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
          round4(avg(col("k"))).as("avg_k")))
  }

  /** q19 through Spark 4's VARIANT type — the modern semi-structured path:
    * `parse_json` decodes the JSON string ONCE into the binary variant
    * encoding, every field access is then an O(path) binary probe
    * (`variant_get`), not a re-parse of the text (q19's
    * get_json_object re-tokenizes the string per extraction — fine for one
    * field, quadratic in fields-extracted at 100 TB). Same oracle
    * semantics via DuckDB's JSON extraction, so the variant
    * encode→probe→aggregate path is value-checked end to end. */
  val q131 = EngineQuery(
    "q131_variant",
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           |       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           |       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
           |       CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS ndv_k
           |FROM events GROUP BY event_type ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.events
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), countDistinct(col("k")).as("ndv_k")))
  }

  /** Higher-order array functions over the embeddings table. The L2 norm is
    * a left-fold in double precision with the exact accumulation order of the
    * oracle's list_reduce(list_prepend(0.0, ...)) — bit-identical doubles on
    * both engines, so round(.,4) can never straddle a boundary differently.
    */
  val q20 = EngineQuery(
    "q20_array_funcs",
    Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
           |  round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |        list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           |        (a, b) -> a + b)), 4) AS l2_norm,
           |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_val
           |FROM embeddings ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.embeddings.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round4(l2norm(col("embedding"))).as("l2_norm"),
        round4(element_at(col("embedding"), 1).cast("double")).as("first_val")))
  }

  /** Timestamp/calendar function surface over event time — date_trunc
    * bucketing, day-of-week, hour-of-day — the time-dimension rollup every
    * event pipeline starts with. Day-of-week alignment: Spark `dayofweek`
    * is 1-based Sunday-start, DuckDB's is 0-based Sunday-start — the
    * explicit `-1` makes both engines emit the same 0..6 codes. Both
    * sessions run UTC, and events.ts is microsecond-lowered identically
    * (see Tables), so truncation boundaries agree exactly. */
  val q95 = EngineQuery(
    "q95_datetime_funcs",
    Some("""SELECT epoch_us(date_trunc('day', ts))//1000000 AS day_start,
           |       CAST(dayofweek(ts) AS INT) AS dow,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           |       CAST(count(DISTINCT hour(ts)) AS BIGINT) AS active_hours,
           |       CAST(min(hour(ts)) AS INT) AS first_hour,
           |       CAST(max(hour(ts)) AS INT) AS last_hour
           |FROM events GROUP BY 1, 2 ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.events
        .groupBy(
          epochSec(date_trunc("day", col("ts"))).as("day_start"),
          (dayofweek(col("ts")) - 1).as("dow"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("users"),
          countDistinct(hour(col("ts"))).as("active_hours"),
          min(hour(col("ts"))).as("first_hour"),
          max(hour(col("ts"))).as("last_hour")))
  }

  /** MapType column surface — the one complex type q19 (JSON) and q20
    * (arrays) don't touch: per market segment, an order-status→count map is
    * BUILT (map_from_entries over collected structs), TRANSFORMED
    * (transform_values doubles the counts), FILTERED (map_filter keeps
    * entries ≥ 10), and EXPLODED back to rows — the full life cycle of a
    * map column. The oracle never needs a map: the same result derives
    * relationally (group → scale → HAVING), so the check proves Spark's
    * map machinery preserves exactly the relational content. */
  val q101 = EngineQuery(
    "q101_map_funcs",
    Some("""SELECT c_mktsegment, o_orderstatus,
           |       CAST(2 * count(*) AS BIGINT) AS doubled
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment, o_orderstatus
           |HAVING 2 * count(*) >= 10
           |ORDER BY ALL""".stripMargin)) { t =>
    val counts = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
    val mapped = counts
      .groupBy("c_mktsegment")
      .agg(map_from_entries(
        collect_list(struct(col("o_orderstatus"), col("cnt")))).as("m"))
      .withColumn("m", transform_values(col("m"), (_, v) => v * 2))
      .withColumn("m", map_filter(col("m"), (_, v) => v >= 10))
    orderedByAll(
      mapped
        .select(col("c_mktsegment"), explode(col("m")).as(Seq("o_orderstatus", "doubled"))))
  }

  val all: Seq[EngineQuery] = Seq(q18, q19, q20, q95, q101, q131)
}
