package graft.operators

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.functions._

/** Relational core of the engine (SURVEY.md §2 Part B, q01–q08, q10–q13,
  * q16–q17).
  *
  * q01/q02 are the faithful superset of the reference's entire operator
  * surface — multi-file parquet scan + projection (reference
  * src/parquetreader/reader.py:90-97, columns= pushdown at reader.py:92) and
  * the filter pushdown hole its `get_rows_with_args` leaves open but never
  * surfaces (reader.py:47-49; SURVEY.md §3.3). Everything else is the
  * declared engine extension.
  *
  * Scale notes (100 TB north star):
  *  - filters/projections sit directly on the scan → Catalyst pushes them
  *    into the parquet reader (PushedFilters/ReadSchema; zero custom code);
  *  - dimension tables (region/nation/part/supplier) are broadcast
  *    explicitly, so the big-fact joins never shuffle the small side;
  *  - fact⋈fact joins (lineitem⋈orders) shuffle on the join key once and
  *    AQE (on by default in Spark 4) re-plans skew at runtime;
  *  - aggregations are partial (map-side combine) before the single shuffle.
  */
object RelationalQueries {

  /** Monotonic suffix for q12's per-invocation temp-view names. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  val q01 = EngineQuery(
    "q01_scan_project",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
           |FROM lineitem ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
  }

  val q02 = EngineQuery(
    "q02_filter",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
           |FROM lineitem
           |WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
           |  AND l_returnflag IN ('A','R') AND l_shipdate IS NOT NULL
           |ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem
        .filter(col("l_discount").between(0.02, 0.06)
          && col("l_quantity") < 24
          && col("l_returnflag").isin("A", "R")
          && col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"))
  }

  val q03 = EngineQuery(
    "q03_join_broadcast",
    Some("""SELECT l_orderkey, l_linenumber, p_name, l_extendedprice, p_retailprice
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_name", "l_extendedprice", "p_retailprice"))
  }

  val q04 = EngineQuery(
    "q04_join_multiway",
    Some("""SELECT r_name, n_name,
           |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           |       CAST(count(*) AS BIGINT) AS n_items
           |FROM lineitem
           |JOIN orders   ON l_orderkey  = o_orderkey
           |JOIN customer ON o_custkey   = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          round4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items")))
  }

  val q05 = EngineQuery(
    "q05_join_outer",
    Some("""SELECT c_custkey, c_name,
           |       CAST(count(o_orderkey) AS BIGINT) AS order_cnt,
           |       round(coalesce(sum(o_totalprice), 0), 4) AS total_spend
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey, c_name ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("order_cnt"),
          round4(coalesce(sum(col("o_totalprice")), lit(0.0))).as("total_spend")))
  }

  val q06 = EngineQuery(
    "q06_join_semi",
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
           |ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"))
  }

  val q07 = EngineQuery(
    "q07_join_anti",
    Some("""SELECT c_custkey, c_mktsegment FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
           |ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.customer
        .join(t.orders.filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment"))
  }

  val q08 = EngineQuery(
    "q08_join_theta",
    Some("""SELECT 'equi_range' AS side, o_orderpriority AS grp,
           |       CAST(count(*) AS BIGINT) AS cnt
           |FROM orders JOIN lineitem
           |  ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
           |GROUP BY o_orderpriority
           |UNION ALL
           |SELECT 'theta_only', 'all', CAST(count(*) AS BIGINT)
           |FROM part, supplier WHERE p_retailprice > s_acctbal
           |ORDER BY ALL""".stripMargin)) { t =>
    // Equi + range: SMJ/SHJ on the equi key with the range residual.
    val equiRange = t.orders
      .join(t.lineitem,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("equi_range").as("side"), col("grp"), col("cnt"))
    // Pure theta over two small tables → broadcast nested-loop join.
    val thetaOnly = t.part
      .join(broadcast(t.supplier), col("p_retailprice") > col("s_acctbal"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("theta_only").as("side"), lit("all").as("grp"), col("cnt"))
    orderedByAll(equiRange.unionByName(thetaOnly))
  }

  /** TPC-H Q1 body, shared with q30_write_roundtrip and SparkEntry.entry. */
  def q10Body(t: graft.Tables): org.apache.spark.sql.DataFrame =
    orderedByAll(
      t.lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round4(sum(col("l_quantity"))).as("sum_qty"),
          round4(sum(col("l_extendedprice"))).as("sum_base"),
          round4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc"),
          round4(avg(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("cnt")))

  val q10Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(sum(l_extendedprice), 4) AS sum_base,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY ALL""".stripMargin

  val q10 = EngineQuery("q10_agg_groupby", Some(q10Sql))(q10Body)

  val q11 = EngineQuery(
    "q11_agg_distinct",
    Some("""SELECT l_returnflag,
           |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supp_cnt,
           |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS part_cnt,
           |       CAST(count(*) AS BIGINT) AS cnt
           |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("supp_cnt"),
          countDistinct(col("l_partkey")).as("part_cnt"),
          count(lit(1)).as("cnt")))
  }

  val q12 = EngineQuery(
    "q12_rollup",
    Some("""SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
           |       round(sum(c_acctbal), 4) AS acct_sum,
           |       CAST(GROUPING(r_name, n_name) AS INT) AS gid
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP(r_name, n_name) ORDER BY ALL""".stripMargin)) { t =>
    // DataFrame-side rollup(...).agg(grouping_id()) trips Spark's
    // ambiguous-self-join detector on the Expand's duplicated grouping
    // attributes (SPARK analyzer quirk), so this one goes through the SQL
    // front end — same Catalyst plan, same Expand+partial-agg execution.
    // View names are unique per invocation (concurrent q12 runs on one
    // session must not clobber each other) and dropped once the plan is
    // analyzed — spark.sql resolves views eagerly, so the returned
    // DataFrame no longer needs them.
    val id = RelationalQueries.viewSeq.incrementAndGet()
    val (vc, vn, vr) = (s"g_customer_$id", s"g_nation_$id", s"g_region_$id")
    t.customer.createOrReplaceTempView(vc)
    t.nation.createOrReplaceTempView(vn)
    t.region.createOrReplaceTempView(vr)
    try {
      orderedByAll(
        t.spark.sql(
          s"""SELECT coalesce(r_name, 'ALL') AS r_name,
             |       coalesce(n_name, 'ALL') AS n_name,
             |       round(sum(c_acctbal), 4) AS acct_sum,
             |       CAST(grouping_id() AS INT) AS gid
             |FROM $vc
             |JOIN $vn ON c_nationkey = n_nationkey
             |JOIN $vr ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)""".stripMargin))
    } finally Seq(vc, vn, vr).foreach(t.spark.catalog.dropTempView)
  }

  val q13 = EngineQuery(
    "q13_agg_having",
    Some("""SELECT c_mktsegment, round(avg(c_acctbal), 4) AS avg_bal,
           |       CAST(count(*) AS BIGINT) AS cnt
           |FROM customer GROUP BY c_mktsegment
           |HAVING round(avg(c_acctbal), 4) > 4400 ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.customer
        .groupBy("c_mktsegment")
        .agg(round4(avg(col("c_acctbal"))).as("avg_bal"), count(lit(1)).as("cnt"))
        .filter(col("avg_bal") > 4400))
  }

  val q16 = EngineQuery(
    "q16_topk",
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
           |FROM lineitem
           |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
           |LIMIT 25""".stripMargin)) { t =>
    // orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k,
    // then a k-row merge on the driver — no global sort at any scale.
    t.lineitem
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      .limit(25)
  }

  val q17 = EngineQuery(
    "q17_setops",
    Some("""WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
           |     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
           |SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
           |UNION ALL
           |SELECT 'intersect', k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
           |UNION ALL
           |SELECT 'except', k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
           |ORDER BY ALL""".stripMargin)) { t =>
    val a = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val b = t.orders.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("k")).distinct()
    val u = a.union(b).distinct().select(lit("union").as("op"), col("k"))
    val i = a.intersect(b).select(lit("intersect").as("op"), col("k"))
    val e = a.except(b).select(lit("except").as("op"), col("k"))
    orderedByAll(u.unionByName(i).unionByName(e))
  }

  /** Full outer join with unmatched rows on BOTH sides: high-balance
    * customers vs big-order customers. Output is null-free (coalesced key +
    * membership flags) per the determinism rules. */
  val q48 = EngineQuery(
    "q48_join_full_outer",
    Some("""WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
           |     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 450000)
           |SELECT coalesce(a.k, b.k) AS k,
           |       CAST(CASE WHEN a.k IS NULL THEN 0 ELSE 1 END AS INT) AS in_rich,
           |       CAST(CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS INT) AS in_big
           |FROM a FULL OUTER JOIN b ON a.k = b.k ORDER BY ALL""".stripMargin)) { t =>
    val a = t.customer.filter(col("c_acctbal") > 9000).select(col("c_custkey").as("ak"))
    val b = t.orders.filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("bk")).distinct()
    orderedByAll(
      a.join(b, col("ak") === col("bk"), "full_outer")
        .select(
          coalesce(col("ak"), col("bk")).as("k"),
          when(col("ak").isNull, 0).otherwise(1).as("in_rich"),
          when(col("bk").isNull, 0).otherwise(1).as("in_big")))
  }

  /** CUBE over (lang, source): all four grouping sets in one pass via the
    * same Expand + partial-aggregate execution as q12's ROLLUP. Single-table
    * cube, so the DataFrame API is safe here (q12's analyzer quirk needs a
    * join); `grouping_id` disambiguates the NULL-vs-'ALL' collapse exactly
    * like the rollup. Shuffle volume is bounded by Σ|grouping-set groups|,
    * not by 4× the input — the Expand happens before the partial agg. */
  val q53 = EngineQuery(
    "q53_cube",
    Some("""SELECT coalesce(lang, 'ALL') AS lang,
           |       coalesce(source, 'ALL') AS source,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           |       CAST(grouping_id(lang, source) AS INT) AS gid
           |FROM documents
           |GROUP BY CUBE(lang, source) ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.documents
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
          grouping_id().cast("int").as("gid"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("chars_sum"), col("gid")))
  }

  /** Pivot via conditional aggregation — `count(when(...))` ≡ SQL
    * `count(*) FILTER (...)`, one scan and one shuffle regardless of the
    * number of pivot columns (Spark's `.pivot()` resolves to the same
    * conditional-agg plan once the pivot values are known; spelling them
    * out keeps the column set static, which the fixed-schema oracle compare
    * needs anyway). */
  val q54 = EngineQuery(
    "q54_pivot",
    Some("""SELECT source,
           |       CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
           |       CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
           |       CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS n_es,
           |       CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS n_fr,
           |       CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS n_zh,
           |       CAST(sum(n_chars) FILTER (lang = 'en') AS BIGINT) AS chars_en
           |FROM documents GROUP BY source ORDER BY ALL""".stripMargin)) { t =>
    def cnt(l: String) = count(when(col("lang") === l, 1)).as(s"n_$l")
    orderedByAll(
      t.documents.groupBy("source").agg(
        cnt("en"), cnt("de"), cnt("es"), cnt("fr"), cnt("zh"),
        sum(when(col("lang") === "en", col("n_chars"))).as("chars_en")))
  }

  /** Statistical aggregates per group — corr / sample covariance / sample
    * stddev, all single-pass mergeable moments (partial aggregation
    * map-side, like any sum): the shuffle carries O(|groups|) moment
    * tuples, never rows. */
  val q56 = EngineQuery(
    "q56_stats_agg",
    Some("""SELECT l_returnflag,
           |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           |       round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
           |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
           |       round(avg(l_extendedprice), 4) AS avg_price
           |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem.groupBy("l_returnflag").agg(
        round4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
        round4(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qty_disc"),
        round4(stddev_samp(col("l_extendedprice"))).as("sd_price"),
        round4(avg(col("l_extendedprice"))).as("avg_price")))
  }

  /** UNPIVOT (wide → long): Dataset.unpivot lowers to one Expand — a
    * map-only row expansion, no shuffle beyond the upstream aggregate. */
  val q63 = EngineQuery(
    "q63_unpivot",
    Some("""WITH wide AS (
           |  SELECT source,
           |         CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
           |         CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
           |         CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS n_es
           |  FROM documents GROUP BY source)
           |SELECT source, lang, n FROM wide
           |UNPIVOT (n FOR lang IN (n_en, n_de, n_es))
           |ORDER BY ALL""".stripMargin)) { t =>
    def cnt(l: String) = count(when(col("lang") === l, 1)).as(s"n_$l")
    val wide = t.documents.groupBy("source").agg(cnt("en"), cnt("de"), cnt("es"))
    orderedByAll(
      wide.unpivot(
        ids = Array(col("source")),
        values = Array(col("n_en"), col("n_de"), col("n_es")),
        variableColumnName = "lang",
        valueColumnName = "n"))
  }

  /** Correlated scalar subquery — deviation of each order from its priority
    * class mean. Catalyst de-correlates this into an aggregate + join (one
    * shuffle on the correlation key), the same plan the window formulation
    * gets — the subquery is planner surface, not a per-row probe. SQL front
    * end with per-invocation view names (same pattern as q12). */
  val q64 = EngineQuery(
    "q64_scalar_subquery",
    Some("""SELECT o_orderkey,
           |       round(o_totalprice - (SELECT avg(o2.o_totalprice) FROM orders o2
           |                             WHERE o2.o_orderpriority = o.o_orderpriority), 4) AS dev
           |FROM orders o ORDER BY ALL""".stripMargin)) { t =>
    val v = s"g_orders_${RelationalQueries.viewSeq.incrementAndGet()}"
    t.orders.createOrReplaceTempView(v)
    try {
      orderedByAll(
        t.spark.sql(
          s"""SELECT o_orderkey,
             |       round(o_totalprice - (SELECT avg(o2.o_totalprice) FROM $v o2
             |                             WHERE o2.o_orderpriority = o.o_orderpriority), 4) AS dev
             |FROM $v o""".stripMargin))
    } finally t.spark.catalog.dropTempView(v)
  }

  /** Pure range join (no equi key) via graft.plans.RangeJoin: suppliers
    * whose balance falls in each part's ±1000 price window. Spark plans the
    * raw BETWEEN join as a broadcast nested-loop (O(|L|·|R|), broadcast
    * ceiling); the binned formulation is an equi-join on fixed-width value
    * bins — one shuffle per side at any scale — with the exact predicate
    * as residual filter. Same rows, same oracle.
    */
  val q65 = EngineQuery(
    "q65_range_join",
    Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n
           |FROM part p JOIN supplier s
           |  ON s.s_acctbal >= p.p_retailprice - 1000
           | AND s.s_acctbal <= p.p_retailprice + 1000
           |GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val joined = graft.plans.RangeJoin.binned(
      t.supplier.select(col("s_suppkey"), col("s_acctbal")),
      col("s_acctbal"),
      t.part.select(col("p_brand"), col("p_retailprice")),
      col("p_retailprice") - 1000, col("p_retailprice") + 1000,
      binWidth = 1000.0)
    orderedByAll(joined.groupBy("p_brand").agg(count(lit(1)).as("n")))
  }

  /** Referential-integrity audit — the data-quality gate a pipeline runs
    * before trusting a snapshot: orphan counts for each foreign-key edge
    * (child rows whose parent key is missing), as one unioned report. Each
    * check is an anti-join; parent key sets broadcast when small, and the
    * child tables stream map-side — the whole audit reads each table once
    * and shuffles nothing child-sized. */
  val q98 = EngineQuery(
    "q98_integrity_audit",
    Some("""SELECT 'customer->nation' AS fk, CAST(count(*) AS BIGINT) AS total,
           |       CAST(count(*) FILTER (WHERE c_nationkey NOT IN
           |            (SELECT n_nationkey FROM nation)) AS BIGINT) AS orphans
           |FROM customer
           |UNION ALL
           |SELECT 'lineitem->orders', CAST(count(*) AS BIGINT),
           |       CAST(count(*) FILTER (WHERE l_orderkey NOT IN
           |            (SELECT o_orderkey FROM orders)) AS BIGINT)
           |FROM lineitem
           |UNION ALL
           |SELECT 'orders->customer', CAST(count(*) AS BIGINT),
           |       CAST(count(*) FILTER (WHERE o_custkey NOT IN
           |            (SELECT c_custkey FROM customer)) AS BIGINT)
           |FROM orders
           |UNION ALL
           |SELECT 'supplier->nation', CAST(count(*) AS BIGINT),
           |       CAST(count(*) FILTER (WHERE s_nationkey NOT IN
           |            (SELECT n_nationkey FROM nation)) AS BIGINT)
           |FROM supplier
           |ORDER BY ALL""".stripMargin)) { t =>
    def audit(name: String, child: org.apache.spark.sql.DataFrame, childKey: String,
        parent: org.apache.spark.sql.DataFrame, parentKey: String) = {
      val orphans = child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      child.agg(count(lit(1)).as("total")).crossJoin(orphans)
        .select(lit(name).as("fk"), col("total"), col("orphans"))
    }
    orderedByAll(
      audit("customer->nation", t.customer, "c_nationkey", t.nation, "n_nationkey")
        .unionByName(audit("lineitem->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"))
        .unionByName(audit("orders->customer", t.orders, "o_custkey", t.customer, "c_custkey"))
        .unionByName(audit("supplier->nation", t.supplier, "s_nationkey", t.nation, "n_nationkey")))
  }

  /** One-pass dataset profiler (ANALYZE TABLE / data-catalog shape): per
    * numeric column of the fact table — row count, null count, exact
    * distinct count, min/max/mean — emitted one row per column. All six
    * statistics for all three columns ride ONE aggregation (Spark expands
    * the multi-distinct into one Expand + partial-agg pass — a single scan
    * of the 100 TB table, not one per column, which is the difference
    * between a profiler you run nightly and one you don't), then the wide
    * 1-row result is unpivoted to rows with a literal-array explode
    * (map-only; no second pass, no union of per-column scans). Distinct
    * counts are exact to stay oracle-checkable; the 100 TB knob is swapping
    * countDistinct for approx_count_distinct (q41's HLL), which removes the
    * Expand and makes the whole profile one partial-aggregable pass. */
  val q126 = EngineQuery(
    "q126_profile",
    Some("""SELECT 'l_discount' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(*) - count(l_discount) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT l_discount) AS BIGINT) AS n_distinct,
           |       round(min(l_discount), 4) AS min_v, round(max(l_discount), 4) AS max_v,
           |       round(avg(l_discount), 4) AS mean_v
           |FROM lineitem
           |UNION ALL
           |SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
           |       CAST(count(*) - count(l_extendedprice) AS BIGINT),
           |       CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           |       round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
           |       round(avg(l_extendedprice), 4)
           |FROM lineitem
           |UNION ALL
           |SELECT 'l_quantity', CAST(count(*) AS BIGINT),
           |       CAST(count(*) - count(l_quantity) AS BIGINT),
           |       CAST(count(DISTINCT l_quantity) AS BIGINT),
           |       round(min(l_quantity), 4), round(max(l_quantity), 4),
           |       round(avg(l_quantity), 4)
           |FROM lineitem
           |ORDER BY ALL""".stripMargin)) { t =>
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
    // Round 18: THREE exact NDVs in one agg forced Spark's multi-distinct
    // Expand — every input row multiplied ×4 (one replica per distinct
    // column + one for the plain aggregates) through the first hash
    // aggregate, with null-padded grouping keys. Splitting each NDV into
    // its own single-distinct aggregation keeps every pass Expand-free
    // (a single distinct plans as a two-level group-by — partial distinct
    // before the exchange), prunes each NDV scan to ONE column, and the
    // four 1-row subtrees are independent, so the scheduler overlaps
    // their stages inside the one job (the 1-row joins are broadcast
    // nest-loops, not exchanges). Values are identical — same exact
    // aggregates over the same rows — and the oracle SQL is unchanged;
    // the hash gate pins it.
    val stats = t.lineitem.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"cnt_$c"),
          round(min(col(c)), 4).as(s"min_$c"),
          round(max(col(c)), 4).as(s"max_$c"),
          round(avg(col(c)), 4).as(s"mean_$c"))
      }: _*)
    val wide = cols.foldLeft(stats) { (acc, c) =>
      acc.crossJoin(
        t.lineitem.select(col(c)).agg(countDistinct(col(c)).as(s"ndv_$c")))
    }
    val rows = explode(array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"ndv_$c").as("n_distinct"),
        col(s"min_$c").as("min_v"),
        col(s"max_$c").as("max_v"),
        col(s"mean_$c").as("mean_v"))
    }: _*))
    orderedByAll(wide.select(rows.as("r")).select(col("r.*")))
  }

  /** q126's 100 TB knob as a first-class query: the SAME profile with
    * approx_count_distinct (HLL++, rsd 0.02) in place of the exact
    * multi-distinct. The payoff is in the plan: q126's exact NDVs force an
    * Expand (3 distinct columns → 4 rows per input row through the
    * aggregation); the sketch is an ordinary partial-aggregable function,
    * so q138 is ONE pass with NO row multiplication — at 100 TB the Expand
    * is the profiler's whole cost, and exact NDV is the wrong default.
    * Approximate → no SQL oracle; ApproxProfileSpec bounds every sketched
    * NDV against q126's exact value at the advertised rsd (q41's pattern)
    * and asserts exact columns stay EQUAL, and PlanInvariantsSpec proves
    * the Expand is gone. */
  val q138 = EngineQuery("q138_profile_approx", None) { t =>
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
    val wide = t.lineitem.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"cnt_$c"),
          approx_count_distinct(col(c), 0.02).as(s"ndv_$c"),
          round(min(col(c)), 4).as(s"min_$c"),
          round(max(col(c)), 4).as(s"max_$c"),
          round(avg(col(c)), 4).as(s"mean_$c"))
      }: _*)
    val rows = explode(array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"ndv_$c").as("n_distinct"),
        col(s"min_$c").as("min_v"),
        col(s"max_$c").as("max_v"),
        col(s"mean_$c").as("mean_v"))
    }: _*))
    orderedByAll(wide.select(rows.as("r")).select(col("r.*")))
  }

  /** Linear-regression aggregates per group — the OLS surface past q56's
    * corr/covar: slope, intercept, R², point count of y = l_extendedprice
    * on x = l_quantity per return flag. Like every second-moment aggregate,
    * regr_* partials are (n, Σx, Σy, Σx², Σxy) tuples merged map-side, so
    * the shuffle carries O(|groups|) moment rows, never data — the per-group
    * model-fit plan shape that holds unchanged at 100 TB. Slope/intercept
    * are O(10²–10⁴) ratios of the moment sums, far from q117's
    * round-of-big-sum trap (noise ~1e-8 vs the 5e-5 grain). */
  val q142 = EngineQuery(
    "q142_regr_funcs",
    Some("""SELECT l_returnflag,
           |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pts,
           |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           |       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
           |       round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x
           |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.lineitem.groupBy("l_returnflag").agg(
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pts"),
        round4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        round4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("intercept"),
        round4(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"),
        round4(regr_avgx(col("l_extendedprice"), col("l_quantity"))).as("avg_x")))
  }

  /** Order-invariant table content checksum — "is this copy of the table
    * byte-identical to that one" answered WITHOUT moving, sorting, or
    * co-locating either side: each row folds to a 32-bit digest piece
    * (md5 over a canonical '|'-joined rendering; text columns pre-hashed so
    * the piece is fixed-width work), and the table's checksum is the SUM of
    * pieces — commutative, so the aggregation is map-side-combinable and
    * the exchange carries one partial per task regardless of table size.
    * q98 audits referential integrity BETWEEN tables; this audits the bytes
    * of each table itself (replication / migration / snapshot equality — at
    * 100 TB the only affordable equality check is a streaming checksum).
    * 32-bit pieces keep the BIGINT sum exact to ~2^31 rows; beyond that the
    * same plan runs with a DECIMAL(38,0) accumulator. Only int/string
    * columns participate — float rendering is not canonical across engines
    * (SURVEY.md §7.4.2). */
  val q155 = EngineQuery(
    "q155_table_checksum",
    Some("""WITH d AS (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
           |              lang || '|' || source || '|' || CAST(n_chars AS VARCHAR) || '|' ||
           |              md5(text)), 1, 8) AS BIGINT) AS piece FROM documents),
           |c AS (SELECT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|' ||
           |              c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' ||
           |              c_mktsegment), 1, 8) AS BIGINT) AS piece FROM customer),
           |o AS (SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
           |              CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
           |              o_orderpriority), 1, 8) AS BIGINT) AS piece FROM orders)
           |SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum(piece) AS BIGINT) AS checksum FROM c
           |UNION ALL
           |SELECT 'documents', CAST(count(*) AS BIGINT), CAST(sum(piece) AS BIGINT) FROM d
           |UNION ALL
           |SELECT 'orders', CAST(count(*) AS BIGINT), CAST(sum(piece) AS BIGINT) FROM o
           |ORDER BY ALL""".stripMargin)) { t =>
    def piece(cols: org.apache.spark.sql.Column*) =
      conv(substring(md5(concat_ws("|", cols: _*).cast("binary")), 1, 8), 16, 10)
        .cast("long")
    def check(name: String, df: org.apache.spark.sql.DataFrame,
        cols: org.apache.spark.sql.Column*) =
      df.select(piece(cols: _*).as("piece"))
        .agg(count(lit(1)).as("n_rows"), sum(col("piece")).as("checksum"))
        .select(lit(name).as("tbl"), col("n_rows"), col("checksum"))
    orderedByAll(
      check("documents", t.documents, col("doc_id").cast("string"), col("lang"),
          col("source"), col("n_chars").cast("string"),
          md5(col("text").cast("binary")))
        .unionByName(check("customer", t.customer, col("c_custkey").cast("string"),
          col("c_name"), col("c_nationkey").cast("string"), col("c_mktsegment")))
        .unionByName(check("orders", t.orders, col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"), col("o_orderstatus"),
          col("o_orderpriority"))))
  }

  /** Declarative data-quality constraint suite (the Deequ recipe,
    * Schelter et al. VLDB'18): completeness, uniqueness, numeric range,
    * value-domain, format-regex and freshness checks over `orders`,
    * ALL evaluated in ONE aggregation pass — each constraint is a
    * map-side-combinable conditional count, so auditing six constraints
    * costs the same scan as auditing one, and the report is
    * constraint-scale (6 rows) at any corpus size. The single exact
    * `count(DISTINCT)` for uniqueness rides the same Expand the q126
    * profiler uses; at 100 TB the q138 discipline applies (swap in
    * `approx_count_distinct` and gate on the estimate). Violations are
    * COUNTS, never ratios (SURVEY §7.4.2); `passed` is the 0/1 gate a
    * pipeline branches on. */
  val q158 = EngineQuery(
    "q158_constraint_audit",
    Some("""WITH m AS (SELECT count(*) AS n_rows,
           |  count(*) FILTER (WHERE o_custkey IS NULL) AS v_complete,
           |  count(*) - count(DISTINCT o_orderkey) AS v_unique,
           |  count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0
           |                      OR o_totalprice > 400000) AS v_range,
           |  count(*) FILTER (WHERE o_orderstatus IS NULL
           |                      OR o_orderstatus NOT IN ('O','F','P')) AS v_domain,
           |  count(*) FILTER (WHERE o_orderpriority IS NULL
           |                      OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS v_format,
           |  count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1995-01-01') AS v_fresh
           |  FROM orders),
           |u AS (
           |  SELECT 'complete_custkey' AS check_name, v_complete AS violations FROM m
           |  UNION ALL SELECT 'unique_orderkey', v_unique FROM m
           |  UNION ALL SELECT 'range_totalprice', v_range FROM m
           |  UNION ALL SELECT 'domain_orderstatus', v_domain FROM m
           |  UNION ALL SELECT 'format_orderpriority', v_format FROM m
           |  UNION ALL SELECT 'fresh_orderdate', v_fresh FROM m)
           |SELECT check_name, CAST(violations AS BIGINT) AS violations,
           |       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
           |FROM u ORDER BY ALL""".stripMargin)) { t =>
    def v(cond: org.apache.spark.sql.Column) =
      sum(when(cond, 1L).otherwise(0L))
    val m = t.orders.agg(
      v(col("o_custkey").isNull).as("v_complete"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
      v(col("o_totalprice").isNull || col("o_totalprice") <= 0 ||
        col("o_totalprice") > 400000).as("v_range"),
      v(col("o_orderstatus").isNull ||
        !col("o_orderstatus").isin("O", "F", "P")).as("v_domain"),
      v(col("o_orderpriority").isNull ||
        !col("o_orderpriority").rlike("^[1-5]-")).as("v_format"),
      v(col("o_orderdate") < lit("1995-01-01").cast("timestamp")).as("v_fresh"))
    val checks = Seq(
      "complete_custkey" -> "v_complete", "unique_orderkey" -> "v_unique",
      "range_totalprice" -> "v_range", "domain_orderstatus" -> "v_domain",
      "format_orderpriority" -> "v_format", "fresh_orderdate" -> "v_fresh")
    orderedByAll(
      m.select(explode(array(checks.map { case (name, c) =>
          struct(lit(name).as("check_name"), col(c).as("violations"))
        }: _*)).as("r"))
        .select(col("r.check_name").as("check_name"),
          col("r.violations").as("violations"),
          when(col("r.violations") === 0, 1L).otherwise(0L).as("passed")))
  }

  /** Benford first-significant-digit audit — the forensic data-quality
    * screen for "does this numeric column look organically generated or
    * fabricated/truncated": observed first-digit frequencies of
    * o_totalprice vs Benford's law p(d) = log10(1 + 1/d), with the Pearson
    * χ² contribution per digit. (TPC-H-style uniform prices should FAIL
    * Benford loudly — the audit's job is to report the divergence, and a
    * high χ² here is the fixture behaving honestly.)
    *
    * The digit extraction dodges cross-engine libm risk: first digit via
    * floor(x/10^floor(log10 x)) puts a log10 ulp on a branch boundary, so
    * instead both engines take the first character of the EXACT integer
    * cents string (round(x·100) as bigint → varchar) — leading digit is
    * invariant under ×100 and int→string is exact everywhere. Scale shape:
    * map-side digit extraction, one 9-key map-combined aggregate, spine
    * join for empty digits — one scan at any corpus size. */
  val q171 = EngineQuery(
    "q171_benford_audit",
    Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           |           FROM orders),
           |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
           |f AS (SELECT CAST(r.range + 1 AS INT) AS digit, CAST(coalesce(n, 0) AS BIGINT) AS n
           |      FROM range(9) r LEFT JOIN c ON r.range + 1 = c.digit),
           |tot AS (SELECT sum(n) AS nt FROM f)
           |SELECT digit, n,
           |       round(n / CAST(nt AS DOUBLE), 4) AS obs_p,
           |       round(log10(1.0 + 1.0 / digit), 4) AS exp_p,
           |       round(pow(n - nt * log10(1.0 + 1.0 / digit), 2)
           |             / (nt * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
           |FROM f CROSS JOIN tot ORDER BY ALL""".stripMargin)) { t =>
    val d = t.orders.select(
      substring(round(col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val c = d.groupBy("digit").agg(count(lit(1)).as("n0"))
    val spine = t.spark.range(9).select((col("id") + 1).cast("int").as("digit"))
    val f = spine.join(c, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n0"), lit(0L)).as("n"))
    val tot = f.agg(sum(col("n")).as("nt"))
    val expP = log10(lit(1.0) + lit(1.0) / col("digit"))
    orderedByAll(
      f.crossJoin(broadcast(tot)).select(col("digit"), col("n"),
        round4(col("n") / col("nt").cast("double")).as("obs_p"),
        round4(expP).as("exp_p"),
        round4(pow(col("n") - col("nt") * expP, 2) / (col("nt") * expP))
          .as("chi2_term")))
  }

  val all: Seq[EngineQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q10, q11, q12, q13, q16, q17,
      q48, q53, q54, q56, q63, q64, q65, q98, q126, q138, q142, q155, q158,
      q171)
}
