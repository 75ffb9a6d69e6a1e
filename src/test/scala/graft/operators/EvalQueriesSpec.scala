package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q190/q192/q193 statistical-evaluation queries: the oracle gate proves
  * engine≡DuckDB; these tests pin the STATISTICAL contracts the SQL match
  * alone doesn't — bootstrap interval coverage, calibration-table
  * completeness, anomaly-flag consistency.
  */
class EvalQueriesSpec extends SharedSparkSpec {

  test("q192: bootstrap CI brackets the point estimate and is ordered") {
    val out = graft.SparkEntry.queries("q192_bootstrap_ci")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (mean, lo, hi) =
        (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= hi, s"interval inverted: $r")
      // Poisson-bootstrap p05/p95 of a mean over hundreds of rows must
      // bracket the point estimate — if it doesn't, the replicate weights
      // are correlated (the bug this spec guards: an LCG increment too
      // small to decorrelate replicates shifts every replicate the same
      // way and the interval detaches from the estimate).
      assert(lo <= mean && mean <= hi,
        s"CI [$lo, $hi] must contain point estimate $mean")
    }
  }

  test("q190: calibration buckets partition the corpus and rates are probabilities") {
    val t = graft.Tables.forPath(spark, sf001)
    val out = graft.SparkEntry.queries("q190_calibration")(spark, sf001).collect()
    assert(out.map(_.getAs[Long]("n")).sum === t.embeddings.count())
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b <= 9)
      val ms = r.getAs[Double]("mean_score")
      assert(ms >= b / 10.0 - 1e-9 && ms <= (b + 1) / 10.0 + 1e-9,
        s"mean score $ms outside its own bucket $b")
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("q196: range-partitioned rank-sum AUC equals a driver-side sort") {
    val out = graft.SparkEntry.queries("q196_auc_exact")(spark, sf001).collect()
    assert(out.length === 1)
    val row = out.head
    val t = graft.Tables.forPath(spark, sf001)
    // Independent reference: collect raw vectors, score with the same
    // closed-form weights (identical ascending fold), sort locally and run
    // Mann-Whitney by hand — proves the distributed global-rank machinery
    // itself, not just engine≡DuckDB agreement on the same plan family.
    val data = t.embeddings.collect().map { r =>
      val emb = r.getAs[scala.collection.Seq[Float]]("embedding")
      var dot = 0.0
      var j = 0
      while (j < 64) {
        dot += ((j * 37 % 19) - 9) / 10.0 * emb(j).toDouble
        j += 1
      }
      (1.0 / (1.0 + math.exp(-dot)), r.getAs[Long]("vec_id"),
        r.getAs[Int]("label") < 5)
    }
    val ranked = data.sortBy { case (s, id, _) => (s, id) }.zipWithIndex
    val np = data.count(_._3).toLong
    val nn = data.length - np
    val rp = ranked.collect { case ((_, _, true), i) => i.toLong + 1 }.sum
    val aucLocal = (rp - np * (np + 1) / 2.0) / (np * nn)
    assert(row.getAs[Long]("n") === data.length.toLong)
    assert(row.getAs[Long]("n_pos") === np)
    assert(math.abs(row.getAs[Double]("auc") - aucLocal) < 1e-4,
      s"distributed auc ${row.getAs[Double]("auc")} vs local $aucLocal")
    assert(math.abs(row.getAs[Double]("gini")
      - (2 * row.getAs[Double]("auc") - 1)) < 2e-4)
  }

  test("q200: split-conformal coverage meets the 1-alpha guarantee") {
    val row = graft.SparkEntry.queries("q200_conformal")(spark, sf001).collect().head
    val nCal = row.getAs[Long]("n_cal")
    val nTest = row.getAs[Long]("n_test")
    assert(nCal > 0 && nTest > 0)
    assert(row.getAs[Long]("k") === math.ceil((nCal + 1) * 0.9).toLong)
    val cov = row.getAs[Double]("coverage")
    // Marginal coverage ≥ 1−α holds in expectation over splits; on one
    // finite split allow binomial slack of ~2σ (σ ≈ sqrt(0.09/n_test)).
    val slack = 2 * math.sqrt(0.09 / nTest)
    assert(cov >= 0.9 - slack, s"coverage $cov below guarantee minus slack")
    val sz = row.getAs[Double]("avg_set_size")
    assert(sz >= 0.0 && sz <= 2.0)
    // A set that covers with prob ≥ 0.9 must average ≥ 0.9 labels.
    assert(sz >= cov - 1e-9)
  }

  test("q208: every approx-quantile rank error is within its documented bound") {
    val rows = graft.SparkEntry.queries("q208_quantile_audit")(spark, sf001).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      // percentile_approx's contract: rank error ≤ n/accuracy.
      assert(r.getAs[Long]("rank_err") <= r.getAs[Long]("bound"),
        s"approx quantile broke its accuracy contract: $r")
    }
    // Higher accuracy must not categorically worsen the audit: the
    // tightest knob's worst error stays under the loosest knob's bound.
    val worst10k = rows.filter(_.getAs[Int]("accuracy") == 10000)
      .map(_.getAs[Long]("rank_err")).max
    val bound100 = rows.filter(_.getAs[Int]("accuracy") == 100)
      .map(_.getAs[Long]("bound")).head
    assert(worst10k <= bound100)
  }

  test("q209: minhash estimates sit inside the 64-hash theoretical envelope") {
    val r = graft.SparkEntry.queries("q209_minhash_calibration")(spark, sf001)
      .collect().head
    val n = r.getAs[Long]("n_pairs")
    assert(n > 0)
    // Per-pair σ = √(J(1−J)/64) ≤ 0.0625; the audited pairs have J ≥ 0.5.
    assert(math.abs(r.getAs[Double]("bias")) <= 0.05,
      s"minhash bias out of envelope: $r")
    assert(r.getAs[Double]("mae") <= 0.1, s"minhash MAE out of envelope: $r")
    assert(r.getAs[Double]("max_abs_err") <= 0.35,
      s"minhash worst-case error out of envelope: $r")
    assert(r.getAs[Double]("mean_jac") >= 0.5)
  }

  test("q210: IVF recall audit is internally consistent and clears the trained floor") {
    val rows = graft.SparkEntry.queries("q210_ann_recall_audit")(spark, sf001)
      .collect()
    val overall = rows.filter(_.getLong(0) == -1L)
    assert(overall.length === 1)
    val per = rows.filterNot(_.getLong(0) == -1L)
    assert(per.length === 10)
    per.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    assert(overall.head.getAs[Long]("n_exact") ===
      per.map(_.getAs[Long]("n_exact")).sum)
    // The trained multi-probe floor KnnSpec pins on the same fixture.
    assert(overall.head.getAs[Double]("recall") >= 0.6,
      s"IVF recall collapsed: ${overall.head}")
  }

  test("q193: anomaly flag agrees with the reported z at the 1.5 threshold") {
    val out = graft.SparkEntry.queries("q193_seasonal_anomaly")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val z = r.getAs[Double]("z")
      val flag = r.getAs[Int]("is_anomaly")
      // round4(z) vs the unrounded flag threshold can only disagree inside
      // a 1e-4 band around 1.5 — assert agreement outside it.
      if (math.abs(math.abs(z) - 1.5) > 1e-3)
        assert(flag === (if (math.abs(z) >= 1.5) 1 else 0), s"flag mismatch: $r")
    }
  }
}
