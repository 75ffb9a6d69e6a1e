package graft.operators

import graft.SharedSparkSpec
import graft.functions.LogRegTrainer

/** q189 distributed logistic regression — parity vs the single-node
  * reference, learnability of the linear quality rule, and GD sanity
  * (monotone non-increasing full-batch loss at the configured rate).
  */
class LogRegTrainSpec extends SharedSparkSpec {

  lazy val t = graft.Tables.forPath(spark, sf001)
  lazy val dist = LogRegTrainer.trained(t)

  test("distributed weights match the local reference within 1e-8") {
    val local = LogRegTrainer.trainLocal(
      t.documents.select("text").collect()
        .map(r => LogRegTrainer.featurize(r.getString(0))).toSeq)
    assert(dist.losses.length === local.losses.length)
    dist.weights.zip(local.weights).foreach { case (d, l) =>
      assert(math.abs(d - l) < 1e-8, s"weight drift: $d vs $l")
    }
    dist.losses.zip(local.losses).foreach { case (d, l) =>
      assert(math.abs(d - l) < 1e-8, s"loss drift: $d vs $l")
    }
    assert(dist.nDocs === local.nDocs)
    assert(dist.nPos === local.nPos)
    assert(math.abs(dist.accuracy - local.accuracy) < 1e-12)
  }

  test("the linear stopword-density rule is learned well above base rate") {
    val baseRate = math.max(
      dist.nPos.toDouble / dist.nDocs, 1.0 - dist.nPos.toDouble / dist.nDocs)
    // The label is linear in the density feature, so the trained model
    // must clearly beat always-predict-majority.
    assert(dist.accuracy > baseRate + 0.1,
      s"accuracy ${dist.accuracy} vs base rate $baseRate")
    assert(dist.accuracy > 0.9)
  }

  test("training descends: final loss well below the w=0 starting loss") {
    // lr sits above the strict smoothness bound (documented), so per-step
    // monotonicity isn't guaranteed — overall descent is.
    assert(dist.losses.last < 0.5 * dist.losses.head,
      s"loss ${dist.losses.head} -> ${dist.losses.last}")
  }

  test("q194 filter pass: retention consistent with driver-side scoring") {
    val out = graft.SparkEntry.queries("q194_classifier_filter")(spark, sf001)
      .collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val kept = out.map(_.getAs[Long]("n_kept")).sum
    assert(total === t.documents.count())
    // Same scoring function, driver-side, must produce the same kept count.
    val localKept = t.documents.select("text").collect().count { r =>
      LogRegTrainer.score(dist.weights, r.getString(0)) >= 0.5 }
    assert(kept === localKept)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      val ret = r.getAs[Double]("retention")
      assert(ret >= 0.0 && ret <= 1.0)
    }
    // The trained filter keeps a non-trivial fraction and drops some: the
    // corpus has both classes and accuracy > 0.9 pins the split realistic.
    assert(kept > 0 && kept < total)
  }

  test("q189 report is well-formed") {
    val rows = graft.SparkEntry.queries("q189_quality_classifier")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("n_docs") > 0)
    assert(rows("iters") === LogRegTrainer.Iters.toDouble)
    assert(rows("loss_final") <= rows("loss_first"))
    assert(rows("accuracy") >= 0.0 && rows("accuracy") <= 1.0)
  }
}
