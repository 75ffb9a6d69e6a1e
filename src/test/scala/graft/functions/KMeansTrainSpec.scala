package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** k-means-to-convergence has no SQL oracle (an iterative fixpoint loop);
  * correctness is pinned by PARITY: the distributed trainer must match an
  * independent single-node reference — same iteration count, same final
  * assignments, centroids equal up to summation-order ulp — on the real
  * embeddings fixture. (q92, the oracled single Lloyd's step, anchors the
  * per-step arithmetic against DuckDB.) */
class KMeansTrainSpec extends SharedSparkSpec {

  private def collectVecs(t: Tables): Seq[(Long, Array[Double])] =
    t.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq

  test("distributed trainer matches the single-node reference on sf0.001") {
    val t = new Tables(spark, sf001)
    val vecs = collectVecs(t)
    val k = KMeansTrainer.K
    val ref = KMeansTrainer.trainLocal(vecs, k, KMeansTrainer.MaxIters, KMeansTrainer.Tol)
    val dist = KMeansTrainer.trainedModel(t)
    assert(dist.iters == ref.iters,
      s"iteration count diverged: dist=${dist.iters} ref=${ref.iters}")
    assert(dist.iters >= 2 && dist.iters <= KMeansTrainer.MaxIters,
      s"degenerate convergence (${dist.iters} iters) — fixture or tol wrong?")
    assert(dist.nMembers == ref.nMembers, "per-cluster membership counts diverged")
    (0 until k).foreach { c =>
      val maxDiff = dist.centroids(c).zip(ref.centroids(c))
        .map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff < 1e-8,
        f"centroid $c diverged beyond summation ulp: max|Δ|=$maxDiff%.3e")
      assert(math.abs(dist.sumD2(c) - ref.sumD2(c)) < 1e-6)
    }
    // Final assignments under the two centroid sets agree vector by vector.
    val refAsg = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(c => (KMeansTrainer.d2(v, ref.centroids(c)), c))
    }.toMap
    val distAsg = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(c => (KMeansTrainer.d2(v, dist.centroids(c)), c))
    }.toMap
    assert(distAsg == refAsg, "final assignments diverged")
  }

  test("training converges: monotone non-increasing total distortion") {
    val t = new Tables(spark, sf001)
    val vecs = collectVecs(t)
    // Re-run the reference loop capturing per-iteration distortion.
    var cents = vecs.sortBy(_._1).take(KMeansTrainer.K).map(_._2).toIndexedSeq
    val distortions = Seq.newBuilder[Double]
    (0 until KMeansTrainer.MaxIters).foreach { _ =>
      val asg = vecs.map { case (_, v) =>
        val c = (0 until KMeansTrainer.K).minBy(c => (KMeansTrainer.d2(v, cents(c)), c))
        (c, v, KMeansTrainer.d2(v, cents(c)))
      }
      distortions += asg.map(_._3).sum
      cents = (0 until KMeansTrainer.K).map { c =>
        val m = asg.filter(_._1 == c)
        if (m.isEmpty) cents(c)
        else {
          val s = new Array[Double](m.head._2.length)
          m.foreach { case (_, v, _) => v.indices.foreach(i => s(i) += v(i)) }
          s.indices.foreach(i => s(i) /= m.size); s
        }
      }
    }
    val ds = distortions.result()
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"Lloyd's iterations must not increase distortion: $ds")
  }

  test("q108 emits the converged model's profile") {
    val rows = graft.SparkEntry.queries("q108_kmeans_train")(spark, sf001).collect()
    assert(rows.length == KMeansTrainer.K)
    val t = new Tables(spark, sf001)
    val ref = KMeansTrainer.trainLocal(
      collectVecs(t), KMeansTrainer.K, KMeansTrainer.MaxIters, KMeansTrainer.Tol)
    rows.foreach { r =>
      val c = r.getInt(0)
      assert(r.getLong(1) == ref.nMembers(c))
      assert(r.getInt(2) == ref.iters)
      val refMean = BigDecimal(ref.sumD2(c) / ref.nMembers(c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - refMean) <= 1e-4 + 1e-9,
        s"cid=$c mean_d2 ${r.getDouble(3)} vs ref $refMean")
      val refNorm = BigDecimal(math.sqrt(ref.centroids(c).map(x => x * x).sum))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - refNorm) <= 1e-4 + 1e-9)
    }
    // All clusters populated on this fixture (k=8 over 500 vectors).
    assert(rows.forall(_.getLong(1) > 0L))
  }
}
