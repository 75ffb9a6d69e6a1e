package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Two-level grouped trainer (the k ∝ N foundation named in PLANS round
  * 14): the distributed lockstep loop must match the single-node lockstep
  * reference — same seeds (per-cell k2 smallest ids), same iteration
  * count, centroids within 1e-8, IDENTICAL fine assignments — and the
  * model must be structurally sound (fine ids consistent with the
  * two-step argmin; short sub-models where a cell has fewer than k2
  * members; empty sub-cells keep their centroid). This is the
  * KMeansTrainSpec discipline one level down. */
class KMeansTrain2Spec extends SharedSparkSpec {
  import spark.implicits._

  private def collectVecs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
      .sortBy(_._1).toSeq

  test("distributed grouped lockstep == local reference on real embeddings") {
    val t = new Tables(spark, sf001)
    val vecs = collectVecs(t.embeddings)
    val (k1, k2) = (4, 3)
    val dist = KMeansTrainer.trainTwoLevel(t.embeddings, k1, k2, 10, 1e-4)
    val local = KMeansTrainer.trainTwoLevelLocal(vecs, k1, k2, 10, 1e-4)

    assert(dist.iters == local.iters, "lockstep iteration counts must agree")
    assert(dist.sub.map(_.centroids.length) == local.sub.map(_.centroids.length))
    for (c <- 0 until k1; j <- dist.sub(c).centroids.indices;
         i <- dist.sub(c).centroids(j).indices) {
      val d = math.abs(dist.sub(c).centroids(j)(i) - local.sub(c).centroids(j)(i))
      assert(d <= 1e-8, s"sub-centroid ($c,$j)[$i] drifted by $d")
    }
    assert(dist.sub.map(_.nMembers) == local.sub.map(_.nMembers),
      "per-sub-cell memberships must be identical")
    // The serving contract: identical fine assignments for every vector.
    for ((_, v) <- vecs) {
      assert(KMeansTrainer.assignLocal2(v, dist) == KMeansTrainer.assignLocal2(v, local))
    }
  }

  test("structure: two-step argmin, fixed stride, short sub-models") {
    val t = new Tables(spark, sf001)
    val vecs = collectVecs(t.embeddings)
    val m = KMeansTrainer.trainTwoLevelLocal(vecs, 5, 4, 8, 1e-4)
    for ((_, v) <- vecs.take(100)) {
      val f = KMeansTrainer.assignLocal2(v, m)
      val c1 = KMeansTrainer.assignLocal(v, m.l1)
      assert(f / m.k2 == c1, "fine id must encode the L1 cell at stride k2")
      assert(f % m.k2 < m.sub(c1).centroids.length,
        "fine id must point at a real sub-centroid")
      assert(m.fineCentroid(f).length == v.length)
    }
    // A tiny corpus where one cell cannot fill k2: sub-model is short, the
    // assignment still resolves.
    val tiny = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.1, 0.0)),
      (3L, Array(10.0, 10.0)))
    val mt = KMeansTrainer.trainTwoLevelLocal(tiny, 2, 2, 5, 1e-6)
    assert(mt.sub.exists(_.centroids.length < 2),
      "a 1-member cell must train a short sub-model")
    for ((_, v) <- tiny) {
      val f = KMeansTrainer.assignLocal2(v, mt)
      assert(f % mt.k2 < mt.sub(f / mt.k2).centroids.length)
    }
  }

  test("grouped training refines the flat model's within-cell structure") {
    // Sanity on the reason the model exists: fine cells are strictly more
    // numerous than L1 cells and every non-empty L1 cell's members spread
    // over its sub-cells (total fine distortion <= L1 distortion).
    val t = new Tables(spark, sf001)
    val vecs = collectVecs(t.embeddings)
    val m = KMeansTrainer.trainTwoLevelLocal(vecs, 4, 3, 10, 1e-4)
    val l1D2 = vecs.map { case (_, v) =>
      KMeansTrainer.d2(v, m.l1.centroids(KMeansTrainer.assignLocal(v, m.l1))) }.sum
    val fineD2 = vecs.map { case (_, v) =>
      KMeansTrainer.d2(v, m.fineCentroid(KMeansTrainer.assignLocal2(v, m))) }.sum
    assert(fineD2 <= l1D2,
      s"two-level quantization must not be coarser: fine=$fineD2 l1=$l1D2")
  }
}
