package graft.operators

import graft.SharedSparkSpec

/** Brute-force kNN (q25) vs IVF-bucketed kNN (q37): shape, determinism,
  * and that IVF returns genuine same-bucket neighbors ranked consistently.
  * (Recall vs brute force is reported, not asserted — random uniform
  * vectors have near-flat similarity, so bucket recall is inherently low;
  * the operator contract is shape + determinism + per-bucket exactness.)
  */
class KnnSpec extends SharedSparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("q25 brute-force: 10 queries × top-5, ranks 1..5, sims descending") {
    val rows = topk(SimilarityQueries.q25.run(spark, sf001))
    assert(rows.length == 50)
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val sims = g.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q49 hyperplane-LSH near-dup: exact precision, recall vs brute force") {
    import org.apache.spark.sql.functions._
    val lsh = SimilarityQueries.q49.run(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Brute-force truth: every unblocked pair with round4(cos) >= 0.4.
    val t = new graft.Tables(spark, sf001)
    val e = t.embeddings.select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    val brute = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(graft.functions.CosineSimilarity(col("ea"), col("eb")), 4))
      .filter(col("cos_sim") >= 0.4)
      .select("vec_a", "vec_b", "cos_sim")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Precision is exact by construction (candidates are verified with the
    // same cosine + rounding as the truth set).
    assert(lsh.keySet.subsetOf(brute.keySet))
    lsh.foreach { case (k, v) => assert(brute(k) == v) }
    assert(brute.nonEmpty, "fixture has no cos>=0.4 pairs; recall undefined")
    val recall = lsh.size.toDouble / brute.size
    info(f"hyperplane-LSH recall vs brute force (cos>=0.4, n=${brute.size}): $recall%.2f")
    // 8 bands x 4 bits gives P[collide | cos=0.4] ~ 0.75, higher above it.
    assert(recall >= 0.5)
    // Determinism: seeded planes, same result on a second run.
    val again = SimilarityQueries.q49.run(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(again == lsh)
  }

  test("q37 IVF: same shape, deterministic, trained recall beats the seeded floor") {
    val ivf = topk(SimilarityQueries.q37.run(spark, sf001))
    val ivf2 = topk(SimilarityQueries.q37.run(spark, sf001))
    assert(ivf.toSeq == ivf2.toSeq)
    assert(ivf.length == 50)
    val brute = topk(SimilarityQueries.q25.run(spark, sf001))
    val recall = ivf.map(r => (r._1, r._2)).toSet
      .intersect(brute.map(r => (r._1, r._2)).toSet).size / 50.0
    info(f"IVF recall@5 vs brute force: $recall%.2f")
    // The pre-training formulation (every-50th seeded centroids, single
    // probe) measured 0.24 on this fixture; trained k-means buckets +
    // 2-probe measure 0.80. Assert a floor well above the old ceiling so a
    // regression to untrained buckets fails loudly, with headroom for a
    // reseeded fixture.
    assert(recall >= 0.6,
      f"trained multi-probe IVF recall regressed to $recall%.2f (untrained floor was 0.24)")
  }
}
