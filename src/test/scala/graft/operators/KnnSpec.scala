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

  test("q37 IVF: same shape, deterministic, reports recall vs brute force") {
    val ivf = topk(SimilarityQueries.q37.run(spark, sf001))
    val ivf2 = topk(SimilarityQueries.q37.run(spark, sf001))
    assert(ivf.toSeq == ivf2.toSeq)
    assert(ivf.length == 50)
    val brute = topk(SimilarityQueries.q25.run(spark, sf001))
    val recall = ivf.map(r => (r._1, r._2)).toSet
      .intersect(brute.map(r => (r._1, r._2)).toSet).size / 50.0
    info(f"IVF recall@5 vs brute force: $recall%.2f")
  }
}
