package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q199 MMR rerank — the no-oracle contract:
  *  1. hand-computed diversification: MMR must skip a redundant
  *     higher-relevance candidate for a diverse lower-relevance one;
  *  2. the distributed flatMapGroups rerank equals a driver-side run of
  *     the SAME selection over the collected pool;
  *  3. diversity property on the fixture: the MMR set is no more
  *     self-similar than plain top-k.
  */
class MmrSpec extends SharedSparkSpec {

  test("MMR prefers a diverse candidate over a redundant near-duplicate") {
    // A and B nearly identical (cos ≈ 0.995), C orthogonal.
    val a = Array(1.0, 0.0)
    val b = Array(0.995, math.sqrt(1 - 0.995 * 0.995))
    val c = Array(0.0, 1.0)
    val cands = Array((1L, 0.90, a), (2L, 0.89, b), (3L, 0.50, c))
    val picks = SimilarityQueries.mmrSelect(cands, 2, 0.7).map(_._1)
    // Pick 1: A (highest rel). Pick 2: B scores 0.7·0.89 − 0.3·0.995 ≈ 0.324,
    // C scores 0.7·0.5 − 0 = 0.35 → C despite lower relevance.
    assert(picks === Seq(1L, 3L))
    // Plain top-k would have taken the near-duplicate instead.
    assert(cands.sortBy(-_._2).take(2).map(_._1).toSeq === Seq(1L, 2L))
  }

  test("distributed rerank equals a driver-side run of the same selection") {
    val t = graft.Tables.forPath(spark, sf001)
    val out = graft.SparkEntry.queries("q199_mmr_rerank")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val pool = SimilarityQueries.mmrPool(t).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getAs[scala.collection.Seq[Float]](3).map(_.toDouble).toArray)
    }
    val local = pool.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val cands = rows.map { case (_, id, rel, emb) => (id, rel, emb) }
        .toArray.sortBy(cd => (-cd._2, cd._1))
      SimilarityQueries.mmrSelect(cands, SimilarityQueries.MmrK,
        SimilarityQueries.MmrLambda)
        .zipWithIndex.map { case ((id, _, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(out === local)
    assert(out.size === 10 * SimilarityQueries.MmrK)
  }

  test("fixture diversity: MMR sets are no more self-similar than top-k") {
    val t = graft.Tables.forPath(spark, sf001)
    val pool = SimilarityQueries.mmrPool(t).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getAs[scala.collection.Seq[Float]](3).map(_.toDouble).toArray)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def avgPairSim(embs: Seq[Array[Double]]): Double = {
      val ps = for (i <- embs.indices; j <- embs.indices if i < j)
        yield cos(embs(i), embs(j))
      ps.sum / ps.length
    }
    val perQuery = pool.groupBy(_._1)
    val (mmrSim, topSim) = perQuery.toSeq.map { case (_, rows) =>
      val cands = rows.map { case (_, id, rel, emb) => (id, rel, emb) }
        .toArray.sortBy(cd => (-cd._2, cd._1))
      val byId = cands.map(cd => cd._1 -> cd._3).toMap
      val mmr = SimilarityQueries.mmrSelect(cands, SimilarityQueries.MmrK,
        SimilarityQueries.MmrLambda).map(p => byId(p._1))
      val top = cands.take(SimilarityQueries.MmrK).map(_._3).toSeq
      (avgPairSim(mmr), avgPairSim(top))
    }.unzip
    assert(mmrSim.sum / mmrSim.length <= topSim.sum / topSim.length + 1e-9,
      "MMR must not increase average intra-set similarity")
  }
}
