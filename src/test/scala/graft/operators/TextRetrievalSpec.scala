package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q229 (text→embeddings cross-modal retrieval): recall@5 of the trained
  * multi-probe IVF path vs the EXACT brute-force anchor under the SAME
  * text-tower query vectors, determinism, output-shape parity with q37,
  * and the cartesian-free plan (the bounded query set broadcasts; the
  * corpus never shuffles for the candidate join).
  */
class TextRetrievalSpec extends SharedSparkSpec {

  /** Exact top-5 anchor: brute-force cosine of every text query vector
    * against the whole embeddings table — the q25 shape under q229's
    * query vectors (driver-verified ground truth, not a served plan). */
  private def exactTop5(dir: String): Set[(Long, Long)] = {
    val t = new graft.Tables(spark, dir)
    val q = SimilarityQueries.textQueryEmbeddings(t)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val corpus = t.embeddings.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    q.flatMap { case (qid, qv) =>
      corpus.map { case (vid, cv) => (qid, vid, cos(qv, cv)) }
        .sortBy { case (_, vid, c) => (-c, vid) }
        .take(5).map { case (_, vid, _) => (qid, vid) }
    }.toSet
  }

  test("q229: recall@5 vs the exact anchor clears the measured floor") {
    val exact = exactTop5(sf001)
    val served = SimilarityQueries.q229.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (served & exact).size.toDouble / exact.size
    info(f"q229 recall@5 vs brute force (sf0.001): $recall%.2f")
    assert(recall >= 0.7, f"text-retrieval recall@5 $recall%.2f under the floor")
    // Every served hit must be a real corpus neighbor of its query
    // (precision of the ids — cosine is exact on candidates, so any
    // divergence is a bucketing/plumbing bug, not an approximation).
    assert(served.size == exact.size, "served result must be exactly 5 rows per query")
  }

  test("q229: probe-width sweep — recall grows to exhaustive, NProbeText is the knee") {
    for (dir <- Seq(sf001, "/root/testdata/sf0.01")) {
      val t = new graft.Tables(spark, dir)
      val exact = exactTop5(dir)
      val rec = Seq(2, 4, 8).map { np =>
        val served = SimilarityQueries.textRetrievalTop5(t, np)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        np -> (served & exact).size.toDouble / exact.size
      }.toMap
      info(f"$dir recall@5: nprobe2=${rec(2)}%.2f nprobe4=${rec(4)}%.2f nprobe8=${rec(8)}%.2f")
      assert(rec(2) <= rec(4) && rec(4) <= rec(8), "recall must be monotone in probes")
      assert(rec(8) == 1.0, "8 of 8 probes is exhaustive — recall must be exact")
    }
  }

  test("q229: deterministic and shaped like q37") {
    val a = SimilarityQueries.q229.run(spark, sf001).collect().toSeq
    val b = SimilarityQueries.q229.run(spark, sf001).collect().toSeq
    assert(a == b)
    assert(SimilarityQueries.q229.run(spark, sf001).columns.toSeq ==
      Seq("query_id", "neighbor_id", "cos_sim", "rn"))
  }

  test("q229: cartesian-free; the corpus side never shuffles for the candidate join") {
    val df = SimilarityQueries.q229.run(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in the served plan")
    assert(plan.contains("BroadcastHashJoin"), "bounded query set must broadcast")
  }
}
