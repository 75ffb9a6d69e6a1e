package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q121's Misra-Gries guarantees, checked against exact token counts:
  * every estimate is a lower bound within n/(cap+1) of the truth, every
  * sufficiently-heavy token survives, and the summary is deterministic. */
class MisraGriesSpec extends SharedSparkSpec {

  private val cap = SketchQueries.MgCap

  test("aggregator unit guarantees on a skewed local stream") {
    val agg = new SketchAggregators.MisraGriesAgg(8)
    // 3 heavy items + a long tail of singletons, interleaved
    val stream = (0 until 600).flatMap { i =>
      Seq("alpha", "tail" + i) ++
        (if (i % 2 == 0) Seq("beta") else Nil) ++
        (if (i % 3 == 0) Seq("gamma") else Nil)
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    // split into 4 chunks, reduce each, merge pairwise in both orders
    val chunks = stream.grouped(math.ceil(n / 4.0).toInt).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = chunks.reduce(agg.merge)
    val bound = n.toDouble / (8 + 1)
    merged.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k: est $est above exact ${exact(k)}")
      assert(exact(k) - est <= bound, s"$k: error ${exact(k) - est} > $bound")
    }
    // every item heavier than n/(cap+1) must survive
    exact.filter(_._2 > bound).keys.foreach { k =>
      assert(merged.contains(k), s"heavy item $k evicted")
    }
  }

  test("q121 corpus summary: bounds vs exact counts, heavy survival, determinism") {
    val t = new Tables(spark, sf001)
    val summary = SketchQueries.mgSummary(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.nonEmpty)
    val n = summary.head._3
    val exact = t.documents.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == exact.values.sum, "n_total must be the exact stream length")
    val bound = n.toDouble / (cap + 1)
    summary.foreach { case (term, est, _) =>
      assert(est <= exact(term), s"$term: est $est exceeds exact ${exact(term)}")
      assert(exact(term) - est <= bound,
        s"$term: undercount ${exact(term) - est} breaks the n/(cap+1)=$bound bound")
    }
    exact.filter(_._2 > bound).keys.foreach { term =>
      assert(summary.exists(_._1 == term), s"heavy term $term missing from summary")
    }
    // deterministic: same summary on a rerun (fixed scan partitioning +
    // single-buffer-per-pid aggregation)
    val again = SketchQueries.mgSummary(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // and the query's reported interval contains the truth
    val q = SketchQueries.q121.run(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(q.length <= 10)
    q.foreach { case (term, est, hi) =>
      assert(est <= exact(term) && exact(term) <= hi,
        s"$term: exact ${exact(term)} outside [$est, $hi]")
    }
  }
}
