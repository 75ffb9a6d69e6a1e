package graft.operators

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q122's distributed power iteration vs a single-node reference over the
  * same edge set: per-node rank parity within summation-order tolerance,
  * exact mass conservation, and a sane query shape. */
class PageRankSpec extends SharedSparkSpec {

  test("q122 pagerank matches a local reference and conserves rank mass") {
    val t = new Tables(spark, sf001)
    // the same undirected bipartite edge set, locally
    val pairs = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = adj.size
    val d = 0.85
    var ranks = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 8) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
      adj.foreach { case (u, outs) =>
        val share = ranks(u) / outs.length
        outs.foreach(v => contrib(v) = contrib.getOrElse(v, 0.0) + share)
      }
      ranks = adj.keys.map(v => v -> ((1 - d) / n + d * contrib(v))).toMap
    }

    val dist = GraphQueries.pagerank(t).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dist.keySet == ranks.keySet)
    dist.foreach { case (node, r) =>
      assert(math.abs(r - ranks(node)) < 1e-9,
        s"node $node: distributed $r vs local ${ranks(node)}")
    }
    // undirected construction -> no dangling mass: sum stays exactly 1
    assert(math.abs(dist.values.sum - 1.0) < 1e-9)

    val out = GraphQueries.q122.run(spark, sf001).collect()
    assert(out.length == 10)
    val types = out.map(_.getString(0)).toSet
    assert(types.subsetOf(Set("customer", "supplier")))
    // top-10 by rank matches the local reference's top-10
    val localTop = ranks.toSeq.sortBy { case (node, r) => (-r, node) }.take(10)
      .map(_._1).toSet
    val distTop = out.map(r =>
      r.getLong(1) * 2 + (if (r.getString(0) == "supplier") 1 else 0)).toSet
    assert(distTop == localTop)
  }
}
