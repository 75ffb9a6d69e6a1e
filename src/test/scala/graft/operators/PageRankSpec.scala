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

  test("bucketed-probe degrade path: identical ranks, broadcast-free supersteps") {
    val t = new Tables(spark, sf001)
    // The documented past-broadcast-scale plan, forced at gate SF: a
    // one-time src-bucketed edge layout probed by the shuffled id-scale
    // rank table must reproduce the broadcast loop's ranks exactly.
    val broad = GraphQueries.pagerank(t).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = broad.size.toLong
    val deg = GraphQueries.pagerankDegraded(t, n)
    val degM = deg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(degM.keySet == broad.keySet)
    degM.foreach { case (node, r) =>
      assert(math.abs(r - broad(node)) < 1e-9,
        s"node $node: degraded $r vs broadcast ${broad(node)}")
    }
    // Physical shape of one superstep (pre-checkpoint): rank side builds a
    // shuffled-hash join, the edge side streams off its bucketed scan —
    // no broadcast anywhere, no exchange and no sort on src.
    val edges = spark.table(GraphQueries.degradedEdgeTable(t))
    val ranks0 = edges.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0 / n))
    val p = GraphQueries.degradedStep(edges, ranks0, n)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
    assert(p.contains("Bucketed: true"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning(src"), p.take(1500))
    assert(!p.contains("Sort "), p.take(1500))
  }
}
