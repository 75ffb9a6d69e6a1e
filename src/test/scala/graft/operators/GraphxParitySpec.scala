package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
import org.apache.spark.sql.functions._

/** Independent-implementation cross-checks for the two graph operators:
  * GraphX (on the classpath, a genuinely different execution path — Pregel
  * aggregateMessages over VertexRDD/EdgeRDD) must agree with the DataFrame
  * formulations on the same extracted graphs.
  *
  * PageRank correspondence: both run the same recursion
  * r' = reset + (1 - reset) * sum(r/deg) for 8 iterations; GraphX starts
  * every vertex at 1.0 where q122 starts at 1/n and teleports (1-D)/n, so
  * GraphX's rank is exactly n x ours at every step (same affine map each
  * iteration) — the spec divides by |V| and compares at the local-reference
  * tolerance.
  */
class GraphxParitySpec extends SharedSparkSpec {

  test("q122 pagerank == GraphX staticPageRank / n on the same graph") {
    val t = new graft.Tables(spark, sf001)
    val edges = GraphQueries.edgePairs(t)
      .collect().map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
    val n = edges.flatMap(e => Seq(e.srcId, e.dstId)).distinct.length
    val g = Graph.fromEdges(spark.sparkContext.parallelize(edges.toSeq), 1.0)
    val gx = org.apache.spark.graphx.lib.PageRank.run(g, numIter = 8, resetProb = 0.15)
      .vertices.collect().toMap
    val ours = GraphQueries.pagerank(t)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == gx.keySet)
    val worst = ours.map { case (node, r) => math.abs(gx(node) / n - r) }.max
    assert(worst < 1e-9, s"worst |graphx/n - ours| = $worst")
  }

  test("q148 per-node triangle counts == GraphX TriangleCount on the same graph") {
    val t = new graft.Tables(spark, sf001)
    // coPurchaseEdges is already canonical (u < v, distinct) — GraphX's
    // TriangleCount precondition.
    val edges = GraphQueries.coPurchaseEdges(t)
      .collect().map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(spark.sparkContext.parallelize(edges.toSeq), 0)
      .partitionBy(PartitionStrategy.RandomVertexCut)
    val gx = org.apache.spark.graphx.lib.TriangleCount.run(g)
      .vertices.collect().filter(_._2 > 0).toMap
    val ours = GraphQueries.q148.run(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(ours == gx.map { case (k, v) => (k: java.lang.Long).toLong -> v })
    assert(ours.nonEmpty)
  }
}
