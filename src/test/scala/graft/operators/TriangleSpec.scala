package graft.operators

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q148's degree-oriented enumeration vs an independent local reference:
  * the oriented algorithm must find exactly the triangle set a naive
  * id-ordered (a<b<c) enumeration finds, each triangle exactly once.
  */
class TriangleSpec extends SharedSparkSpec {

  test("q148 oriented triangles equal the naive id-ordered enumeration") {
    val t = new Tables(spark, sf001)
    val edges = GraphQueries.coPurchaseEdges(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // local naive enumeration over id order
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naive = for {
      (a, bs) <- adj.toSeq
      b <- bs
      cs <- adj.get(b).toSeq
      c <- cs if adj(a).contains(c)
    } yield (a, b, c)

    val found = GraphQueries.triangles(GraphQueries.coPurchaseEdges(t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly once each: count equality AND set equality up to corner order
    assert(found.length == naive.length)
    assert(found.map { case (x, y, z) => Set(x, y, z) }.toSet ==
      naive.map { case (x, y, z) => Set(x, y, z) }.toSet)
    assert(naive.nonEmpty)
  }

  test("q148 per-node counts sum to 3x the triangle total") {
    val df = GraphQueries.q148.run(spark, sf001)
    val perNode = df.agg(sum(col("tri"))).collect()(0).getLong(0)
    val total = GraphQueries.triangles(GraphQueries.coPurchaseEdges(new Tables(spark, sf001))).count()
    assert(perNode == 3 * total)
    assert(total == 1034) // measured on the sf0.001 co-purchase graph
  }
}
