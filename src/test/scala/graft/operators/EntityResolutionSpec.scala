package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q188 sorted-neighborhood entity resolution — the two properties that
  * justify SNM over naive within-block pairing:
  *  1. candidate volume is LINEAR: every record emits at most ErWindow
  *     candidate pairs, regardless of block size;
  *  2. a duplicate run LONGER than the window still links transitively
  *     (row i pairs with i+1), so component recovery loses nothing.
  */
class EntityResolutionSpec extends SharedSparkSpec {
  import spark.implicits._

  test("duplicate run longer than the window forms one connected chain") {
    // 20 records sharing one name in one block — 5× the window width.
    val recs = (1L to 20L).map(k => (k, "acme anvil", "anvil"))
      .toDF("key", "name", "block")
    val out = AdvancedQueries.erMatches(recs, AdvancedQueries.ErWindow)
      .collect().map(r => (r.getLong(1), r.getLong(2)))

    // Union-find over the emitted pairs: all 20 keys must land in ONE
    // component even though no single pair spans more than 4 positions.
    val parent = scala.collection.mutable.Map((1L to 20L).map(k => k -> k): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    out.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((1L to 20L).map(find).distinct.size === 1)
    // All pairs are dist 0 (identical names).
    assert(AdvancedQueries.erMatches(recs, AdvancedQueries.ErWindow)
      .filter(col("dist") =!= 0).count() === 0)
  }

  test("candidate volume is bounded by n x window (linear, not quadratic)") {
    // One hot block of 100 records with distinct names: naive blocking
    // would form 100·99/2 = 4950 pairs; SNM emits at most 100×4.
    val recs = (1L to 100L).map(k => (k, f"name$k%03d widget", "widget"))
      .toDF("key", "name", "block")
    // Count pairs BEFORE the distance filter by using an always-true
    // threshold: max levenshtein here is small, so count the full output
    // of a window-only variant — bound the emitted pair count directly.
    val n = AdvancedQueries.erMatches(recs, AdvancedQueries.ErWindow).count()
    assert(n <= 100L * AdvancedQueries.ErWindow)
  }

  test("sf0.001: matches at dist 0 are exactly the same-name adjacent pairs") {
    val t = graft.Tables.forPath(spark, sf001)
    val out = graft.SparkEntry.queries("q188_entity_resolution")(spark, sf001)
    val d0 = out.filter(col("dist") === 0).count()
    assert(d0 > 0, "fixture has duplicate part names; dist-0 matches expected")
    // Every dist-0 pair references two keys with the SAME p_name.
    val names = t.part.select(col("p_partkey"), col("p_name"))
    val joined = out.filter(col("dist") === 0)
      .join(names.withColumnRenamed("p_partkey", "key_a")
        .withColumnRenamed("p_name", "na"), Seq("key_a"))
      .join(names.withColumnRenamed("p_partkey", "key_b")
        .withColumnRenamed("p_name", "nb"), Seq("key_b"))
    assert(joined.filter(col("na") =!= col("nb")).count() === 0)
  }
}
