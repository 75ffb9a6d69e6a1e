package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q191 incremental connected components — constructed merge scenarios the
  * sf-fixture oracle (q60's SQL ≡ full rebuild) can't isolate:
  *  - a delta doc BRIDGING two frozen clusters that were not similar to
  *    each other (the union-find merge case);
  *  - a base singleton first clustered by a delta arrival;
  *  - an untouched frozen cluster passing through unchanged;
  *  - a pure delta-delta cluster.
  * Plus the rebuild-equivalence check on the real fixture.
  */
class CcIncrementalSpec extends SharedSparkSpec {
  import spark.implicits._

  test("bridge, singleton-join, untouched and delta-delta merge cases") {
    val core = (1 to 8).map(i => s"c$i").mkString(" ")
    val textA = core + " a1 a2 a3" // 7 shingles, 4 shared with core
    val textB = core + " b1 b2 b3" // J(A,B) = 4/10 = 0.4 < 0.5: not linked
    val textD = "d1 d2 d3 d4 d5 d6"
    val textE = "e1 e2 e3 e4 e5"
    val textF = "f1 f2 f3 f4 f5 f6 f7"
    val docs = Seq(
      (1L, textA), (2L, textA),   // frozen cluster label 1
      (3L, textB), (4L, textB),   // frozen cluster label 3
      (5L, textE),                // base singleton
      (6L, textD), (7L, textD),   // untouched frozen cluster label 6
      (100L, core),               // bridge: J(core, A) = 4/7 >= 0.5 to BOTH
      (101L, textE),              // joins the base singleton
      (102L, textF), (103L, textF) // delta-delta cluster
    ).toDF("doc_id", "text")
    val out = TextQueries.ccIncremental(docs, col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set(
      (1L, 5L),   // clusters {1,2} and {3,4} bridged by 100
      (5L, 2L),   // singleton 5 + delta 101
      (6L, 2L),   // untouched
      (102L, 2L)  // delta-only cluster
    ))
  }

  test("empty delta batch reproduces the frozen state unchanged") {
    val textD = "d1 d2 d3 d4 d5 d6"
    val docs = Seq((1L, textD), (2L, textD), (3L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val out = TextQueries.ccIncremental(docs, lit(false))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }

  test("sf0.001: incremental merge equals the full q60 rebuild") {
    val inc = graft.SparkEntry.queries("q191_cc_incremental")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.SparkEntry.queries("q60_dedup_components")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
  }
}
