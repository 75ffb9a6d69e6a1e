package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q151 (prefix-filtering set-similarity join): the AllPairs/PPJoin prefix
  * must be LOSSLESS — same answer as q36's full inverted-index self-join —
  * while provably shrinking the candidate join's input per the
  * (n − ⌈t·n⌉ + 1) bound.
  */
class SetSimPrefixSpec extends SharedSparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def index(dir: String) = {
    val t = new graft.Tables(spark, dir)
    t.documents
      .select(col("doc_id"), graft.dsl.toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(graft.dsl.shingles(col("tk"), 5)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("s"))
  }

  test("q151 equals q36 row-for-row (prefix filtering is lossless)") {
    val full = pairs(TextQueries.q36.run(spark, sf001))
    val pref = pairs(TextQueries.q151.run(spark, sf001))
    assert(pref == full)
    assert(pref.nonEmpty)
  }

  test("per-doc prefix size is exactly n - ceil(t*n) + 1, never more") {
    val inv = index(sf001)
    val pre = TextQueries.prefixPostings(inv)
    val bad = pre.groupBy("doc_id", "n")
      .agg(count(lit(1)).as("emitted"))
      .filter(col("emitted") =!= col("n") - ceil(col("n") * 0.5) + 1)
      .count()
    assert(bad == 0L)
  }

  test("prefix index is materially smaller than the full index (t=0.5 halves it)") {
    val inv = index(sf001)
    val full = inv.count()
    val pre = TextQueries.prefixPostings(inv).count()
    assert(pre <= full / 2 + inv.select("doc_id").distinct().count(),
      s"prefix $pre vs full $full")
  }

  test("candidate-join cost collapses superlinearly on a skewed corpus") {
    // the cost argument: the self-join's output is Σ over keys of
    // (postings choose 2), dominated by hot stop-phrase shingles — exactly
    // the ones the frequency-ascending prefix drops first. On a corpus of
    // 50 docs sharing 5 hot shingles (df=50) plus 5 unique each, the full
    // join probes 5·C(50,2) pairs; every doc's prefix keeps its 5 unique
    // shingles and at most ONE hot one, so at least 4/5 of the hot cost
    // vanishes while postings only halve (sf0.001 has no such skew — its
    // near-uniform df=1..2 keys shrink pairs merely proportionally)
    def joinPairs(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("s").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2)).as[Double].head().toLong
    val inv = (for { d <- 0L until 50L; k <- 0 until 10 } yield
      if (k < 5) (d, 1000L + k) else (d, 10000L + d * 10 + k))
      .toDF("doc_id", "s")
    val full = joinPairs(inv)
    val pre = joinPairs(TextQueries.prefixPostings(inv).select("doc_id", "s"))
    assert(full == 5 * 1225L, s"full $full")
    assert(pre * 4 <= full, s"prefix pairs $pre vs full $full")
  }

  test("candidates are complete: every qualifying pair is generated (pigeonhole)") {
    // independent of the verification tail: the candidate set alone must
    // contain every pair the full join finds above the threshold
    val cand = TextQueries.prefixCandidates(
      TextQueries.prefixPostings(index(sf001)))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val truth = pairs(TextQueries.q36.run(spark, sf001))
      .map(p => (p._1, p._2)).toSet
    assert(truth.subsetOf(cand), s"missing: ${truth -- cand}")
  }
}
