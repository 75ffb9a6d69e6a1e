package graft.operators

import graft.{SharedSparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** q157 and q172's lexical arm must rank by ONE scorer. In the source they
  * already share `bm25Joined`/`bm25Score` verbatim (and their oracles share
  * the Bm25SqlCtes/Bm25SqlScore strings); this spec pins that sharing
  * against a future drifting copy by asserting the user-visible
  * consequences: q157's published scores are exactly the shared scorer's
  * (rounded at the edge), and every lexical rank q172 emits points at the
  * same doc q157 ranks there.
  */
class Bm25SharedSpec extends SharedSparkSpec {

  test("q157's output scores == the shared bm25Score, bit-for-bit pre-round") {
    val t = new graft.Tables(spark, sf001)
    val direct = TextQueries.bm25Joined(t)
      .select(col("doc_id"), round(TextQueries.bm25Score, 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val q157 = SparkEntry.queries("q157_bm25")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(q157.toSeq == direct.toSeq)
    assert(q157.nonEmpty)
  }

  test("every lex_rank in q172 points at the doc q157 ranks in that position") {
    val q157Docs = SparkEntry.queries("q157_bm25")(spark, sf001)
      .collect().map(_.getLong(0))
    val fused = SparkEntry.queries("q172_hybrid_fusion")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val lexRanked = fused.filter { case (_, r) => r >= 1 && r <= q157Docs.length }
    assert(lexRanked.nonEmpty, "no overlap between fused output and q157's top-15")
    lexRanked.foreach { case (doc, r) =>
      assert(q157Docs(r - 1) == doc,
        s"q172 says lex rank $r is doc $doc; q157 ranks doc ${q157Docs(r - 1)} there")
    }
  }
}
