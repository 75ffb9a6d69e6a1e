package graft.plans

import graft.SharedSparkSpec
import graft.operators.{SimilarityQueries, SinkQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Record-count pins on every persisted layout artifact. The round-8 driver
  * bench saw the layout builds' COLD cost bounce 2-4× with untouched code
  * (q137/q145/q151/q140); these bounds make the next deviation attributable
  * in one look: if the artifact row counts still match the closed forms
  * below, a cold-time swing is environment (page cache, IO contention), not
  * a build that silently started writing more data. Paired with the PLANS.md
  * round-9 cold-cost budget table (min-of-3 on a quiet box).
  */
class LayoutBuildBoundsSpec extends SharedSparkSpec {

  private def t = new graft.Tables(spark, sf001)

  test("q144 postings table: exactly the corpus's distinct (doc, shingle-hash) rows") {
    val tbl = TextQueries.postingsTable(t)
    val expected = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(graft.dsl.shingles(col("tk"), 5)).as("sh"))
      .count()
    assert(spark.table(tbl).count() == expected)
  }

  test("q181 appended postings: base + delta generations == one full build") {
    val st = TextQueries.appendedPostingsStats(t)
    val full = spark.table(TextQueries.postingsTable(t)).count()
    assert(st.basePostings + st.deltaPostings == full,
      s"${st.basePostings} + ${st.deltaPostings} != $full")
  }

  test("q145 band index: exactly eligible-docs x Bands rows, 3 lean columns") {
    val idx = spark.table(SimilarityQueries.minhashBandTable(t))
    val eligible = t.documents
      .filter(size(split(col("text"), " ")) >= 5).count()
    assert(idx.count() == eligible * SimilarityQueries.Bands)
    assert(idx.columns.toSeq == Seq("band", "bh", "doc_id"))
  }

  test("q146 ivfpq code partitions: exactly one code row per vector") {
    val dir = SimilarityQueries.ivfpqCodesDir(t)
    assert(spark.read.parquet(dir).count() == t.embeddings.count())
  }

  test("q137 bloom layout: exactly the lineitem rows, small-file row groups") {
    val dir = SinkQueries.bloomDir(t)
    assert(spark.read.parquet(dir).count() == t.lineitem.count())
  }

  test("q114 z-ordered layout: exactly the lineitem rows") {
    val dir = SinkQueries.zorderedDir(t)
    assert(spark.read.parquet(dir).count() == t.lineitem.count())
  }
}
