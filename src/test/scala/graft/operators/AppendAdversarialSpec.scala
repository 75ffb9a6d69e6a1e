package graft.operators

import graft.SharedSparkSpec

/** Adversarial delta batches for the incremental index family. The gated
  * fixtures split the corpus at `id % 8 == 0` and exercise only the
  * happy-path delta shape; here each append path (q181 postings, q183
  * minhash bands, q186 IVF-PQ codes) faces the pathological daily batches a
  * real ingest eventually sees — an EMPTY delta, an all-duplicate-of-base
  * delta, and a single hot shingle shared corpus-wide — and must still
  * answer exactly like the from-scratch build on the same corpus (the
  * append ≡ rebuild invariant, which is the whole correctness contract of
  * incremental maintenance).
  */
class AppendAdversarialSpec extends SharedSparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  /** Write a constructed documents corpus and return its Tables dir. */
  private def docsDir(tag: String, docs: Seq[(Long, String)]): String = {
    val dir = tmpDir(s"append_adv_$tag")
    docs.map { case (id, text) => (id, "en", "src1", text) }
      .toDF("doc_id", "lang", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  /** append ≡ rebuild on both document-index paths, for one corpus. */
  private def assertLossless(dir: String): Unit = {
    assert(rows(TextQueries.q181.run(spark, dir)) ==
      rows(TextQueries.q36.run(spark, dir)))
    assert(rows(SimilarityQueries.q183.run(spark, dir)) ==
      rows(SimilarityQueries.q24.run(spark, dir)))
  }

  test("empty delta: no doc_id % 8 == 0 — append writes nothing, still lossless") {
    // ids 8k+1 only; two base near-dups keep the pair output non-empty.
    val a = words("a", 60)
    val docs = Seq(
      (1L, a.mkString(" ")),
      (9L, (a.take(55) ++ words("x", 5)).mkString(" ")),
      (17L, words("b", 60).mkString(" ")),
      (25L, words("c", 60).mkString(" ")))
    val dir = docsDir("empty", docs)
    assertLossless(dir)
    val st = TextQueries.appendedPostingsStats(new graft.Tables(spark, dir))
    assert(st.deltaPostings == 0L, s"empty delta wrote ${st.deltaPostings} postings")
    assert(st.basePostings > 0L)
  }

  test("all-duplicate delta: every delta doc copies a base doc — cross-generation pairs survive") {
    val a = words("a", 60)
    val b = words("b", 60)
    val docs = Seq(
      (1L, a.mkString(" ")),
      (2L, b.mkString(" ")),
      (3L, words("c", 60).mkString(" ")),
      (8L, a.mkString(" ")),   // delta = exact copy of base 1
      (16L, b.mkString(" ")))  // delta = exact copy of base 2
    val dir = docsDir("dup", docs)
    // The duplicate pairs MUST appear (J = 1.0 across generations).
    val out = TextQueries.q36.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 8L)) && out.contains((2L, 16L)))
    assertLossless(dir)
  }

  test("hot shingle: one 5-gram shared by every doc — hot posting key, still lossless") {
    val hot = words("h", 5)
    val docs = (0 until 24).map { i =>
      // Every doc carries the hot 5-gram plus 55 unique tokens: the hot
      // posting list has every doc, but 1 common shingle over ~52-shingle
      // sets keeps true Jaccard ~0.01 — the join must survive the hot key
      // and still emit only the planted near-dup pair below.
      (i + 1L, (hot ++ words(s"u${i}_", 55)).mkString(" "))
    } :+ (32L, (hot ++ words("u0_", 55)).mkString(" ")) // delta near-dup of doc 1
    val dir = docsDir("hot", docs)
    val out = TextQueries.q36.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 32L)), s"expected only the planted pair, got $out")
    assertLossless(dir)
  }

  test("q186 ivf-pq append: minimal and all-duplicate deltas still equal the one-shot build") {
    val rng = new scala.util.Random(20260814L)
    def vec(): Array[Float] = Array.fill(64)(rng.nextFloat() * 2f - 1f)
    // The trainer seeds its centroids from vec_id 0..7, and 0 ≡ 0 (mod 8)
    // is a DELTA member — so a fully empty delta is unconstructible here;
    // the minimal adversarial batch is the single vector {0}.
    // Seeds 0..7, then ids 8k+1..8k+7 — delta = {0} only.
    val base = (0L to 7L).map((_, vec())) ++
      (8 until 64).map(i => (i / 7 * 8L + i % 7 + 1, vec()))
    val d1 = tmpDir("append_adv_pq_min")
    base.toDF("vec_id", "embedding").withColumn("label", org.apache.spark.sql.functions.lit(1))
      .write.parquet(s"$d1/embeddings.parquet")
    assert(rows(SimilarityQueries.q186.run(spark, d1)) ==
      rows(SimilarityQueries.q146.run(spark, d1)))
    val st1 = SimilarityQueries.appendedCodesStats(new graft.Tables(spark, d1))
    assert(st1.deltaRows == 1L && st1.baseRows == base.length - 1L)
    // Case 2 — all-duplicate delta: each delta vec 8k (k ≥ 1) is a
    // bit-identical copy of base vec 8k+1; delta codes must land in the
    // duplicate's existing bucket dir without touching base files.
    val dups = base.collect { case (id, v) if id % 8 == 1 && id > 1 => (id - 1, v) }
    val d2 = tmpDir("append_adv_pq_dup")
    (base ++ dups).toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit(1))
      .write.parquet(s"$d2/embeddings.parquet")
    assert(rows(SimilarityQueries.q186.run(spark, d2)) ==
      rows(SimilarityQueries.q146.run(spark, d2)))
    val st2 = SimilarityQueries.appendedCodesStats(new graft.Tables(spark, d2))
    assert(st2.deltaRows == dups.length + 1L) // the dups plus seed vec 0
    assert((st2.baseFiles & st2.deltaFiles).isEmpty)
  }
}
