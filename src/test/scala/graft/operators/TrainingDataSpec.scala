package graft.operators

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Structural properties of the chunk/pack/rebalance operators that the
  * oracle hash can't see on its own: chunk windows must tile every token,
  * pack bins must respect the token budget, rebalance rates must be valid
  * probabilities that never inflate a source. */
class TrainingDataSpec extends SharedSparkSpec {

  private lazy val t = Tables.forPath(spark, sf001)

  test("q83: chunks tile each document exactly (stride 48, window 64)") {
    val chunks = TrainingDataQueries.q83.run(spark, sf001)
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum(col("chunk_len")).as("covered"),
        max(col("chunk_idx")).as("max_idx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val docs = t.documents
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(perDoc.keySet == docs.filter(_._2 >= 1).keySet)
    perDoc.foreach { case (id, (nChunks, covered, maxIdx)) =>
      val n = docs(id)
      // starts at 1, 49, 97, ... <= n  →  chunk count = ceil(n / 48)
      val expectChunks = (n + 47) / 48
      assert(nChunks == expectChunks, s"doc $id: $nChunks chunks for $n tokens")
      assert(maxIdx == expectChunks - 1)
      // windows overlap by 16 except the tail: total covered length is
      // n + 16 * (full windows that have a successor)
      val covered0 = (0 until expectChunks.toInt)
        .map(k => math.min(64, n - 48 * k)).sum
      assert(covered == covered0, s"doc $id: covered $covered vs $covered0")
    }
  }

  test("q84: every pack bin except a lang's last stays under budget + max doc") {
    val bins = TrainingDataQueries.q84.run(spark, sf001).collect()
    val maxDoc = t.documents
      .agg(max(size(split(col("text"), " ")))).head.getInt(0)
    bins.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      // a bin holds docs whose START offset falls inside it, so it can
      // overhang by at most one document
      assert(tokens <= 2048 + maxDoc,
        s"bin ${r.getAs[Long]("bin")} of ${r.getAs[String]("lang")}: $tokens tokens")
    }
    // packing must conserve tokens per lang
    val packed = bins.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("tokens")).sum).toMap
    val actual = t.documents
      .groupBy("lang").agg(sum(size(split(col("text"), " "))).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed == actual)
  }

  test("q85: rates are valid and no source is inflated") {
    val out = TrainingDataQueries.q85.run(spark, sf001).collect()
    val counts = t.documents.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, kept, rate) =
        (r.getAs[String]("source"), r.getAs[Long]("n_kept"), r.getAs[Double]("rate"))
      assert(rate > 0 && rate <= 1.0)
      assert(kept <= counts(src), s"$src inflated: kept $kept of ${counts(src)}")
    }
  }
}
