package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[MultimodalQueries.foldPacked]]'s algebra, the invariant every
  * consumer leans on (q222's per-generation ledger, the at-rest fold's
  * file surgery): folding ANY flat delta into ANY packed ledger equals
  * packing the union from scratch — ids strictly ascending per bucket,
  * sigs id-major, embeddings id-major flattened — regardless of how ids
  * interleave (ascending slices in q222, arbitrary interleaving in the
  * nightly fold) or how the rows are split between ledger and delta.
  * Randomized over seeds and split ratios, plus the edge cases: empty
  * ledger, empty delta, delta-only buckets, ledger-only buckets.
  */
class FoldPackedProps extends SharedSparkSpec {
  import spark.implicits._

  private def flatOf(rows: Seq[(Long, Int, Long, Seq[Float])]): DataFrame =
    rows.toDF("doc_id", "bucket", "sig", "embedding")

  private def packedRows(df: DataFrame): Seq[(Int, Seq[Long], Seq[Long], Seq[Float])] =
    df.collect().map { r =>
      (r.getInt(0), r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Float](3))
    }.toSeq.sortBy(_._1)

  test("foldPacked(pack(A), B) == pack(A ∪ B) under random interleavings") {
    val dim = 64
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val n = 40 + rng.nextInt(40)
      val all = (1 to n).map { i =>
        (i.toLong * 3 + rng.nextInt(3), // non-contiguous, may collide across split
          rng.nextInt(6),               // few buckets → real merges
          rng.nextLong(),
          Seq.fill(dim)(rng.nextFloat()))
      }.distinctBy(_._1)
      // Arbitrary split: ids interleave freely between ledger and delta.
      val (a, b) = all.partition(_ => rng.nextBoolean())
      val folded = MultimodalQueries.foldPacked(
        MultimodalQueries.packIngest(flatOf(a)), flatOf(b))
      val scratch = MultimodalQueries.packIngest(flatOf(all))
      assert(packedRows(folded) == packedRows(scratch), s"seed $seed diverged")
      // Invariant consumers assume: ids strictly ascending per bucket.
      packedRows(folded).foreach { case (bkt, ids, sigs, embs) =>
        assert(ids == ids.sorted && ids.distinct == ids, s"bucket $bkt ids not ascending")
        assert(sigs.size == ids.size && embs.size == ids.size * dim,
          s"bucket $bkt layout arity broken")
      }
    }
  }

  test("foldPacked edges: empty ledger, empty delta, disjoint buckets") {
    val dim = 64
    val rows = (1 to 12).map(i =>
      (i.toLong, i % 3, i.toLong * 7, Seq.fill(dim)(i.toFloat)))
    val packed = MultimodalQueries.packIngest(flatOf(rows))
    // Empty delta: the fold is the identity on the ledger.
    assert(packedRows(MultimodalQueries.foldPacked(packed, flatOf(Nil))) ==
      packedRows(packed))
    // Empty ledger: the fold is packIngest of the delta.
    assert(packedRows(MultimodalQueries.foldPacked(
        MultimodalQueries.packIngest(flatOf(Nil)), flatOf(rows))) ==
      packedRows(packed))
    // Disjoint buckets: untouched rows pass through, new buckets appear.
    val more = (13 to 18).map(i =>
      (i.toLong, 10 + i % 2, i.toLong, Seq.fill(dim)(0.5f)))
    assert(packedRows(MultimodalQueries.foldPacked(packed, flatOf(more))) ==
      packedRows(MultimodalQueries.packIngest(flatOf(rows ++ more))))
  }
}
