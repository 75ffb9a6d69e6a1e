package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation family's MAINTENANCE cycle
  * ([[CurationQueries.appendAdmittedToCurationFamily]]): after a nightly
  * batch is admitted, its ids/digests/postings fold into the store-side
  * family tables (curstore/curstorekeys/curstoreinv) so the next nightly
  * serves the GROWN frozen store from storage instead of re-paying the
  * family build. Pinned: (1) each appended table equals its
  * rebuilt-from-scratch twin over store ∪ admitted row-for-row, (2) the
  * append plans read NO corpus text beyond the standing per-doc
  * checkpoints, (3) the next night's funnel decisions over the maintained
  * tables equal a rebuilt-store run stage-for-stage.
  */
class CurationFamilyFoldSpec extends SharedSparkSpec {
  import CurationQueries._

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def keyset(df: DataFrame): Seq[String] =
    df.select("key").collect()
      .map(_.getAs[Array[Byte]](0).map("%02x".format(_)).mkString)
      .sorted.toSeq

  private def posts(df: DataFrame): Seq[(Long, Long)] =
    df.select("doc_id", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("family append == rebuilt store-side tables; night-two parity; no text re-read") {
    val t = new graft.Tables(spark, sf001)
    dropCurationFamily(t)
    try {
      val tb = curationLayoutTables(t)
      val in = CurationInputs.live(t)
      // Night one: the engine's own step decides the first half-batch.
      // %20==10 first: at sf0.001 the %20==0 half is all-src0 (benchmark
      // docs), which decontamination removes wholesale — night one must
      // ADMIT something for the fold to be non-trivial.
      val night1 = in.raw.filter(col("doc_id") % 20 === 10).select("doc_id")
      val night2 = in.raw.filter(col("doc_id") % 20 === 0).select("doc_id")
      assert(night1.count() > 0 && night2.count() > 0)
      val (_, frames1) =
        curationStepFrom(in, night1, FunnelState.frozenFrom(in))
      val admitted1 = frames1.clean.localCheckpoint()
      assert(admitted1.count() > 0, "degenerate fixture: nothing admitted")
      val stats = appendAdmittedToCurationFamily(t, admitted1)
      // (2) the append derived every delta from standing checkpoints —
      // no corpus text scan in any append plan.
      stats.plans.foreach { case (m, p) =>
        assert(!p.contains("documents.parquet"),
          s"append of $m re-read corpus text:\n${p.take(800)}")
      }
      assert(stats.appendedRows("store") == admitted1.count())
      // (1) appended tables == rebuilt twins over store ∪ admitted.
      val storePlus = in.storeIds.select("doc_id")
        .unionByName(admitted1).localCheckpoint()
      assert(ids(spark.table(tb("store"))) == ids(storePlus))
      assert(keyset(spark.table(tb("storekeys"))) ==
        keyset(storeDigestKeys(t, storePlus)))
      assert(posts(spark.table(tb("storeinv"))) ==
        posts(in.corpusInv.join(storePlus, Seq("doc_id"), "left_semi")))
      // (3) night two decided over the MAINTAINED tables vs a rebuilt
      // store — identical per-stage survivor sets.
      val maintained = CurationInputs(in.raw, spark.table(tb("store")),
        spark.table(tb("storekeys")), spark.table(tb("storeinv")),
        in.corpusInv, in.sizes, in.benchHits)
      val rebuilt = CurationInputs(in.raw, storePlus,
        storeDigestKeys(t, storePlus),
        in.corpusInv.join(storePlus, Seq("doc_id"), "left_semi"),
        in.corpusInv, in.sizes, in.benchHits)
      def stages(i: CurationInputs): (Seq[Long], Seq[Long], Seq[Long]) = {
        val (_, f) = curationStepFrom(i, night2, FunnelState.frozenFrom(i))
        (ids(f.exact), ids(f.nearDup), ids(f.clean))
      }
      val (e1, n1, c1) = stages(maintained)
      val (e2, n2, c2) = stages(rebuilt)
      assert(e1 == e2, "exact stage diverged on the maintained family")
      assert(n1 == n2, "near-dup stage diverged on the maintained family")
      assert(c1 == c2, "clean stage diverged on the maintained family")
    } finally dropCurationFamily(t)
  }
}
