package graft.operators

import graft.{SharedSparkSpec, Tables}

/** The multimodal plumbing is real even though the codec is stubbed:
  * typed binary records flow through mapPartitions and produce a
  * deterministic feature row per media item. */
class MultimodalSpec extends SharedSparkSpec {

  test("binary media pipeline: typed mapPartitions decode is deterministic") {
    val docs = new Tables(spark, sf001).documents
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val feats2 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.toSeq == feats2.toSeq)
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.fake_width == (f.n_bytes % 640).toInt)
      assert(f.fake_height == (f.n_bytes % 480).toInt)
    }
  }
}
