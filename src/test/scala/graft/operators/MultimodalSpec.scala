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

  test("frame sampling explodes 1->N with stride; resize fixes output shape") {
    val docs = new Tables(spark, sf001).documents
    val media = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(media, frameSize = 64, stride = 2)
    val byDoc = frames.collect().groupBy(_.doc_id)
    val sizes = media.collect().map(m => m.doc_id -> m.media.length).toMap
    byDoc.foreach { case (id, fs) =>
      val nChunks = (sizes(id) + 63) / 64
      val expected = (0 until nChunks).count(_ % 2 == 0)
      assert(fs.length == expected, s"doc $id")
      assert(fs.forall(_.frame_idx % 2 == 0))
      assert(fs.forall(_.frame_bytes.length <= 64))
    }
    val resized = Multimodal.resizeFrames(frames, 32).collect()
    assert(resized.forall(_.frame_bytes.length == 32))
    assert(resized.length == frames.count())
  }
}
