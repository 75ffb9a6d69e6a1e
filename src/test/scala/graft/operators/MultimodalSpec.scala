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

  test("PGM decode is REAL: synthesized P5 images round-trip exact dimensions and mean") {
    import spark.implicits._
    // deterministic gradient images, one per (w, h)
    def pgm(w: Int, h: Int, comment: Boolean): Array[Byte] = {
      val header = (if (comment) s"P5\n# synthetic\n$w $h\n255\n" else s"P5 $w $h 255\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val raster = Array.tabulate(w * h)(i => (i % 256).toByte)
      header ++ raster
    }
    val dims = Seq((4, 3), (16, 16), (1, 1), (40, 7))
    val rows = dims.zipWithIndex.map { case ((w, h), i) =>
      Multimodal.MediaRecord(i.toLong, "img", pgm(w, h, comment = i % 2 == 0))
    } :+ Multimodal.MediaRecord(99L, "txt", "not an image".getBytes)
    val out = Multimodal.decodeImages(rows.toDS()).collect().sortBy(_.doc_id)
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      val f = out(i)
      assert(f.decoded && f.width == w && f.height == h && f.maxval == 255)
      val expectMean = (0 until w * h).map(j => (j % 256)).sum.toDouble / (w * h)
      assert(math.abs(f.mean_intensity - expectMean) < 1e-12,
        s"${w}x$h mean ${f.mean_intensity} != $expectMean")
    }
    val bad = out.last
    assert(!bad.decoded && bad.doc_id == 99L)
    // truncated raster must degrade, not crash
    val trunc = Multimodal.decodeImages(
      Seq(Multimodal.MediaRecord(7L, "img", pgm(8, 8, comment = false).dropRight(5))).toDS())
      .head()
    assert(!trunc.decoded)
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

  test("media embeddings are unit-norm, deterministic, and feed the ANN path") {
    import org.apache.spark.sql.functions._
    val docs = new Tables(spark, sf001).documents
    val media = Multimodal.mediaTable(docs)
    val emb = Multimodal.embedFeatures(media, 64)
    val rows = emb.collect().sortBy(_.doc_id)
    assert(rows.length == docs.count())
    rows.foreach { e =>
      val n = math.sqrt(e.embedding.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      assert(math.abs(n - 1.0) < 1e-4, s"not unit norm: $n")
    }
    val rows2 = emb.collect().sortBy(_.doc_id)
    assert(rows.map(_.embedding.toSeq).toSeq == rows2.map(_.embedding.toSeq).toSeq)
    // composition: the same Array[Float] column shape the similarity
    // operators consume — bucket media-derived vectors via hyperplane LSH
    val planes = {
      val rng = new scala.util.Random(7L)
      IndexedSeq.fill(32 * 64)(rng.nextGaussian())
    }
    val sigs = emb.toDF().select(col("doc_id"),
      graft.functions.HyperplaneSignature(col("embedding"), planes, 64).as("sig"))
    assert(sigs.select(countDistinct(col("sig"))).collect().head.getLong(0) > 1)
  }
}
