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

  test("PNG decode is REAL: ImageIO-encoded images round-trip dimensions and mean") {
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // Gray: mean = mean of gray bytes. ImageIO picks per-row filters
    // adaptively, so a gradient exercises Sub/Up/Average/Paeth unfiltering.
    val gw = 37; val gh = 23
    val gray = new BufferedImage(gw, gh, BufferedImage.TYPE_BYTE_GRAY)
    var gsum = 0.0
    for (y <- 0 until gh; x <- 0 until gw) {
      val v = (x * 7 + y * 13) % 256
      gray.getRaster.setSample(x, y, 0, v); gsum += v
    }
    val g = Multimodal.decodePng(png(gray))
    assert(g.isDefined, "gray PNG failed to decode")
    assert(g.get._1 == gw && g.get._2 == gh && g.get._3 == 255)
    assert(math.abs(g.get._4 - gsum / (gw * gh)) < 1e-9, s"${g.get._4} vs ${gsum / (gw * gh)}")
    // RGB: mean over the three color channels.
    val cw = 19; val ch = 31
    val rgb = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
    var csum = 0.0
    for (y <- 0 until ch; x <- 0 until cw) {
      val (r, gg, b) = ((x * 11) % 256, (y * 17) % 256, ((x + y) * 5) % 256)
      rgb.setRGB(x, y, (r << 16) | (gg << 8) | b); csum += r + gg + b
    }
    val c = Multimodal.decodePng(png(rgb))
    assert(c.isDefined, "RGB PNG failed to decode")
    assert(c.get._1 == cw && c.get._2 == ch)
    assert(math.abs(c.get._4 - csum / (cw * ch * 3)) < 1e-9)
    // RGBA: alpha bytes must NOT contaminate the intensity mean.
    val argb = new BufferedImage(8, 8, BufferedImage.TYPE_INT_ARGB)
    var asum = 0.0
    for (y <- 0 until 8; x <- 0 until 8) {
      val (r, gg, b) = (x * 20 % 256, y * 30 % 256, 77)
      argb.setRGB(x, y, (128 << 24) | (r << 16) | (gg << 8) | b); asum += r + gg + b
    }
    val a = Multimodal.decodePng(png(argb))
    assert(a.isDefined, "RGBA PNG failed to decode")
    assert(math.abs(a.get._4 - asum / (8 * 8 * 3)) < 1e-9)
    // Malformed payloads degrade to None, never throw:
    val good = png(gray)
    assert(Multimodal.decodePng(good.dropRight(40)).isEmpty, "truncated must fail")
    val flipped = good.clone(); flipped(good.length - 5) = (flipped(good.length - 5) ^ 0x1).toByte
    assert(Multimodal.decodePng(flipped).isEmpty, "CRC mismatch must fail")
    assert(Multimodal.decodePng("not a png at all".getBytes).isEmpty)
    // Palette PNGs are out of the supported profile — rejected, not mangled.
    val pal = new BufferedImage(5, 5, BufferedImage.TYPE_BYTE_INDEXED)
    assert(Multimodal.decodePng(png(pal)).isEmpty, "palette must be rejected")
    // And the Dataset path dispatches PGM/PNG/other per record.
    import spark.implicits._
    val mixed = Seq(
      Multimodal.MediaRecord(1L, "png", good),
      Multimodal.MediaRecord(2L, "pgm", s"P5 2 2 255\n".getBytes ++ Array[Byte](0, 50, 100, (150 & 0xff).toByte)),
      Multimodal.MediaRecord(3L, "txt", "plain text".getBytes))
    val feats = Multimodal.decodeImages(mixed.toDS()).collect().sortBy(_.doc_id)
    assert(feats(0).decoded && feats(0).width == gw && feats(0).height == gh)
    assert(feats(1).decoded && feats(1).width == 2 && feats(1).height == 2)
    assert(!feats(2).decoded)
  }

  test("PNG decode bails on a preset-dictionary (FDICT) zlib stream instead of hanging") {
    // A crafted IDAT whose zlib header sets FDICT makes Inflater.inflate()
    // return 0 with needsInput()==false and finished()==false forever —
    // the decode loop must treat zero progress as malformed, not spin.
    def be32(v: Int) = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = chunk("IHDR", be32(1) ++ be32(1) ++ Array[Byte](8, 0, 0, 0, 0))
    // CMF=0x78 FLG=0x20: FDICT bit set, (0x7820 % 31) == 0 so the header
    // checksum is VALID — the stream is well-formed zlib right up to the
    // dictionary request. Chunk CRCs are genuine (trivially recomputable).
    val idat = chunk("IDAT", Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0, 0))
    val bytes = sig ++ ihdr ++ idat ++ chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePng(bytes).isEmpty, "FDICT stream must degrade to None")
  }

  test("PNG decode survives randomized dimensions and content (seeded)") {
    import java.awt.image.BufferedImage
    val rng = new scala.util.Random(20260812L)
    for (_ <- 1 to 25) {
      val w = 1 + rng.nextInt(48); val h = 1 + rng.nextInt(48)
      val kind = rng.nextInt(3)
      val imgType = kind match {
        case 0 => BufferedImage.TYPE_BYTE_GRAY
        case 1 => BufferedImage.TYPE_INT_RGB
        case _ => BufferedImage.TYPE_INT_ARGB
      }
      val img = new BufferedImage(w, h, imgType)
      var sum = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        if (kind == 0) {
          val v = rng.nextInt(256); img.getRaster.setSample(x, y, 0, v); sum += v
        } else {
          val (r, g, b) = (rng.nextInt(256), rng.nextInt(256), rng.nextInt(256))
          val a = if (kind == 2) rng.nextInt(256) else 0xff
          img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
          sum += r + g + b
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val dec = Multimodal.decodePng(bos.toByteArray)
      assert(dec.isDefined, s"${w}x$h kind=$kind failed to decode")
      assert(dec.get._1 == w && dec.get._2 == h, s"${w}x$h kind=$kind dims ${dec.get}")
      val ch = if (kind == 0) 1 else 3
      val exp = sum / (w.toLong * h * ch)
      assert(math.abs(dec.get._4 - exp) < 1e-9, s"${w}x$h kind=$kind mean ${dec.get._4} vs $exp")
    }
  }

  test("WAV decode is REAL: AudioSystem-encoded and hand-rolled PCM round-trip") {
    // independent encoder: javax.sound writes a 16-bit PCM WAV
    def wavViaAudioSystem(samples: Array[Short], rate: Float, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val sine = Array.tabulate(4410)(i =>
      (math.sin(2 * math.Pi * 440 * i / 44100.0) * 16384).toShort)
    val w = Multimodal.decodeWav(wavViaAudioSystem(sine, 44100f, 1))
    assert(w.isDefined, "AudioSystem WAV failed to decode")
    val (rate, ch, n, mean) = w.get
    assert(rate == 44100 && ch == 1 && n == 4410)
    val expMean = sine.map(s => math.abs(s.toDouble) / 32768.0).sum / sine.length
    assert(math.abs(mean - expMean) < 1e-12, s"$mean vs $expMean")
    // stereo: frames = samples per channel
    val stereo = Multimodal.decodeWav(wavViaAudioSystem(sine, 22050f, 2))
    assert(stereo.isDefined && stereo.get._2 == 2 && stereo.get._3 == 2205)
    // hand-rolled file with an extra LIST chunk before data (real files
    // carry metadata chunks) and exactly known samples
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val data = Array[Short](16384, -16384, 16384, -16384)
      .flatMap(s => le16(s & 0xffff))
    val listBody = "INFOxtra".getBytes
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "LIST".getBytes ++ le32(listBody.length) ++ listBody ++
      "data".getBytes ++ le32(data.length) ++ data
    val handRolled = "RIFF".getBytes ++ le32(body.length) ++ body
    val h = Multimodal.decodeWav(handRolled)
    assert(h.isDefined, "hand-rolled WAV failed")
    assert(h.get == ((8000, 1, 4L, 0.5)), h.get.toString)
    // malformed payloads degrade, never throw
    assert(Multimodal.decodeWav(handRolled.dropRight(3)).isEmpty, "truncated data")
    assert(Multimodal.decodeWav("RIFFxxxxNOPE".getBytes).isEmpty, "bad magic")
    val nonPcm = handRolled.clone(); nonPcm(20) = 3 // fmt.audioFormat = IEEE float
    assert(Multimodal.decodeWav(nonPcm).isEmpty, "non-PCM must be rejected")
    // Dataset path
    import spark.implicits._
    val feats = Multimodal.decodeAudio(Seq(
      Multimodal.MediaRecord(1L, "wav", handRolled),
      Multimodal.MediaRecord(2L, "txt", "not audio".getBytes)).toDS())
      .collect().sortBy(_.doc_id)
    assert(feats(0).decoded && feats(0).sample_rate == 8000 && feats(0).mean_abs == 0.5)
    assert(!feats(1).decoded)
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

  test("video container: sampled-frame decode is exact; malformed bytes flag, never throw") {
    import Multimodal._
    val spark0 = spark
    import spark0.implicits._
    implicit val mEnc = org.apache.spark.sql.Encoders.product[MediaRecord]
    // 4 known frames: constant-pixel PNGs with distinct values
    val vals = Seq(10, 20, 30, 40).map(_.toByte)
    val frames = vals.map(v => encodePngGray(Array.fill(256)(v), 16, 16))
    val good = MediaRecord(1L, "s", encodeVideo(frames))
    // malformed variants
    val badMagic = MediaRecord(2L, "s", "XVID".getBytes ++ good.media.drop(4))
    val truncated = MediaRecord(3L, "s", good.media.take(good.media.length - 7))
    val garbageFrame = {
      val f2 = frames.updated(0, Array.fill(20)(0x7f.toByte)) // not a PNG
      MediaRecord(4L, "s", encodeVideo(f2))
    }
    val out = sampleVideoFrames(
      Seq(good, badMagic, truncated, garbageFrame).toDS(), stride = 2)
      .collect().map(r => r.doc_id -> r).toMap
    val g = out(1L)
    assert(g.decoded && g.n_frames == 4 && g.n_sampled == 2)
    // sampled frames 0 and 2: 256*10 + 256*30
    assert(g.px_sum == 256L * 10 + 256L * 30, s"got ${g.px_sum}")
    assert(!out(2L).decoded, "bad magic must flag")
    assert(!out(3L).decoded, "truncated index must flag")
    assert(!out(4L).decoded, "undecodable sampled frame must flag")
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
