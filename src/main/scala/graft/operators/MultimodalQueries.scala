package graft.operators

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extraction via mapPartitions.
  *
  * The container has no image/audio codecs, so `decodeFeatures` is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing (typed
  * schema, binary column, partition-wise batch iteration, feature schema) is
  * real and unit-tested. At scale this is exactly where a JNI/codec call (or
  * an Arrow-batched Python worker on a PySpark deployment) plugs in: one
  * codec init per partition, streamed record batches, no driver involvement.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, source: String, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, source: String, n_bytes: Long,
      fake_width: Int, fake_height: Int, checksum: Long)

  /** Partition-wise "decode": iterator-in/iterator-out, the shape a real
    * codec integration uses (init once per partition, stream the batch). */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // STUB decode: a real implementation opens the codec here, once per
      // partition, and decodes each record's bytes. The fake is a pure
      // deterministic function of the bytes.
      it.map { m =>
        val n = m.media.length.toLong
        val checksum = m.media.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
        MediaFeatures(m.doc_id, m.source, n,
          fake_width = (n % 640).toInt, fake_height = (n % 480).toInt, checksum)
      }
    }
  }

  /** documents.text reinterpreted as opaque media bytes (UTF-8) — the
    * testdata has no true binary column, so the binary pipeline is exercised
    * on encoded text. */
  def mediaTable(docs: org.apache.spark.sql.DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    docs.select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** One sampled "frame" of a media payload. */
  final case class MediaFrame(
      doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** 1→N frame sampling: every `stride`-th fixed-size block of the payload
    * is one frame — the row-expansion (flatMap) shape of a real video
    * frame-sampler, with the decoder STUBBED as byte-slicing. Partition-wise
    * iteration keeps per-partition codec state possible and never
    * materializes a whole partition of frames at once. */
  def sampleFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameSize > 0 && stride > 0)
    implicit val enc = Encoders.product[MediaFrame]
    ds.mapPartitions { it =>
      it.flatMap { m =>
        m.media.grouped(frameSize).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 => MediaFrame(m.doc_id, i, chunk)
        }
      }
    }
  }

  /** "Resize" a frame to exactly `n` bytes (truncate/zero-pad) — the
    * fixed-output-shape contract of a real resize kernel, decoder stubbed. */
  def resizeFrames(ds: Dataset[MediaFrame], n: Int): Dataset[MediaFrame] = {
    require(n > 0)
    implicit val enc = Encoders.product[MediaFrame]
    ds.mapPartitions { it =>
      it.map { f => f.copy(frame_bytes = java.util.Arrays.copyOf(f.frame_bytes, n)) }
    }
  }

  /** Decoded image features from a REAL decoder (see [[decodePgm]]). */
  final case class ImageFeatures(
      doc_id: Long, source: String, width: Int, height: Int,
      maxval: Int, mean_intensity: Double, decoded: Boolean)

  /** REAL image decoder for binary PGM (Netpbm "P5") — a production format
    * that needs no codec library, so this path is NOT a stub: header parse
    * (magic, whitespace/comments, width, height, maxval) + raster read,
    * mean intensity computed in one pass. Returns None on anything that is
    * not a well-formed single-byte-depth P5 payload (malformed media must
    * degrade to a flag, never kill the partition — same tolerance contract
    * as the corrupt-file read path). */
  def decodePgm(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val s = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == s || i - s > 9) None
      else Some(new String(bytes, s, i - s, java.nio.charset.StandardCharsets.US_ASCII).toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5') return None
    i = 2
    for {
      w <- int(); h <- int(); mx <- int()
      if w > 0 && h > 0 && mx > 0 && mx < 256
      // exactly one whitespace byte separates header from raster
      if i < bytes.length && { i += 1; bytes.length - i >= w.toLong * h }
    } yield {
      var sum = 0.0
      val end = i + w * h
      var j = i
      while (j < end) { sum += (bytes(j) & 0xff); j += 1 }
      (w, h, mx, sum / (w.toLong * h))
    }
  }

  /** Real decode path over the binary column: PGM payloads decode to true
    * (width, height, maxval, mean intensity); everything else degrades to a
    * decoded=false row. Same mapPartitions batch shape as the stubbed
    * codecs — this is what plugs in where the stub sits, proven on a format
    * the JVM can parse without native libraries. */
  def decodeImages(ds: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    ds.mapPartitions { it =>
      it.map { m =>
        decodePgm(m.media) match {
          case Some((w, h, mx, mean)) =>
            ImageFeatures(m.doc_id, m.source, w, h, mx, mean, decoded = true)
          case None =>
            ImageFeatures(m.doc_id, m.source, 0, 0, 0, 0.0, decoded = false)
        }
      }
    }
  }

  /** One media embedding (unit-norm float vector). */
  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Media → embedding, the encoder-model boundary: iterator-in/iterator-out
    * per partition (one model load per partition, batched inference in a
    * real deployment — here a deterministic STUB that hashes byte windows
    * into a unit-norm vector, so downstream geometry is well-defined). The
    * output column is the same `Array[Float]` shape as the embeddings
    * table, so the ANN operators (q25 brute-force, q37 IVF, q49
    * hyperplane-LSH) run on media-derived vectors unchanged — that
    * composition is the multimodal near-dup path at 100 TB.
    */
  def embedFeatures(ds: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaEmbedding] = {
    require(dim > 0)
    implicit val enc = Encoders.product[MediaEmbedding]
    ds.mapPartitions { it =>
      // STUB encoder: a real implementation loads the model here, once per
      // partition. The fake folds each byte into a hash-chosen dimension.
      it.map { m =>
        val v = new Array[Float](dim)
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < m.media.length) {
          h = (h ^ (m.media(i) & 0xffL)) * 0x100000001b3L
          v(((h % dim).toInt + dim) % dim) += (if ((h & 1L) == 0L) 1f else -1f)
          i += 1
        }
        val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
        MediaEmbedding(m.doc_id, if (norm == 0f) v else v.map(_ / norm))
      }
    }
  }
}

object MultimodalQueries {

  /** Media metadata aggregation over the binary column: per source, media
    * count, total payload bytes, and the mean of the stubbed decoded width.
    * The width fake (octet_length % 640) is mirrored in SQL so the whole
    * binary path stays oracle-checked even with the codec stubbed out.
    */
  val q39 = EngineQuery(
    "q39_multimodal_meta",
    Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_media,
           |       CAST(sum(octet_length(b)) AS BIGINT) AS total_bytes,
           |       round(avg(CAST(octet_length(b) % 640 AS DOUBLE)), 4) AS avg_fake_width
           |FROM (SELECT source, encode(text) AS b FROM documents) t
           |GROUP BY source ORDER BY ALL""".stripMargin)) { t =>
    orderedByAll(
      t.documents
        .select(col("source"), col("text").cast("binary").as("b"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_media"),
          sum(octet_length(col("b"))).as("total_bytes"),
          round4(avg((octet_length(col("b")) % 640).cast("double"))).as("avg_fake_width")))
  }

  val all: Seq[EngineQuery] = Seq(q39)
}
