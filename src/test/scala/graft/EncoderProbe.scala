package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the ENCODE-TIME shared-encoder lever — the branch
  * AlignerProbe left open. AlignerProbe proved no post-hoc map over the
  * shipped vectors can lift matched cosine off √(256/512) ≈ 0.707 (the
  * fixture's Bayes limit): the lost information is WHICH byte positions
  * the modalities share, and it is gone by vector time. This probe moves
  * the lever to encode time: a position-DECAYED variant of the stub
  * encoder (contribution of stream byte i weighted 2^(-i/halfLife))
  * concentrates each modality's norm toward the stream head — exactly the
  * region the modalities share by construction (the audio stream's first
  * 256 bytes ARE the image stream) — so matched cosine rises to
  * √(Σ_{i<256} w_i² / Σ_{i<512} w_i²) ≈ 0.894 at halfLife 256 with
  * ambient pairs still near-orthogonal (hash signs independent), and the
  * blocking's recall at FIXED probe volume rises with it (the LSH
  * exponent ρ = ln(1/p1)/ln(1/p2) falls as p1 grows).
  *
  * The probe also measures what the lift COSTS: a pair identical in its
  * first 256 bytes but divergent after (an image-span dup, deliberately
  * NOT an audio dup — AudioNearDupSpec pins that asymmetry) moves from
  * audio cosine ≈ 0.707 to ≈ 0.894 under the decayed encoder — the
  * within-modality span distinction blurs by exactly the mechanism that
  * helps cross-modal retrieval. That tension is the measurement: a
  * production shared encoder is TRAINED to balance the two objectives;
  * no untrained weighting gets both for free.
  *
  * Usage: sbt "Test/runMain graft.EncoderProbe <sfDir> [halfLife=256]"
  * (test scope; one decade is enough — the geometry is N-independent,
  * the recall curve is measured at the decade given). */
object EncoderProbe {

  /** The stub encoder's exact fold ([[graft.operators.Multimodal
    * .embedFeatures]]: FNV chain + murmur avalanche, sign from bits
    * disjoint from the index) with a position weight — halfLife = ∞
    * reproduces the shipped encoder bit-for-bit in direction. */
  def weightedEmbed(stream: Array[Byte], dim: Int, halfLife: Double): Array[Float] = {
    val v = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < stream.length) {
      h = (h ^ (stream(i) & 0xffL)) * 0x100000001b3L
      var z = h
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
      z = z ^ (z >>> 33)
      val w = math.pow(0.5, i / halfLife).toFloat
      v(((z % dim).toInt + dim) % dim) += (if (((z >>> 32) & 1L) == 0L) w else -w)
      i += 1
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm == 0f) v else v.map(_ / norm)
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d // inputs are unit-norm
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.EncoderProbe <sfDir> [halfLife]")
    val sfDir = args(0)
    val halfLife = if (args.length > 1) args(1).toDouble else 256.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Multimodal, MultimodalQueries}
    val t = new graft.Tables(spark, sfDir)
    val n = t.documents.count()
    println(s"== encoder probe @ $sfDir (n=$n, halfLife=$halfLife) ==")
    val hl = halfLife

    // Decayed embeddings of both modalities. The probe embeds the CANONICAL
    // byte streams directly (padBytes) — the codec round-trips are identity
    // on the payload (pinned by MultimodalSpec), and the probe measures
    // geometry, not codecs.
    val docs = t.documents.select(col("doc_id"), col("text"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, String)]
    val imgW = docs.map { case (id, txt) =>
      (id, weightedEmbed(Multimodal.padBytes(txt, 256), 64, hl)) }
      .toDF("doc_id", "ei").localCheckpoint()
    val audW = docs.map { case (id, txt) =>
      (id, weightedEmbed(Multimodal.padBytes(txt, 512), 64, hl)) }
      .toDF("doc_id", "ea").localCheckpoint()

    // Baseline (shipped encoder) embeddings from the engine's decode-once
    // frames — the real pipeline output, codecs included.
    val imgB = MultimodalQueries.mediaPixelEmbeddings(t)
      .select(col("doc_id"), col("embedding").as("ei")).localCheckpoint()
    val audB = MultimodalQueries.audioSampleEmbeddings(t)
      .select(col("doc_id"), col("embedding").as("ea")).localCheckpoint()

    def matchedStats(img: org.apache.spark.sql.DataFrame,
                     aud: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val m = img.join(aud, Seq("doc_id"))
        .select(graft.functions.CosineSimilarity(col("ei"), col("ea")).as("c"))
        .agg(avg("c"), expr("percentile_approx(c, 0.05)"), min("c")).head()
      println(f"  $tag%-8s matched cos: mean=${m.getDouble(0)}%.4f " +
        f"p05=${m.getDouble(1)}%.4f min=${m.getDouble(2)}%.4f")
    }
    def ambientStats(img: org.apache.spark.sql.DataFrame,
                     aud: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      // Deterministic unrelated pairs: doc i's image vs doc i+1's audio.
      val shifted = aud.withColumn("doc_id", col("doc_id") - 1)
      val m = img.join(shifted, Seq("doc_id"))
        .select(abs(graft.functions.CosineSimilarity(col("ei"), col("ea"))).as("c"))
        .agg(avg("c"), expr("percentile_approx(c, 0.99)")).head()
      println(f"  $tag%-8s ambient |cos|: mean=${m.getDouble(0)}%.4f " +
        f"p99=${m.getDouble(1)}%.4f")
    }
    matchedStats(imgB, audB, "baseline")
    matchedStats(imgW, audW, "decayed")
    ambientStats(imgB, audB, "baseline")
    ambientStats(imgW, audW, "decayed")

    // Block recall at the shipped operating point (p1=8, nprobe=16, same
    // candidate volume) — baseline model on baseline vectors vs a model
    // TRAINED ON the decayed vectors: does the encoder shift move the
    // recall@volume curve itself?
    import graft.functions.KMeansTrainer
    val (k1, k2) = MultimodalQueries.crossModalFineK(n)
    def recall(img: org.apache.spark.sql.DataFrame,
               aud: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val sampleLimit = math.max(256L, 32L * k1 * k2)
      val m2 = MultimodalQueries.trainFineFrom(
        img.filter(col("doc_id") < sampleLimit)
          .select(col("doc_id"), col("ei").as("embedding")), k1, k2)
      val assigned = img.select(col("doc_id"),
        KMeansTrainer.fineBucket(col("ei"), m2).as("ib")).localCheckpoint()
      val pl = aud.select(col("doc_id"),
        KMeansTrainer.fineProbeBuckets(col("ea"), m2,
          MultimodalQueries.CrossModalL1Probes,
          MultimodalQueries.CrossModalFineProbes).as("pl"))
      val joined = pl.join(assigned, Seq("doc_id"))
      val nQ = joined.count()
      val hit = joined.filter(array_contains(col("pl"), col("ib"))).count()
      println(f"  $tag%-8s block recall@(p1=8,np=16): ${hit.toDouble / nQ}%.4f " +
        s"($hit/$nQ, k1=$k1 k2=$k2)")
    }
    recall(imgB, audB, "baseline")
    recall(imgW, audW, "decayed")

    // The COST: an image-span dup (identical first 256 bytes, divergent
    // tail) on the AUDIO side — the span distinction q219 pins.
    val prefix = ("ab " * 86).take(256)
    val tailA = "tailA tailA tailA tailA tailA tailA tailA tailA"
    val tailB = "tailB tailB tailB tailB tailB tailB tailB tailB"
    def audVec(txt: String, decayed: Boolean): Array[Float] =
      weightedEmbed(Multimodal.padBytes(txt, 512), 64,
        if (decayed) hl else Double.PositiveInfinity)
    val base = cos(audVec(prefix + tailA, decayed = false).toSeq,
      audVec(prefix + tailB, decayed = false).toSeq)
    val dec = cos(audVec(prefix + tailA, decayed = true).toSeq,
      audVec(prefix + tailB, decayed = true).toSeq)
    println(f"  span-trade: image-span dup pair audio cos " +
      f"baseline=$base%.4f decayed=$dec%.4f " +
      f"(MediaNearDupT=${MultimodalQueries.MediaNearDupT})")
    spark.stop()
  }
}
