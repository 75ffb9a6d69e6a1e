package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for judge item 5 (round 16): TRACE the Pareto front between
  * the two objectives EncoderProbe showed are in tension — matched
  * cross-modal lift (retrieval recall at fixed probe volume) vs the
  * within-modality span margin (an image-span dup pair's audio cosine
  * must stay below MediaNearDupT for q219/q225's asymmetry).
  *
  * The theory this probe tests: for ANY position-weighting w_i of the
  * stub encoder's byte fold, with E_k = Σ_{i<k} w_i²,
  *
  *   matched cross-modal cosine  ≈ √(E_256/E_512)    (image carries only
  *                                                    the shared head)
  *   image-span dup audio cosine ≈  E_256/E_512      (both carry 512,
  *                                                    share the head)
  *
  * i.e. BOTH objectives are functions of the single scalar r = E_256/E_512
  * (the head's energy share), with span = matched² — so the "front" is
  * the one-dimensional curve y = x² regardless of weighting SHAPE, no
  * weighting dominates another off the curve, and training the weighting
  * against both objectives reduces to choosing ONE knob r (subject to a
  * span margin m: r = T − m ⇒ matched = √(T − m)). A trained encoder can
  * pick the knee; it cannot beat the curve within this family. The probe
  * measures two different families (exponential decay by halfLife,
  * two-block head/tail weights) at matched r values and checks they land
  * on the same (matched, span, recall) points — the collapse IS the
  * result, and the reason the shipped encoder stays frozen (the front
  * dominates neither objective; every point is a trade).
  *
  * Usage: sbt "Test/runMain graft.EncoderParetoProbe <sfDir>"
  */
object EncoderParetoProbe {

  /** [[EncoderProbe.weightedEmbed]] generalized to an arbitrary position
    * weight. */
  def embedWith(stream: Array[Byte], dim: Int, w: Int => Float): Array[Float] = {
    val v = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < stream.length) {
      h = (h ^ (stream(i) & 0xffL)) * 0x100000001b3L
      var z = h
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
      z = z ^ (z >>> 33)
      val wi = w(i)
      v(((z % dim).toInt + dim) % dim) += (if (((z >>> 32) & 1L) == 0L) wi else -wi)
      i += 1
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm == 0f) v else v.map(_ / norm)
  }

  /** A weighting family member: name, the weight function, and its exact
    * head-energy share r = E_256/E_512. */
  final case class Member(family: String, param: String, w: Int => Float) {
    def r: Double = {
      def e(k: Int) = (0 until k).map(i => w(i).toDouble * w(i)).sum
      e(256) / e(512)
    }
  }

  private def expMember(halfLife: Double): Member =
    Member("exp", f"hl=$halfLife%.0f",
      i => math.pow(0.5, i / halfLife).toFloat)

  /** Head weight 1, tail weight `tw` — the two-block shape a trained
    * encoder would effectively learn for this fixture's span structure. */
  private def blockMember(tw: Double): Member =
    Member("block", f"tail=$tw%.2f",
      i => if (i < 256) 1f else tw.toFloat)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.EncoderParetoProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Multimodal, MultimodalQueries}
    import graft.functions.KMeansTrainer
    val t = new graft.Tables(spark, sfDir)
    val n = t.documents.count()
    val (k1, k2) = MultimodalQueries.crossModalFineK(n)
    println(s"== encoder Pareto probe @ $sfDir (n=$n, k1=$k1 k2=$k2) ==")
    println("family param      r_theory matched_cos span_cos recall@vol  " +
      "matched_pred(√r) span_pred(r)")

    val docs = t.documents.select(col("doc_id"), col("text"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .as[(Long, String)].cache()
    docs.count()

    // The span-trade fixture pair (EncoderProbe's): identical first 256
    // bytes, divergent tails — q219's planted asymmetry shape.
    val prefix = ("ab " * 86).take(256)
    val tailA = "tailA tailA tailA tailA tailA tailA tailA tailA"
    val tailB = "tailB tailB tailB tailB tailB tailB tailB tailB"

    def cosL(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }

    val members =
      Seq(expMember(Double.PositiveInfinity), expMember(1024), expMember(512),
        expMember(256), expMember(128)) ++
      Seq(blockMember(1.0), blockMember(0.75), blockMember(0.5),
        blockMember(0.35), blockMember(0.2))

    for (m <- members) {
      val w = m.w
      val img = docs.map { case (id, txt) =>
        (id, embedWith(Multimodal.padBytes(txt, 256), 64, w)) }
        .toDF("doc_id", "ei").localCheckpoint()
      val aud = docs.map { case (id, txt) =>
        (id, embedWith(Multimodal.padBytes(txt, 512), 64, w)) }
        .toDF("doc_id", "ea").localCheckpoint()
      val matched = img.join(aud, Seq("doc_id"))
        .select(graft.functions.CosineSimilarity(col("ei"), col("ea")).as("c"))
        .agg(avg("c")).head().getDouble(0)
      val span = cosL(
        embedWith(Multimodal.padBytes(prefix + tailA, 512), 64, w),
        embedWith(Multimodal.padBytes(prefix + tailB, 512), 64, w))
      // Block recall at the shipped operating point (p1=8, np=16): model
      // trained on THIS member's image vectors, probed by its audio side.
      val sampleLimit = math.max(256L, 32L * k1 * k2)
      val m2 = MultimodalQueries.trainFineFrom(
        img.filter(col("doc_id") < sampleLimit)
          .select(col("doc_id"), col("ei").as("embedding")), k1, k2)
      val assigned = img.select(col("doc_id"),
        KMeansTrainer.fineBucket(col("ei"), m2).as("ib"))
      val joined = aud.select(col("doc_id"),
        KMeansTrainer.fineProbeBuckets(col("ea"), m2,
          MultimodalQueries.CrossModalL1Probes,
          MultimodalQueries.CrossModalFineProbes).as("pl"))
        .join(assigned, Seq("doc_id")).localCheckpoint()
      val nQ = joined.count()
      val hit = joined.filter(array_contains(col("pl"), col("ib"))).count()
      val r = m.r
      println(f"${m.family}%-6s ${m.param}%-10s $r%8.4f ${matched}%11.4f " +
        f"$span%8.4f ${hit.toDouble / nQ}%10.4f ${math.sqrt(r)}%16.4f $r%12.4f")
      img.unpersist(); aud.unpersist()
    }
    println("// Collapse check: within each row, matched_cos ≈ √r and " +
      "span_cos ≈ r regardless of family ⇒ the front is 1-D in r; " +
      "choosing a trained weighting = choosing r. At span margin m, " +
      "r = MediaNearDupT − m and matched = √(T − m); no member dominates " +
      "another on both objectives, so the shipped encoder stays frozen.")
    spark.stop()
  }
}
