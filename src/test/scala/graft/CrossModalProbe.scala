package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the cross-modal retrieval frontier (q220): the population
  * and per-stage wall time of the probe-side pair join — probed pairs
  * (the Σ|q_b|·|i_b| Hamming-eval compute), sketch-admitted candidates,
  * verify fetch, top-1, and the full audit. Usage:
  * sbt "Test/runMain graft.CrossModalProbe <sfDir>" (test scope). */
object CrossModalProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.CrossModalProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Decade-sized shuffle width (BenchOne's convention): per-task state
    // must not grow with the corpus.
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = new graft.Tables(spark, sfDir)
    import graft.operators.MultimodalQueries._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    println(s"== cross-modal (q220 decomposition) ==")
    timed("image index build (packed)") { crossModalImageIndex(t).count() }
    timed("audio probe frame build") { crossModalAudioProbes(t).count() }
    // Both standing frames are cached pre-partitioned (cacheStanding) —
    // no per-run repartition, matching the engine's serving shape.
    val idx = crossModalImageIndex(t)
    val probes = crossModalAudioProbes(t)
    // Hamming-eval population Σ|q_b|·|i_b| — now an arithmetic SUM over the
    // packed index's per-bucket sizes, not a materialized pair join.
    val probedPairs = timed("probed pairs (Σ|q_b|·|i_b|)") {
      probes.groupBy("bucket").count().as("q")
        .join(idx.select(col("bucket"), size(col("ids")).as("n")).as("i"), "bucket")
        .agg(sum(col("count") * col("n"))).head().getLong(0)
    }
    val perProbeHits = timed("fused scan (per-probe top1)") {
      probes
        .join(idx.hint("shuffle_hash"), Seq("bucket"))
        .select(graft.functions.HammingCosineTop1(
          col("ids"), col("sigs"), col("embs"),
          array(col("sig0"), col("sig1"), col("sig2"), col("sig3")),
          col("qemb"), 4, CrossModalHammingSlack, 64).as("tc"))
        .filter(col("tc").isNotNull)
        .count()
    }
    // Stage isolation: alignment (id-join exact cosine over both corpus
    // frames), shortlist+fetch+top1 (the retrieval tail), then full audit.
    import graft.functions.CosineSimilarity
    val img = mediaPixelEmbeddings(t)
    val aud = audioSampleEmbeddings(t)
    timed("alignment only") {
      img.select(col("doc_id"), col("embedding").as("ei"))
        .join(aud.select(col("doc_id"), col("embedding").as("ea")), Seq("doc_id"))
        .select(col("doc_id"), round(CosineSimilarity(col("ei"), col("ea")), 4).as("a"))
        .filter(col("a") >= CrossModalAlignT).count()
    }
    timed("fused scan + global top1") { crossModalTop1Probe(t).count() }
    timed("full q220 audit (warm 1)") { q220.run(spark, sfDir).count() }
    timed("full q220 audit (warm 2)") { q220.run(spark, sfDir).count() }
    println(s"  rows: probedPairs=$probedPairs perProbeHits=$perProbeHits")
    spark.stop()
  }
}
