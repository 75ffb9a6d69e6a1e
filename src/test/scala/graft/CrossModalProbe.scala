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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
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
    timed("image index build") { crossModalImageIndex(t).count() }
    timed("audio probe frame build") { crossModalAudioProbes(t).count() }
    val idx = crossModalImageIndex(t)
    val probes = crossModalAudioProbes(t)
      .repartition(spark.sessionState.conf.numShufflePartitions, col("bucket"))
    val probedPairs = timed("probed pairs (bucket only)") {
      probes.as("q").join(idx.as("i"), col("q.bucket") === col("i.bucket")).count()
    }
    val ham = (0 until 4)
      .map(h => bit_count(col(s"q.sig$h").bitwiseXOR(col(s"i.sig$h"))))
      .reduce(_ + _)
    val admitted = timed("sketch-admitted candidates") {
      probes.as("q").join(idx.as("i"),
        col("q.bucket") === col("i.bucket") && ham <= CrossModalHammingSlack).count()
    }
    timed("full q220 audit (warm 1)") { q220.run(spark, sfDir).count() }
    timed("full q220 audit (warm 2)") { q220.run(spark, sfDir).count() }
    println(s"  rows: probedPairs=$probedPairs admitted=$admitted")
    spark.stop()
  }
}
