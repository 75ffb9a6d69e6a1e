package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the ONE-SHOT media pair family (q218/q223 and q220): the
  * populations that determine the frontier's per-decade cost — within-block
  * pair count (the Hamming-condition join compute, Σn_c²), sketch-admitted
  * candidates, verify-fetch size, and final drops — with wall time per
  * piece. Usage: sbt "Test/runMain graft.MediaPairProbe <sfDir>" (test
  * scope — dev diagnostic, not in the library jar). */
object MediaPairProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.MediaPairProbe <sfDir>")
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

    println(s"== image one-shot (q218 decomposition) ==")
    timed("standing index build") { mediaNearDupIndex(t).count() }
    val idx = mediaNearDupIndex(t).repartition(
      spark.sessionState.conf.numShufflePartitions, col("bucket"))
    val blockPairs = timed("within-block pairs (bucket only)") {
      idx.as("a").join(idx.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .count()
    }
    val admitted = timed("sketch-admitted candidates") {
      idx.as("a").join(idx.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id") &&
          (bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) +
            bit_count(col("a.sig2").bitwiseXOR(col("b.sig2")))) <= MediaHammingSlack128)
        .count()
    }
    val dropped = timed("full dropped set (warm 1)") { mediaNearDupDropped(t).count() }
    timed("full dropped set (warm 2)") { mediaNearDupDropped(t).count() }
    timed("full q218 audit (warm)") { q218.run(spark, sfDir).count() }
    timed("full q218 audit (warm 2)") { q218.run(spark, sfDir).count() }
    // Bucket-size profile: the Σn_c² drivers.
    val prof = mediaNearDupIndex(t).groupBy("bucket").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("k"), max("n").as("max_n"),
        expr("percentile(n, 0.5)").as("med_n"),
        sum((col("n") * (col("n") - 1) / 2).cast("long")).as("sum_pairs")).head()
    println(s"  buckets=${prof.getLong(0)} max_n=${prof.getLong(1)} " +
      s"med_n=${prof.getDouble(2)} sum_pairs=${prof.getLong(3)}")
    println(s"  rows: blockPairs=$blockPairs admitted=$admitted dropped=$dropped")
    spark.stop()
  }
}
