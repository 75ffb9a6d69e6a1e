package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the cross-modal FINE-probe knee (q220's k ∝ N blocking):
  * block recall (is the query's own image doc's fine cell in its probe
  * list?) and probed-pair volume across a (p1, nprobe) grid, plus the fine
  * model's shape and cell-size skew. Block recall bounds e2e recall from
  * above; the 256-bit sketch historically loses nothing on top (the flat
  * knee measured e2e == block recall at every point). Usage:
  * sbt "Test/runMain graft.CrossModalKneeProbe <sfDir>" (test scope). */
object CrossModalKneeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.CrossModalKneeProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    import graft.functions.KMeansTrainer

    val n = t.documents.count()
    val (k1, k2) = crossModalFineK(n)
    println(s"== cross-modal fine-probe knee @ $sfDir (n=$n k1=$k1 k2=$k2 F=${k1 * k2}) ==")
    val t0 = System.nanoTime()
    val m2 = crossModalFineModel(t)
    println(f"  trained in ${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"(iters=${m2.iters}, l1 iters=${m2.l1.iters})")

    val imgB = mediaPixelEmbeddings(t)
      .select(col("doc_id"),
        KMeansTrainer.fineBucket(col("embedding"), m2).as("ib"))
      .localCheckpoint()
    val sizes = imgB.groupBy("ib").count().localCheckpoint()
    val stats = sizes.agg(
      count(lit(1)), max(col("count")),
      expr("percentile(count, 0.5)"), expr("percentile(count, 0.99)"))
      .head()
    println(s"  non-empty cells=${stats.getLong(0)} cell size " +
      s"p50=${stats.getDouble(2)} p99=${stats.getDouble(3)} max=${stats.getLong(1)}")

    val aud = audioSampleEmbeddings(t).localCheckpoint()
    // Recall denominator = the JOINED query population (docs with BOTH an
    // audio and an image row), not the raw document count: hits can only
    // come from aud ⋈ img pairs, so a doc missing either modality would
    // deflate every recall cell and skew the knee the constants are read
    // from. (On the synthetic fixtures the two counts coincide — asserted
    // by the printout — but the probe must not assume it.)
    val nQ = aud.select("doc_id")
      .join(imgB.select("doc_id"), Seq("doc_id")).count()
    if (nQ != n) println(s"  NOTE: joined query population $nQ != doc count $n")

    // FLAT baseline (the r13-shipped blocking): k = √N cells, probeBuckets.
    if (sys.env.get("KNEE_FLAT").contains("1")) {
      val km = mediaNearDupModel(t)
      val imgF = mediaPixelEmbeddings(t)
        .select(col("doc_id"),
          KMeansTrainer.coarseBucket(col("embedding"), km).as("ib"))
        .localCheckpoint()
      val sizesF = imgF.groupBy("ib").count().localCheckpoint()
      val flatNps = sys.env.get("KNEE_FLAT_NPS")
        .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(4, 8, 16, 32))
      for (np <- flatNps) {
        val pl = aud.select(col("doc_id"),
          KMeansTrainer.probeBuckets(col("embedding"), km, np).as("pl"))
        val hit = pl.join(imgF, Seq("doc_id"))
          .filter(array_contains(col("pl"), col("ib"))).count()
        val pairs = pl.select(explode(col("pl")).as("ib"))
          .groupBy("ib").count().withColumnRenamed("count", "q")
          .join(sizesF, Seq("ib"))
          .agg(sum(col("q") * col("count"))).head().getLong(0)
        println(f"  FLAT  nprobe=$np%2d  block recall=${hit.toDouble / nQ}%.4f" +
          f"  probedPairs=$pairs%12d")
      }
    }

    val p1s = sys.env.get("KNEE_P1S").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 4, 8, 16))
    val nps = sys.env.get("KNEE_NPS").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4, 8, 16, 32))
    for (p1 <- p1s; np <- nps) {
      val s0 = System.nanoTime()
      val pl = aud.select(col("doc_id"),
        KMeansTrainer.fineProbeBuckets(col("embedding"), m2, p1, np).as("pl"))
      val hit = pl.join(imgB, Seq("doc_id"))
        .filter(array_contains(col("pl"), col("ib"))).count()
      val pairs = pl.select(explode(col("pl")).as("ib"))
        .groupBy("ib").count().withColumnRenamed("count", "q")
        .join(sizes, Seq("ib"))
        .agg(sum(col("q") * col("count"))).head().getLong(0)
      println(f"  p1=$p1%2d nprobe=$np%2d  block recall=${hit.toDouble / nQ}%.4f" +
        f"  probedPairs=$pairs%12d  (${(System.nanoTime() - s0) / 1e9}%5.1fs)")
    }
    spark.stop()
  }
}
