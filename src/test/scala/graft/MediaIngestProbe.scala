package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the nightly-ingest family (q221/q225/q226): per modality,
  * the sizes that determine its cost — batch rows, store-index rows,
  * Hamming-admitted candidate pairs (ledger-side and slice-internal
  * separately), and rejected docs — with wall time per piece. Usage:
  * sbt "Test/runMain graft.MediaIngestProbe <sfDir>" (test scope — a dev
  * diagnostic must not ship in the library jar). The candidate counts are
  * the honest
  * scale denominators for PLANS' decade ratios: the assignment cost is
  * identical across modalities, so warm differences between q221/q225/q226
  * are candidate-population differences, and this prints them. */
object MediaIngestProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.MediaIngestProbe <sfDir>")
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
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    for (m <- Seq(imageIngest, audioIngest, videoIngest)) {
      println(s"== modality ${m.tag} ==")
      val idx = timed("store index (build+count)") { storeIndexOf(t, m).count() }
      val batch = timed("batch assign (count)") { batchAssignedOf(t, m).count() }
      val b = batchAssignedOf(t, m).localCheckpoint()
      val s = storeIndexOf(t, m)
      val candLedger = timed("ledger candidates") {
        b.as("b").join(s.as("s"),
          col("b.bucket") === col("s.bucket") &&
            bit_count(col("b.sig").bitwiseXOR(col("s.sig"))) <= MediaHammingSlack)
          .count()
      }
      val candInternal = timed("internal candidates") {
        b.as("a").join(b.as("c"),
          col("a.bucket") === col("c.bucket") && col("a.doc_id") < col("c.doc_id") &&
            bit_count(col("a.sig").bitwiseXOR(col("c.sig"))) <= MediaHammingSlack)
          .count()
      }
      // The join-row candidate/verify staging BELOW reproduces the
      // PRE-r16 decision shape (and q222's continuous step) so its counts
      // remain the denominators for the fused kernel's win: the shipped
      // nightly decision (incrementalDroppedOf, timed at the end) now
      // scans the packed ledger with HammingCosineReject and never forms
      // these populations as rows.
      val cand = b.as("a").join(s.as("c"),
        col("a.bucket") === col("c.bucket") &&
          bit_count(col("a.sig").bitwiseXOR(col("c.sig"))) <= MediaHammingSlack)
        .select(col("c.doc_id").as("doc_a"), col("a.doc_id").as("doc_b"))
        .localCheckpoint(eager = false)
      val candDocs = timed("candDocs distinct") {
        val d = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
        val n = d.count(); (d, n)
      }
      println(s"    candDocs=${candDocs._2}")
      val emb = m.embeddings(t)
      val fetchN = timed("fetch emb for candidates") {
        emb.join(candDocs._1, Seq("doc_id")).count()
      }
      println(s"    fetch=$fetchN")
      val rejected = timed("full decision step") { incrementalDroppedOf(t, m).count() }
      val rejected2 = timed("full decision step (2nd)") { incrementalDroppedOf(t, m).count() }
      println(s"  rows: store=$idx batch=$batch candLedger=$candLedger " +
        s"candInternal=$candInternal rejected=$rejected/$rejected2")
    }
    spark.stop()
  }
}
