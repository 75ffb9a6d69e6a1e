package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.dsl._

/** Measurement probe (a tool main like [[BenchOne]], not part of the served
  * surface): candidate-set recall of the q35 SimHash bands vs the exact q36
  * Jaccard pair set, and of the q49 hyperplane-LSH bands vs the unblocked
  * exact-cosine pair set. It decided whether q35/q49 could carry verified
  * twins with hard oracles the q217 way (recall 1 on this corpus, exact
  * verification on candidates) — OUTCOME, recorded on the SURVEY §2 rows
  * and in PLANS.md (round 12, item 8): they cannot. The 4×16 SimHash bands
  * miss exact J ≥ 0.5 pairs at every SF (1/28, 2/25, 29/256 at
  * sf0.001/0.01/0.1 — bit-majority signatures carry no per-pair recall
  * bound at J ≈ 0.5, and the hamming histogram this probe prints shows true
  * pairs out past the 8×8 pigeonhole radius too); q49's 8×4 banding at
  * cos ≥ 0.4 misses 12/59 exact pairs at sf0.01, and the embeddings table
  * has zero pairs at cos ≥ 0.85, so no high-similarity operating point
  * with a non-empty oracle exists. Kept as the reproduction path for those
  * numbers and as the harness to re-run if the banding schemes change.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables.forPath(spark, sfDir)

    // --- SimHash band candidates vs exact q36 pairs ---
    val exact = SparkEntry.queries("q36_dedup_ngram_jaccard")(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val sh = t.documents
      .select(col("doc_id"), graft.functions.SimHashSignature(toks(col("text"))).as("sim"))
    val bandCols = (0 until 4).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bh")))
    val bands = sh.select(col("doc_id"), col("sim"), explode(array(bandCols: _*)).as("x"))
      .select(col("doc_id"), col("sim"), col("x.band").as("band"), col("x.bh").as("bh"))
    val cand = bands.as("l").join(bands.as("r"), Seq("band", "bh"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).as("hamming"))
      .distinct().localCheckpoint()
    val exN = exact.count()
    val missed = exact.join(cand, Seq("doc_a", "doc_b"), "left_anti").localCheckpoint()
    val missN = missed.count()
    println(s"[simhash 4x16] sf=$sfDir exact_pairs=$exN candidates=${cand.count()} missed=$missN")
    // hamming distribution over ALL exact-Jaccard pairs: the 8x8-band twin
    // is recall-1 BY PIGEONHOLE for hamming <= 7, so max hamming here is
    // the number that justifies (or kills) q224.
    val sigs = sh.localCheckpoint()
    val exHam = exact
      .join(sigs.select(col("doc_id").as("doc_a"), col("sim").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sim").as("sb")), "doc_b")
      .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
    println(s"[simhash] exact-pair hamming distribution (max matters):")
    exHam.groupBy(col("hamming")).agg(count(lit(1)).as("n"))
      .orderBy(col("hamming")).show(70, false)
    // candidate cost of the 8x8 banding (the q224 scheme)
    val bandCols8 = (0 until 8).map(i =>
      struct(lit(i).as("band"),
        shiftright(col("sim"), i * 8).bitwiseAND(lit(0xFFL)).as("bh")))
    val bands8 = sh.select(col("doc_id"), explode(array(bandCols8: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
    val cand8 = bands8.as("l").join(bands8.as("r"), Seq("band", "bh"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct().localCheckpoint()
    val missed8 = exact.join(cand8, Seq("doc_a", "doc_b"), "left_anti").count()
    println(s"[simhash 8x8] candidates=${cand8.count()} missed=$missed8")

    // --- Hyperplane-LSH candidates vs unblocked exact cos >= 0.4 pairs ---
    val HyperPlanes = 32; val HpBandBits = 4; val HpBands = HyperPlanes / HpBandBits
    val rng = new scala.util.Random(20260812L)
    val planes = IndexedSeq.fill(HyperPlanes * 64)(rng.nextGaussian())
    val e = t.embeddings.select(col("vec_id"), col("embedding")).localCheckpoint()
    val exactCos = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim", round4(
        dot(col("a.embedding"), col("b.embedding")) /
          (l2norm(col("a.embedding")) * l2norm(col("b.embedding")))))
      .filter(col("cos_sim") >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos_sim"))
      .localCheckpoint()
    val sigs49 = e.select(col("vec_id"),
      graft.functions.HyperplaneSignature(col("embedding"), planes, 64).as("sig"))
    val bandCols49 = (0 until HpBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * HpBandBits).bitwiseAND(lit((1 << HpBandBits) - 1)).as("bh")))
    val bands49 = sigs49.select(col("vec_id"), explode(array(bandCols49: _*)).as("x"))
      .select(col("vec_id"), col("x.band").as("band"), col("x.bh").as("bh"))
    val cand49 = bands49.as("l").join(bands49.as("r"), Seq("band", "bh"))
      .filter(col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .distinct().localCheckpoint()
    val exC = exactCos.count()
    val missedC = exactCos.join(cand49, Seq("vec_a", "vec_b"), "left_anti").localCheckpoint()
    val missCN = missedC.count()
    val allPairs = { val n = e.count(); n * (n - 1) / 2 }
    println(s"[hplsh 8x4] sf=$sfDir vecs_allpairs=$allPairs exact_pairs=$exC " +
      s"candidates=${cand49.count()} missed=$missCN")
    println("[hplsh] exact cos distribution (where do true pairs live?):")
    exactCos.groupBy(floor(col("cos_sim") * 10).as("cos_decile"))
      .agg(count(lit(1)).as("n"), max(col("cos_sim")).as("max_cos"))
      .orderBy(col("cos_decile")).show(20, false)
    if (missCN > 0) {
      println("[hplsh] missed cos distribution:")
      missedC.groupBy(floor(col("cos_sim") * 10).as("cos_decile"))
        .agg(count(lit(1)).as("n"), max(col("cos_sim")).as("max_cos"))
        .orderBy(col("cos_decile")).show(20, false)
    }
    spark.stop()
  }
}
