package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the "trained shared encoder" lever named in the q220
  * recall/volume law (PLANS round 15): fit the BEST linear cross-modal
  * aligner W (ridge regression audio→image over the id-aligned corpus —
  * the two-tower projection head a production pipeline would train) and
  * measure whether it lifts matched-pair cosine off 0.707.
  *
  * On THIS fixture it provably cannot: aud = img + w with w the
  * suffix-hash contribution, ‖w‖ ≈ ‖img‖ and w ⊥ img in expectation, so
  * E[img | aud] ∝ aud — the Bayes-optimal regression is a scalar
  * shrinkage, and cosine is scale-invariant. The probe CONFIRMS the
  * analysis empirically (fitted-W cosine ≈ identity cosine ≈ 0.707):
  * the recall/volume law is information-theoretic ON THE FIXTURE's
  * embedding construction, not an artifact of the index — a real
  * encoder lifts matched cosine by SEEING richer shared content, which
  * a post-hoc map over these vectors cannot reconstruct.
  *
  * One job accumulates AᵀA and AᵀB (64×64 each — driver-sized normal
  * equations, the LogRegTrainer discipline); the driver solves the ridge
  * system; one more map-side pass scores the cosines. Usage:
  * sbt "Test/runMain graft.AlignerProbe <sfDir>" (test scope). */
object AlignerProbe {

  /** Solve (M + lambda I) X = B for X by Gaussian elimination with
    * partial pivoting; M is d×d row-major, B is d×d (columns = targets). */
  private def solveRidge(
      m: Array[Array[Double]], b: Array[Array[Double]], lambda: Double)
      : Array[Array[Double]] = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j) + (if (i == j) lambda else 0.0))
    val x = Array.tabulate(d, d)((i, j) => b(i)(j))
    var col = 0
    while (col < d) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < d) {
        if (math.abs(a(r)(col)) > best) { best = math.abs(a(r)(col)); piv = r }
        r += 1
      }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tmpx = x(col); x(col) = x(piv); x(piv) = tmpx
      val p = a(col)(col)
      var j = 0
      while (j < d) { a(col)(j) /= p; x(col)(j) /= p; j += 1 }
      r = 0
      while (r < d) {
        if (r != col && a(r)(col) != 0.0) {
          val f = a(r)(col)
          j = 0
          while (j < d) { a(r)(j) -= f * a(col)(j); x(r)(j) -= f * x(col)(j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    x
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.AlignerProbe <sfDir>")
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
    val t = new graft.Tables(spark, sfDir)
    import graft.operators.MultimodalQueries._

    val pairs = audioSampleEmbeddings(t).select(col("doc_id"), col("embedding").as("a"))
      .join(mediaPixelEmbeddings(t).select(col("doc_id"), col("embedding").as("b")),
        Seq("doc_id"))
      .select(col("a"), col("b"))
      .as[(Seq[Float], Seq[Float])]
      .rdd.map { case (a, b) =>
        (a.map(_.toDouble).toArray, b.map(_.toDouble).toArray) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val dim = 64
    // One job: per-partition AtA / AtB accumulation, driver-sized merge.
    val (ata, atb, n) = pairs.mapPartitions { it =>
      val ata = Array.fill(dim)(new Array[Double](dim))
      val atb = Array.fill(dim)(new Array[Double](dim))
      var n = 0L
      it.foreach { case (a, b) =>
        var i = 0
        while (i < dim) {
          val ai = a(i)
          var j = 0
          while (j < dim) { ata(i)(j) += ai * a(j); atb(i)(j) += ai * b(j); j += 1 }
          i += 1
        }
        n += 1
      }
      Iterator.single((ata, atb, n))
    }.reduce { case ((m1, b1, n1), (m2, b2, n2)) =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { m1(i)(j) += m2(i)(j); b1(i)(j) += b2(i)(j); j += 1 }
        i += 1
      }
      (m1, b1, n1 + n2)
    }
    // Ridge scaled to the data: lambda = 1e-6 * tr(AtA)/dim.
    val lambda = 1e-6 * (0 until dim).map(i => ata(i)(i)).sum / dim
    val w = solveRidge(ata, atb, lambda) // w(i)(j): row i of A -> col j of B
    val bcW = spark.sparkContext.broadcast(w)

    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }

    val (sumId, sumW, cnt) = pairs.map { case (a, b) =>
      val wv = bcW.value
      val pa = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        var s = 0.0; var i = 0
        while (i < dim) { s += a(i) * wv(i)(j); i += 1 }
        pa(j) = s; j += 1
      }
      (cos(a, b), cos(pa, b), 1L)
    }.reduce { case ((x1, y1, c1), (x2, y2, c2)) => (x1 + x2, y1 + y2, c1 + c2) }

    println(f"== aligner probe @ $sfDir (n=$n%d pairs, ridge lambda=$lambda%.3g) ==")
    println(f"  mean matched cosine, identity:      ${sumId / cnt}%.4f")
    println(f"  mean matched cosine, fitted ridge W: ${sumW / cnt}%.4f")
    println("  (≈ equal ⇒ the 0.707 regime is the Bayes limit of any post-hoc map on this fixture)")
    spark.stop()
  }
}
