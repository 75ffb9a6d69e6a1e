package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** [[HammingCosineReject]] — the fused nightly-ingest decision kernel:
  * TRUE iff some packed entry with id < idBound sits at Hamming ≤ slack
  * AND round4(cosine) ≥ threshold. Pins (1) parity of the interpreted and
  * codegen paths against a Scala mirror on randomized packed buckets,
  * (2) the idBound cut (ledger scan = MaxValue, batch scan = own id),
  * (3) the round4 boundary (raw just below T that ROUNDS to T must
  * reject — the BigDecimal HALF_UP contract the join-row form had), and
  * (4) null propagation for absent ledger buckets under a left join. */
class HammingCosineRejectSpec extends SharedSparkSpec {
  import spark.implicits._

  private val Dim = 8
  private val Slack = 20
  private val T = 0.9

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      nx += a(i).toDouble * a(i).toDouble
      ny += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mirror(
      entries: Seq[(Long, Long, Array[Float])],
      qsig: Long, qemb: Array[Float], bound: Long): Boolean =
    entries.exists { case (id, sig, emb) =>
      id < bound &&
        java.lang.Long.bitCount(sig ^ qsig) <= Slack &&
        round4(cos(emb, qemb)) >= T
    }

  private def kernelCol(bound: org.apache.spark.sql.Column) =
    HammingCosineReject(col("ids"), col("sigs"), col("embs"),
      array(col("qsig")), col("qemb"), bound, 1, Slack, Dim, T)

  private def evalKernel(
      entries: Seq[(Long, Long, Array[Float])],
      qsig: Long, qemb: Array[Float], bound: Long,
      codegen: Boolean): Boolean = {
    val sorted = entries.sortBy(_._1)
    val df = Seq((sorted.map(_._1), sorted.map(_._2),
        sorted.flatMap(_._3.toSeq), qsig, qemb.toSeq, bound))
      .toDF("ids", "sigs", "embs", "qsig", "qemb", "bound")
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, codegen.toString)
      df.select(kernelCol(col("bound")).as("r")).head().getBoolean(0)
    } finally spark.conf.set(key, prev)
  }

  test("randomized parity vs the Scala mirror, interpreted and codegen") {
    val rnd = new scala.util.Random(42)
    def vec(seedFrom: Array[Float]): Array[Float] =
      if (seedFrom.nonEmpty && rnd.nextBoolean())
        // near-dup of an existing vector: tiny perturbation
        seedFrom.map(v => v + (rnd.nextFloat() - 0.5f) * 0.01f)
      else Array.fill(Dim)(rnd.nextFloat() * 2f - 1f)
    for (trial <- 1 to 30) {
      val qemb = Array.fill(Dim)(rnd.nextFloat() * 2f - 1f)
      val qsig = rnd.nextLong()
      val n = 1 + rnd.nextInt(12)
      val entries = (1 to n).map { i =>
        val base = if (rnd.nextInt(3) == 0) qemb else Array.empty[Float]
        // signatures near the query half the time so the Hamming gate
        // passes often enough to exercise the cosine branch
        val sig = if (rnd.nextBoolean()) qsig ^ (rnd.nextLong() & 0xFFL)
                  else rnd.nextLong()
        (i.toLong * 7, sig, vec(base))
      }
      val bound = if (rnd.nextBoolean()) Long.MaxValue
                  else entries(rnd.nextInt(entries.length))._1
      val want = mirror(entries, qsig, qemb, bound)
      assert(evalKernel(entries, qsig, qemb, bound, codegen = false) == want,
        s"trial $trial interpreted")
      assert(evalKernel(entries, qsig, qemb, bound, codegen = true) == want,
        s"trial $trial codegen")
    }
  }

  test("idBound: ledger scan sees everything, batch scan only lower ids") {
    val dup = Array.fill(Dim)(0.5f)
    val entries = Seq((10L, 0L, dup), (20L, 0L, dup))
    // Query identical to the entries, signature identical: all admit.
    assert(evalKernel(entries, 0L, dup, Long.MaxValue, codegen = true))
    // Bound 10: entry 10 is NOT < 10, entry 20 is past the bound — false.
    assert(!evalKernel(entries, 0L, dup, 10L, codegen = true))
    // Bound 20: entry 10 qualifies.
    assert(evalKernel(entries, 0L, dup, 20L, codegen = true))
  }

  test("round4 boundary: raw below T that rounds to T still rejects") {
    // Construct a pair with cosine slightly below 0.9 but ≥ 0.89995 so
    // round4 lands exactly on 0.9: unit-ish 2D-in-8D vectors at the
    // needed angle. cos θ = 0.89997 → round4 = 0.9.
    val target = 0.89997
    val a = Array.fill(Dim)(0f); a(0) = 1f
    val b = Array.fill(Dim)(0f)
    b(0) = target.toFloat
    b(1) = math.sqrt(1 - target * target).toFloat
    val raw = cos(a, b)
    assume(raw < T && round4(raw) >= T,
      s"fixture must sit in the rounding band, got $raw")
    assert(evalKernel(Seq((1L, 0L, b)), 0L, a, Long.MaxValue, codegen = false))
    assert(evalKernel(Seq((1L, 0L, b)), 0L, a, Long.MaxValue, codegen = true))
    // And one safely below the band must admit (no rejection).
    val c = Array.fill(Dim)(0f); c(0) = 0.8f; c(1) = 0.6f
    assert(!evalKernel(Seq((1L, 0L, c)), 0L, a, Long.MaxValue, codegen = true))
  }

  test("null packed arrays (absent ledger bucket) yield null, not a crash") {
    val df = Seq((Option.empty[Seq[Long]], 0L, Seq.fill(Dim)(0.5f), 5L))
      .toDF("ids", "qsig", "qemb", "bound")
    val r = df.select(HammingCosineReject(
      col("ids"), lit(null).cast("array<bigint>"),
      lit(null).cast("array<float>"),
      array(col("qsig")), col("qemb"), col("bound"),
      1, Slack, Dim, T).as("r")).head()
    assert(r.isNullAt(0), "null inputs must propagate null")
  }
}
