package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** The fused per-bucket retrieval kernel (q220/q224/q231's candidate
  * formation + scoring) must equal a Scala model of its contract — exact
  * rounded cosine over the Hamming-slack-admitted entries, maximum by
  * (cos desc, id asc) — on randomized packed buckets, with interpreted
  * eval == codegen, null when nothing is admitted, and rounded-tie
  * resolution to the LOWER id. Cosine and round4 must match the engine's
  * CosineSimilarity + round(x, 4) bit-for-bit (same accumulation order,
  * same HALF_UP BigDecimal rounding). */
class HammingCosineTop1Spec extends SharedSparkSpec {

  private val Words = 4
  private val Dim = 8 // small dim keeps fixtures readable; kernel is dim-generic

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val xv = a(i).toDouble; val yv = b(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def model(
      ids: Seq[Long], sigs: Seq[Long], embs: Seq[Float],
      q: Seq[Long], qe: Seq[Float], slack: Int): Option[(Long, Double)] = {
    val admitted = ids.zipWithIndex.filter { case (_, e) =>
      (0 until Words).map(w => java.lang.Long.bitCount(sigs(e * Words + w) ^ q(w))).sum <= slack
    }
    if (admitted.isEmpty) None
    else Some(admitted
      .map { case (id, e) =>
        (id, round4(cos(qe, embs.slice(e * Dim, e * Dim + Dim)))) }
      .minBy { case (id, c) => (-c, id) })
  }

  private def run(
      ids: Seq[Long], sigs: Seq[Long], embs: Seq[Float],
      q: Seq[Long], qe: Seq[Float], slack: Int): Option[(Long, Double)] = {
    import spark.implicits._
    val row = Seq((ids, sigs, embs, q, qe)).toDF("ids", "sigs", "embs", "q", "qe")
      .select(HammingCosineTop1(col("ids"), col("sigs"), col("embs"),
        col("q"), col("qe"), Words, slack, Dim).as("t"))
      .collect().head
    if (row.isNullAt(0)) None
    else {
      val s = row.getStruct(0)
      Some((s.getLong(0), s.getDouble(1)))
    }
  }

  test("randomized buckets: codegen == Scala model across slacks") {
    val rng = new scala.util.Random(7L)
    for (trial <- 1 to 25) {
      val n = 1 + rng.nextInt(30)
      val ids = (0 until n).map(_ => rng.nextLong().abs % 10000L).distinct.sorted
      val sigs = IndexedSeq.fill(ids.length * Words)(rng.nextLong())
      val embs = IndexedSeq.fill(ids.length * Dim)(rng.nextFloat() * 2 - 1)
      val q = IndexedSeq.fill(Words)(rng.nextLong())
      val qe = IndexedSeq.fill(Dim)(rng.nextFloat() * 2 - 1)
      val slack = 60 + rng.nextInt(160)
      val expect = model(ids, sigs, embs, q, qe, slack)
      val got = run(ids, sigs, embs, q, qe, slack)
      assert(got == expect, s"trial $trial: got=$got expect=$expect")
    }
  }

  test("rounded ties resolve to the lower id; slack excludes; empty -> null") {
    // Entries 10 and 20 carry IDENTICAL (non-parallel to the query)
    // embeddings — an exact cosine tie; entry 30 is the query itself
    // (perfect cosine) but OVER the slack; entry 40 is under slack with a
    // worse cosine.
    val qe = Seq.fill(Dim)(0.5f)
    val e1 = Seq.tabulate(Dim)(i => if (i == 0) 2f else 0.5f)
    val worse = Seq.tabulate(Dim)(i => if (i < 2) -1f else 0.5f)
    val ids = Seq(10L, 20L, 30L, 40L)
    val near = Seq(1L, 0L, 0L, 0L)   // ham 1
    val far = Seq(-1L, -1L, -1L, -1L) // ham 256
    val sigs = near ++ near ++ far ++ near
    val embs = e1 ++ e1 ++ qe ++ worse
    val q = Seq(0L, 0L, 0L, 0L)
    val tieCos = round4(cos(qe, e1))
    assert(tieCos < 1.0 && tieCos > round4(cos(qe, worse)))
    // 30 (perfect cosine) is excluded by slack; 10 beats 20 on the id tie.
    assert(run(ids, sigs, embs, q, qe, 100) == Some((10L, tieCos)))
    // With slack admitting everything, 30's perfect cosine wins.
    assert(run(ids, sigs, embs, q, qe, 256) == Some((30L, 1.0)))
    // Nothing admitted -> null.
    assert(run(ids, sigs, embs, q, qe, 0) == None)
  }

  test("interpreted eval matches the DataFrame (codegen) path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val ids = Seq(1L, 2L)
    val sigs = Seq(0L, 0L, 0L, 0L, 3L, 0L, 0L, 0L)
    val embs = Seq.fill(Dim)(0.25f) ++ Seq.tabulate(Dim)(i => (i + 1).toFloat / 10)
    val q = Seq(0L, 0L, 0L, 0L)
    val qe = Seq.tabulate(Dim)(i => (i + 1).toFloat / 10)
    val litL = (xs: Seq[Long]) => Literal.create(xs.toArray, ArrayType(LongType))
    val litF = (xs: Seq[Float]) => Literal.create(xs.toArray, ArrayType(FloatType))
    val interp = HammingCosineTop1(litL(ids), litL(sigs), litF(embs),
      litL(q), litF(qe), Words, 100, Dim).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val viaDf = run(ids, sigs, embs, q, qe, 100).get
    assert((interp.getLong(0), interp.getDouble(1)) == viaDf)
    assert(Some(viaDf) == model(ids, sigs, embs, q, qe, 100))
  }
}
