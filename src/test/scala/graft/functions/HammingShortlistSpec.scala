package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** The packed-array Hamming shortlist kernel (q220/q224/q231's candidate
  * formation) must equal a Scala model of its contract — the (ham asc,
  * id asc) top-m of the slack-admitted entries, scanned in ascending-id
  * order — on randomized packed buckets, with interpreted eval == codegen,
  * and must honor the edge cases the retrieval rule depends on (ties keep
  * the LOWER id, fewer-than-m admissions return a short array, an
  * over-slack entry never enters even with shortlist space left). */
class HammingShortlistSpec extends SharedSparkSpec {

  private val Words = 4

  private def model(
      ids: Seq[Long], sigs: Seq[Long], q: Seq[Long],
      slack: Int, m: Int): Seq[Long] =
    ids.zipWithIndex
      .map { case (id, e) =>
        val h = (0 until Words)
          .map(w => java.lang.Long.bitCount(sigs(e * Words + w) ^ q(w))).sum
        (id, h)
      }
      .filter(_._2 <= slack)
      .sortBy { case (id, h) => (h, id) }
      .take(m)
      .map(_._1)

  private def run(
      ids: Seq[Long], sigs: Seq[Long], q: Seq[Long],
      slack: Int, m: Int): Seq[Long] = {
    import spark.implicits._
    Seq((ids, sigs, q)).toDF("ids", "sigs", "q")
      .select(HammingShortlist(col("ids"), col("sigs"), col("q"),
        Words, slack, m).as("out"))
      .collect().head.getSeq[Long](0)
  }

  test("randomized buckets: codegen == Scala model across slacks and caps") {
    val rng = new scala.util.Random(42L)
    for (trial <- 1 to 25) {
      val n = 1 + rng.nextInt(40)
      val ids = (0 until n).map(_ => rng.nextLong().abs % 10000L)
        .distinct.sorted
      val sigs = IndexedSeq.fill(ids.length * Words)(rng.nextLong())
      val q = IndexedSeq.fill(Words)(rng.nextLong())
      val slack = 60 + rng.nextInt(140)
      val m = 1 + rng.nextInt(8)
      val expect = model(ids, sigs, q, slack, m)
      val got = run(ids, sigs, q, slack, m)
      assert(got == expect, s"trial $trial: got=$got expect=$expect")
    }
  }

  test("ties keep the lower id; order is (ham asc, id asc)") {
    // Entries 10 and 20 have IDENTICAL signatures (ham ties); entry 30 is
    // one bit closer, entry 40 is far.
    val q = Seq(0L, 0L, 0L, 0L)
    val near = Seq(3L, 0L, 0L, 0L)            // ham 2
    val nearer = Seq(1L, 0L, 0L, 0L)          // ham 1
    val far = Seq(-1L, -1L, -1L, -1L)         // ham 256
    val ids = Seq(10L, 20L, 30L, 40L)
    val sigs = near ++ near ++ nearer ++ far
    assert(run(ids, sigs, q, 256, 2) == Seq(30L, 10L))
    assert(run(ids, sigs, q, 256, 3) == Seq(30L, 10L, 20L))
    // Slack excludes the far entry even though m has room.
    assert(run(ids, sigs, q, 10, 4) == Seq(30L, 10L, 20L))
    // Fewer admitted than m: short array, never padded.
    assert(run(ids, sigs, q, 1, 4) == Seq(30L))
    // Nothing admitted: empty array.
    assert(run(ids, sigs, q, 0, 4) == Seq.empty[Long])
  }

  test("interpreted eval matches the DataFrame (codegen) path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val ids = Seq(1L, 2L, 3L)
    val sigs = Seq(0L, 0L, 0L, 0L, 5L, 0L, 0L, 0L, -1L, 0L, 0L, 0L)
    val q = Seq(0L, 0L, 0L, 0L)
    val lit = (xs: Seq[Long]) => Literal.create(xs.toArray, ArrayType(LongType))
    val interp = HammingShortlist(lit(ids), lit(sigs), lit(q), Words, 100, 2)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == run(ids, sigs, q, 100, 2))
    assert(interp == model(ids, sigs, q, 100, 2))
  }
}
