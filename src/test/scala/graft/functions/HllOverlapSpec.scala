package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q167 (HLL audience overlap): the claims under test are (1) the emitted
  * rows satisfy the inclusion–exclusion identity they advertise
  * (est_inter = max(0, est_a + est_b − est_union)), (2) every pairwise
  * intersection estimate lands within the composed sketch error of the
  * EXACT intersection (each of the three estimates carries lgK=12 rsd ≈
  * 1.6%; the error budget scales with the UNION size, not the
  * intersection), and (3) all C(5,2) event-type pairs are present exactly
  * once, a < b.
  */
class HllOverlapSpec extends SharedSparkSpec {

  // sf0.01: 150 distinct users, so pairwise audience overlaps are genuinely
  // partial (at sf0.001 every event type covers all 15 users and the
  // intersection test would be vacuous)
  private val sf = "/root/testdata/sf0.01"

  private def rows = SketchQueries.q167.run(spark, sf).collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))

  test("q167: all unordered event-type pairs present once, a < b") {
    val r = rows
    val types = new graft.Tables(spark, sf).events
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(r.forall { case (a, b, _, _, _, _) => a < b })
    assert(r.map(x => (x._1, x._2)).toSet ==
      (for (a <- types; b <- types if a < b) yield (a, b)).toSet)
  }

  test("q167: emitted rows satisfy the inclusion-exclusion identity") {
    rows.foreach { case (a, b, ea, eb, eu, ei) =>
      assert(ei == math.max(0L, ea + eb - eu), s"($a,$b): $ei != max(0, $ea+$eb-$eu)")
    }
  }

  test("q167: intersection estimates within composed sketch error of exact") {
    val t = new graft.Tables(spark, sf)
    val users = t.events.select(col("event_type"), col("user_id")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val rsd = 1.04 / math.sqrt(1 << 12)
    rows.foreach { case (a, b, _, _, eu, ei) =>
      val exact = (users(a) & users(b)).size
      // three estimates compose; each errs ~rsd of ITS cardinality, so the
      // bound is relative to the union (plus 1 for integer truncation)
      val tol = 5 * rsd * eu + 3
      assert(math.abs(ei - exact) <= tol,
        s"($a,$b): est $ei vs exact $exact, tol $tol")
    }
  }
}
