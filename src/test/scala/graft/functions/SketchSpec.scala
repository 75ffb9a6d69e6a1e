package graft.functions

import graft.SharedSparkSpec

/** q41's sketches must land within their documented error bounds of the
  * exact answers computed in the same result row. */
class SketchSpec extends SharedSparkSpec {

  test("approx_count_distinct within 5% of exact; approx p50 near exact p50") {
    val rows = SketchQueries.q41.run(spark, sf001).collect()
    assert(rows.nonEmpty)
    val exactP50 = SketchQueries.q40.run(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"$flag: $approx vs $exact")
      val p50 = r.getDouble(3)
      assert(math.abs(p50 - exactP50(flag)) / exactP50(flag) < 0.01)
    }
  }
}
