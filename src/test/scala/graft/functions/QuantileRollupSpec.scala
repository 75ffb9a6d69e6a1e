package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q149 (DDSketch quantile rollup): re-aggregation must be lossless
  * (rolled-up per-bucket counts == a direct sketch of the whole stream),
  * and every served quantile must sit within the α=1% relative-error
  * guarantee of the exact sorted-order quantile.
  */
class QuantileRollupSpec extends SharedSparkSpec {

  test("rollup of per-day sketches equals the sketch of the whole stream") {
    val t = new Tables(spark, sf001)
    val rolled = SketchQueries.ddPerBucket(t)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

    val dd = udaf(new SketchAggregators.DdSketchAgg(SketchQueries.QGamma))
    val whole = t.events.groupBy(col("event_type")).agg(dd(col("value")).as("sk"))
      .collect().flatMap { r =>
        r.getMap[Int, Long](1).map { case (b, c) => (r.getString(0), b) -> c }
      }.toMap
    assert(rolled == whole)
    assert(rolled.nonEmpty)
  }

  test("served p50/p95/p99 are within the 1% relative-error guarantee") {
    val t = new Tables(spark, sf001)
    val served = SketchQueries.q149.run(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap

    val byType = t.events.select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    for ((tpe, vals) <- byType) {
      val (n, ests) = served(tpe)
      assert(n == vals.length, s"$tpe exact rider count")
      for ((q, est) <- Seq(0.50, 0.95, 0.99).zip(ests)) {
        // the sketch targets the ceil(q*n)-th smallest element
        val exact = vals(math.ceil(q * vals.length).toInt - 1)
        val relErr = math.abs(est - exact) / exact
        // α plus the 4dp output rounding slack
        assert(relErr <= 0.01 + 1e-3,
          s"$tpe p$q: est $est vs exact $exact (relErr $relErr)")
      }
    }
  }
}
