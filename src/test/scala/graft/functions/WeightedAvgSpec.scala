package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The typed Aggregator must agree with the equivalent built-in expression
  * under partial aggregation (multiple partitions → reduce + merge paths
  * both exercised). */
class WeightedAvgSpec extends SharedSparkSpec {

  test("weighted-average aggregator matches sum(x*w)/sum(w)") {
    val li = new Tables(spark, sf001).lineitem.repartition(7)
    val wavg = udaf(WeightedAvgAggregator)
    val viaAgg = li.groupBy("l_returnflag")
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaExpr = li.groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 4).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAgg.keySet == viaExpr.keySet)
    viaAgg.foreach { case (k, v) =>
      assert(math.abs(v - viaExpr(k)) < 1e-9, s"flag $k: $v vs ${viaExpr(k)}")
    }
  }

  test("empty input yields zero, not NaN") {
    assert(WeightedAvgAggregator.finish(WeightedAvgAggregator.zero) == 0.0)
  }
}
