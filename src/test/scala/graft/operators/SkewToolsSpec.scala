package graft.operators

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salting must never change results — only how they distribute. */
class SkewToolsSpec extends SharedSparkSpec {

  test("salted equi-join equals plain join") {
    val t = new Tables(spark, sf001)
    val plain = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewTools.saltedEquiJoin(t.lineitem, t.part, "l_partkey", "p_partkey", salts = 8)
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salted sum equals plain sum") {
    val t = new Tables(spark, sf001)
    val plain = t.lineitem.groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 10000))).toSet
    val salted = SkewTools.saltedSum(t.lineitem, "l_returnflag", "l_quantity", salts = 16)
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 10000))).toSet
    assert(salted == plain)
  }
}
