package graft.operators

import graft.SharedSparkSpec
import graft.plans.PlanMetrics
import org.apache.spark.sql.functions._

/** q180's basket-size guard: the map-side pair explode is per-basket
  * quadratic, so a pathological basket must degrade to its MaxBasketParts
  * highest-support parts instead of handing one task m²/2 pair rows. The
  * explosion is measured at the GenerateExec's own runtime metric — the
  * rows that actually flowed, not a plan-string claim.
  */
class BasketLiftSpec extends SharedSparkSpec {

  test("a pathological basket explodes capped: top-support parts only") {
    import spark.implicits._
    // Orders 1 and 2 both hold parts 1..10 (support 2 each); order 1 is a
    // 100-part monster whose parts 11..100 appear nowhere else (support 1).
    val d = ((1 to 100).map(p => (1L, p.toLong)) ++
      (1 to 10).map(p => (2L, p.toLong)))
      .toDF("l_orderkey", "l_partkey")
    // cap = 10: order 1 degrades to its 10 highest-support parts = 1..10.
    val capped = PlanMetrics.run(AdvancedQueries.basketLift(d, 10))
    // 45 pairs from each of the two (now identical) baskets.
    assert(capped.generateOutputRows == Seq(90L))
    // Uncapped, order 1 alone explodes C(100,2) = 4950 pair rows.
    val uncapped = PlanMetrics.run(AdvancedQueries.basketLift(d, 1000))
    assert(uncapped.generateOutputRows == Seq(4995L))
    // The surviving pairs (n_ab >= 2) are exactly the 45 among the
    // high-support parts — the slice sheds only pairs the support floor
    // would have killed anyway, so here capped output == uncapped output.
    val out = AdvancedQueries.basketLift(d, 10).collect()
    assert(out.length == 45)
    assert(out.forall(r => r.getLong(0) <= 10 && r.getLong(1) <= 10))
    assert(AdvancedQueries.basketLift(d, 1000).collect().toSeq == out.toSeq)
  }

  private val sf1 = "/root/testdata/sf0.1"

  test("q180 at sf0.1: explode rows == sum of per-basket m(m-1)/2, cap slack") {
    val t = new graft.Tables(spark, sf1)
    val d = t.lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val cap = AdvancedQueries.MaxBasketParts
    val m = least(col("m"), lit(cap))
    val expected = d.groupBy("l_orderkey")
      .agg(countDistinct(col("l_partkey")).as("m"))
      .filter(col("m") >= 2)
      .agg(sum((m * (m - 1) / 2).cast("long")))
      .head().getLong(0)
    val maxBasket = d.groupBy("l_orderkey")
      .agg(countDistinct(col("l_partkey")).as("m"))
      .agg(max(col("m"))).head().getLong(0)
    // The fixture's biggest basket sits far under the cap, so the oracle
    // (uncapped SQL) remains an exact hash-match of the capped engine.
    assert(maxBasket <= cap / 2, s"fixture basket $maxBasket vs cap $cap")
    // The explode bound holds at ARTIFACT-BUILD time (since round 9 the
    // pair table is the memoized basket artifact shared by q180/q204) —
    // measure the uncached build path directly.
    val items = d.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_i"))
    val r = PlanMetrics.run(AdvancedQueries.basketPairs(d, items, cap))
    assert(r.generateOutputRows == Seq(expected),
      s"pair explode emitted ${r.generateOutputRows}, bound $expected")
    // And the SERVED q180 plan reads the checkpointed artifact: no
    // Generate left — re-exploding per report would defeat the memo.
    val served = PlanMetrics.run(
      graft.SparkEntry.queries("q180_basket_lift")(spark, sf1))
    assert(served.generateOutputRows.isEmpty,
      s"served q180 re-ran the explode: ${served.generateOutputRows}")
  }
}
