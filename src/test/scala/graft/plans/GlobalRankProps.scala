package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property test for [[graft.functions.GlobalRank]] — the shared
  * range-exchange global-ranking core behind q152 (global ids), q196 (AUC
  * rank-sum) and q200 (conformal order statistic). On random value lists
  * (duplicates, skewed runs, empty, singleton, sizes straddling the
  * partition count) the assigned gids must be exactly the 0-based ranks of
  * the (value, id) total order — i.e. a permutation of 0..n−1 agreeing
  * with a driver-side sort.
  */
object GlobalRankProps extends Properties("GlobalRank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = graft.SharedSparkSpec.session

  private val genVals: Gen[List[Long]] = for {
    n <- Gen.chooseNum(0, 200)
    // Narrow value domain → heavy duplicate runs, the case that breaks
    // naive range partitioning without the unique-id tiebreaker.
    rows <- Gen.listOfN(n, Gen.chooseNum(0L, 20L))
  } yield rows

  property("gid equals the driver-side (value, id) sort rank") =
    Prop.forAll(genVals) { vals =>
      import spark.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .toDF("v", "id")
      val out = graft.functions.GlobalRank
        .withGlobalId(df, Seq(col("v"), col("id")), partitions = 7)
        .collect()
        .map(r => ((r.getAs[Long]("v"), r.getAs[Long]("id")), r.getAs[Long]("gid")))
        .toMap
      val expected = vals.zipWithIndex
        .map { case (v, i) => (v, i.toLong) }
        .sorted
        .zipWithIndex
        .map { case (k, rank) => k -> rank.toLong }
        .toMap
      out == expected
    }

  property("withGlobalIdAndCount's total equals the true row count") =
    Prop.forAll(genVals) { vals =>
      import spark.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .toDF("v", "id")
      // The total comes from the offset pass, not a separate count() job —
      // q200/q208/q212 size their percentile target ranks off it, so a
      // drifted total silently selects the wrong order statistic.
      val (ranked, n) = graft.functions.GlobalRank
        .withGlobalIdAndCount(df, Seq(col("v"), col("id")), partitions = 7)
      n == vals.length.toLong && ranked.count() == n
    }
}
