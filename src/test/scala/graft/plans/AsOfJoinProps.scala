package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property test for the native as-of exec: on random (key, time) data —
  * duplicate times, keys missing on either side, empty sides, several
  * shuffle partitions — the operator must equal a straightforward
  * in-memory reference model. */
object AsOfJoinProps extends Properties("AsOfJoinExec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  // Shared JVM-wide test session (static confs are decided by the first
  // builder to run — see SharedSparkSpec scaladoc).
  private lazy val spark: SparkSession = graft.SharedSparkSpec.session

  final case class L(lid: Long, k: Long, t: Long)
  final case class R(rid: Long, k: Long, t: Long, v: Double)

  private val genLeft: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 50L)))
  } yield rows

  private val genRight: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 50L)))
  } yield rows

  /** Reference model: last right row (max (t, rid)) with same k and t <= lt. */
  private def expected(ls: Seq[L], rs: Seq[R]): Set[(Long, Long)] =
    ls.map { l =>
      val m = rs.filter(r => r.k == l.k && r.t <= l.t)
        .sortBy(r => (r.t, r.rid)).lastOption
      (l.lid, m.map(_.rid).getOrElse(-1L))
    }.toSet

  // --- nullable-time variant: null left time matches nothing; null right
  //     time is never a match candidate. Guards the explicit tNull branch in
  //     AsOfJoinExec (a regression there would make a null-time left row
  //     inherit lastMatch from the previous same-key row).
  final case class LN(lid: Long, k: Long, t: Option[Long])
  final case class RN(rid: Long, k: Long, t: Option[Long], v: Double)

  private val genOptTime: Gen[Option[Long]] =
    Gen.frequency(1 -> Gen.const(None), 4 -> Gen.chooseNum(0L, 50L).map(Some(_)))

  private val genLeftN: Gen[List[(Long, Option[Long])]] = for {
    n <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L), genOptTime))
  } yield rows

  private val genRightN: Gen[List[(Long, Option[Long])]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L), genOptTime))
  } yield rows

  private def expectedN(ls: Seq[LN], rs: Seq[RN]): Set[(Long, Long)] =
    ls.map { l =>
      val m = l.t match {
        case None => None
        case Some(lt) =>
          rs.filter(r => r.k == l.k && r.t.exists(_ <= lt))
            .sortBy(r => (r.t.get, r.rid)).lastOption
      }
      (l.lid, m.map(_.rid).getOrElse(-1L))
    }.toSet

  property("null times: left-null matches nothing, right-null never matches") =
    Prop.forAll(genLeftN, genRightN) { (lRaw, rRaw) =>
      import spark.implicits._
      val ls = lRaw.zipWithIndex.map { case ((k, t), i) => LN(i.toLong, k, t) }
      val rs = rRaw.zipWithIndex.map { case ((k, t), i) => RN(i.toLong, k, t, i / 2.0) }
      val lDf = ls.toDF()
      val rDf = rs.toDF()
      val out = AsOfJoin.asof(
        lDf, rDf,
        leftKey = lDf("k"), rightKey = rDf("k"),
        leftTime = lDf("t"), rightTime = rDf("t"),
        rightTieBreak = Seq(rDf("rid")))
      val got = out.select(
        lDf("lid"), org.apache.spark.sql.functions.coalesce(
          rDf("rid"), org.apache.spark.sql.functions.lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expectedN(ls, rs)
    }

  property("native as-of equals reference model") =
    Prop.forAll(genLeft, genRight) { (lRaw, rRaw) =>
      import spark.implicits._
      val ls = lRaw.zipWithIndex.map { case ((k, t), i) => L(i.toLong, k, t) }
      val rs = rRaw.zipWithIndex.map { case ((k, t), i) => R(i.toLong, k, t, i / 2.0) }
      val lDf = ls.toDF()
      val rDf = rs.toDF()
      val out = AsOfJoin.asof(
        lDf, rDf,
        leftKey = lDf("k"), rightKey = rDf("k"),
        leftTime = lDf("t"), rightTime = rDf("t"),
        rightTieBreak = Seq(rDf("rid")))
      val got = out.select(
        lDf("lid"), org.apache.spark.sql.functions.coalesce(
          rDf("rid"), org.apache.spark.sql.functions.lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expected(ls, rs)
    }
}
