package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, JoinedRow, GenericInternalRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension path
  * (SURVEY.md §4.2 / §7.5.1 "performance option"): a custom LogicalPlan +
  * Strategy + SparkPlan. Production registration is
  * `spark.sql.extensions=graft.plans.GraftExtensions` (every session at
  * build time); `AsOfJoin.register` wires the same strategy onto an
  * existing session via `experimental.extraStrategies` for ad-hoc use.
  *
  * Semantics (identical to q09's union+window formulation and the DuckDB
  * LATERAL oracle): for each left row, the LAST right row of the same key
  * with rightTime <= leftTime, "last" under (rightTime, tieBreak...) order;
  * unmatched left rows get null right columns.
  *
  * Why a dedicated operator: the union+window formulation sorts
  * |left| + |right| rows together and carries every left column through the
  * window; this exec requires each side clustered on its key and sorted
  * (key, time) — Spark inserts exactly one exchange + sort per side — then
  * streams both sorted iterators through an O(n+m) merge with O(1) state
  * (one buffered match row). At 100 TB that halves the sort volume and
  * removes the unioned wide-row shuffle.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTieBreak.map(SortOrder(_, Ascending))))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered

      var curKey: UnsafeRow = null          // left key whose state is loaded
      var lastMatch: InternalRow = null     // most recent right row with time <= t

      lIt.map { lRow =>
        val k = lKeyProj(lRow)
        if (k.anyNull) {
          // null keys never equi-match
          resultProj(joined(lRow, nullRight))
        } else {
          if (curKey == null || keyOrd.compare(curKey, k) != 0) {
            curKey = k.copy()
            lastMatch = null
          }
          val tRow = lTimeProj(lRow)
          val tNull = tRow.isNullAt(0)
          if (tNull) {
            // A null left time matches nothing, regardless of scan state.
            // Do NOT fall through to the merge loop: it must not observe (or
            // emit) lastMatch for this row, and must not consume right rows
            // whose times could match later non-null left times. (Sort order
            // puts NULLS FIRST so no right row has been consumed for this
            // key yet, but this branch keeps that invariant explicit rather
            // than an accident of the ordering.)
            resultProj(joined(lRow, nullRight))
          } else {
          val t = tRow.copy()
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyProj(head)
            val c = if (rk.anyNull) -1 else keyOrd.compare(rk, k)
            if (c < 0) {
              rBuf.next() // right key with no remaining left rows (or null key)
            } else if (c == 0) {
              val rt = rTimeProj(head)
              if (rt.isNullAt(0)) {
                rBuf.next() // null time never matches; consume
              } else if (timeOrd.compare(rt, t) <= 0) {
                lastMatch = rBuf.next().copy()
              } else {
                advance = false
              }
            } else {
              advance = false
            }
          }
          resultProj(joined(lRow, if (lastMatch == null) nullRight else lastMatch))
          }
        }
      }
    }
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOfJoin.asof(orders, events, ...)`. Registers the strategy
  * on the session's public `experimental.extraStrategies` hook (idempotent). */
object AsOfJoin {

  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** As-of join `left` to `right`: per left row, the last right row of the
    * same key with rightTime <= leftTime (ties on rightTime resolved by
    * `rightTieBreak` ascending, last wins). Right columns come back null
    * for unmatched left rows. Columns must belong to the given frames. */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightTieBreak: Seq[Column] = Nil): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      Seq(GraftShims.expression(leftKey)), Seq(GraftShims.expression(rightKey)),
      GraftShims.expression(leftTime), GraftShims.expression(rightTime),
      rightTieBreak.map(GraftShims.expression))
    GraftShims.ofRows(spark, plan)
  }
}
