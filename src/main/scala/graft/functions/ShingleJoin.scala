package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-token shingles ("w1 w2 .. wk") of a token array, as one fused
  * codegen kernel — the [[PqEncode]] treatment applied to the text family's
  * single hottest map expression (round 18).
  *
  * The previous formulation,
  * `array_distinct(transform(sequence(1, n−k+1), i => concat_ws(" ",
  * slice(tok, i, k))))`, is a higher-order function — CodegenFallback — so
  * every shingled document ran an interpreted lambda walk allocating a
  * slice array + ConcatWs evaluation per position, and it BROKE whole-stage
  * codegen for the enclosing stage (thread-dumped at the sf1x decade:
  * `ArrayTransform.nullSafeEval → ConcatWs.eval` was the hot frame of
  * q175's single busy task). This kernel produces the IDENTICAL array:
  *  - one shingle per window position i ∈ [0, n−k], ascending — the same
  *    positions `sequence(1, n−k+1)` enumerates on guarded input
  *    (callers filter size ≥ k first, the documented [[graft.dsl]]
  *    contract; for n < k this yields an empty array where the old form's
  *    descending-sequence quirk was undefined-by-contract);
  *  - tokens join with a single space, null elements skipped —
  *    `UTF8String.concatWs`, the exact runtime ConcatWs delegates to;
  *  - first-occurrence-order distinct over binary string equality — the
  *    `array_distinct` contract.
  */
case class ShingleJoin(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleJoin.kernel(a.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleJoin.kernel($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleJoin {
  private val Space = UTF8String.fromString(" ")

  /** The shared interpreted/codegen kernel (the generated Java calls the
    * companion's static forwarder — one implementation, no drift). */
  def kernel(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet = array_distinct's first-occurrence order over
    // UTF8String's binary equality.
    val out = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i + k <= n) {
      var j = 0
      while (j < k) {
        parts(j) = if (tokens.isNullAt(i + j)) null
                   else tokens.getUTF8String(i + j)
        j += 1
      }
      out.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** Column-API entry point, wired through [[graft.dsl.shingles]]. */
  def apply(tokens: Column, k: Int): Column =
    GraftShims.column(ShingleJoin(GraftShims.expression(tokens), k))
}
