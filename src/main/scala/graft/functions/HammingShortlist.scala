package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Top-`m` ids by (Hamming distance asc, id asc) of a PACKED per-bucket
  * signature array against one query signature, admission capped at
  * `slack` — the fused candidate-formation kernel of the cross-modal
  * retrieval family (q220/q224/q231).
  *
  * Why an expression and not a join condition: the previous shape joined
  * the multi-probe query frame to the flat (id, bucket, sig) index on
  * `bucket` and evaluated `bit_count(xor)` per JOINED ROW. The Hamming-eval
  * population is probes·N·n_c (N^1.5 under k = √N blocking) and each eval
  * paid full join-row machinery (row materialization, condition projection,
  * output row construction) — measured as q220's super-linear decade term
  * (6.8×/14.4× warm per decade, 188 s warm at sf100x). Worse, ALL
  * slack-admitted pairs (pair-scale, ~7×10⁸ rows at sf100x) flowed into the
  * embedding fetch joins. This kernel does the same Σ|q_b|·|i_b| Hamming
  * arithmetic as a primitive loop over two long arrays (4 XOR+POPCNT per
  * entry, no row machinery) and emits a BOUNDED top-m shortlist, so the
  * downstream fetch/verify volume is probes·m·N — linear in the corpus.
  *
  * Selection contract (the single-node mirrors in CrossModalSpec /
  * CrossModalIncrementalSpec implement exactly this): entries are scanned
  * in ascending-id order (the packed layout sorts by id at build); an entry
  * enters the shortlist iff ham ≤ slack AND ham < current m-th best; the
  * strict `<` insertion keeps the LOWER id first among equal distances —
  * so the result is the (ham asc, id asc) top-m of the slack-admitted set,
  * in that order. Fewer than m admitted entries return a shorter array.
  *
  * Children: `ids` (array<long>, n entries ascending), `sigs` (array<long>,
  * n×`words`, id-major — entry e's signature is sigs[e·words .. e·words+words)),
  * `qsig` (array<long> of `words`).
  */
case class HammingShortlist(
    first: Expression, second: Expression, third: Expression,
    words: Int, slack: Int, m: Int)
    extends TernaryExpression with ExpectsInputTypes {

  require(words > 0 && slack >= 0 && m > 0, "words, slack, m must be positive")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hamming_shortlist"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val ids = a.asInstanceOf[ArrayData]
    val sg = b.asInstanceOf[ArrayData]
    val q = c.asInstanceOf[ArrayData]
    val n = math.min(ids.numElements(), sg.numElements() / words)
    val qw = new Array[Long](words)
    var w = 0
    while (w < words) { qw(w) = q.getLong(w); w += 1 }
    val bh = Array.fill(m)(Int.MaxValue)
    val bi = new Array[Long](m)
    var e = 0
    while (e < n) {
      var h = 0; var k = 0; val off = e * words
      while (k < words) {
        h += java.lang.Long.bitCount(sg.getLong(off + k) ^ qw(k)); k += 1
      }
      if (h <= slack && h < bh(m - 1)) {
        var j = m - 1
        while (j > 0 && h < bh(j - 1)) { bh(j) = bh(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bh(j) = h; bi(j) = ids.getLong(e)
      }
      e += 1
    }
    var cnt = 0
    while (cnt < m && bh(cnt) != Int.MaxValue) cnt += 1
    val out = new Array[Long](cnt)
    System.arraycopy(bi, 0, out, 0, cnt)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n"); val e = ctx.freshName("e")
      val k = ctx.freshName("k"); val off = ctx.freshName("off")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val qw = ctx.freshName("qw"); val bh = ctx.freshName("bh")
      val bi = ctx.freshName("bi"); val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements() / $words);
         |long[] $qw = new long[$words];
         |for (int $k = 0; $k < $words; $k++) $qw[$k] = $c.getLong($k);
         |int[] $bh = new int[$m];
         |long[] $bi = new long[$m];
         |java.util.Arrays.fill($bh, java.lang.Integer.MAX_VALUE);
         |for (int $e = 0; $e < $n; $e++) {
         |  int $h = 0; int $off = $e * $words;
         |  for (int $k = 0; $k < $words; $k++) {
         |    $h += java.lang.Long.bitCount($b.getLong($off + $k) ^ $qw[$k]);
         |  }
         |  if ($h <= $slack && $h < $bh[$m - 1]) {
         |    int $j = $m - 1;
         |    while ($j > 0 && $h < $bh[$j - 1]) {
         |      $bh[$j] = $bh[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
         |    }
         |    $bh[$j] = $h; $bi[$j] = $a.getLong($e);
         |  }
         |}
         |int $cnt = 0;
         |while ($cnt < $m && $bh[$cnt] != java.lang.Integer.MAX_VALUE) $cnt++;
         |long[] $out = new long[$cnt];
         |System.arraycopy($bi, 0, $out, 0, $cnt);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HammingShortlist {
  /** Column-API entry point. */
  def apply(ids: Column, sigs: Column, qsig: Column,
      words: Int, slack: Int, m: Int): Column =
    GraftShims.column(HammingShortlist(
      GraftShims.expression(ids), GraftShims.expression(sigs),
      GraftShims.expression(qsig), words, slack, m))
}
