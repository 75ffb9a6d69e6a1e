package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass sketch aggregators (typed Aggregator + functions.udaf — the
  * sanctioned extension surface, SURVEY.md §4.2). Both replace wide
  * "64 aggregate expressions" formulations with one object buffer per group:
  * partial buffers combine map-side, exactly like built-in aggs, so the
  * shuffle carries one small array per (group, partition).
  */
object SketchAggregators {

  /** 64-bit SimHash: per-bit majority vote over input hashes. */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) { b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Int]): Long = {
      var s = 0L; var i = 0
      while (i < 64) { if (b(i) > 0) s |= (1L << i); i += 1 }
      s
    }
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Misra-Gries heavy-hitters summary: at most `cap` counters; an unseen
    * item either claims a free counter or decrements ALL counters by one
    * (dropping zeros). Guarantees, for n items processed:
    * est(x) ≤ true(x) ≤ est(x) + n/(cap+1), and every x with
    * true(x) > n/(cap+1) survives in the summary. Merge follows the
    * mergeable-summaries construction (combine counts, subtract the
    * (cap+1)-th largest, truncate) and preserves the bound. The buffer is
    * cap entries whatever n is — the only way to track frequent items at
    * 100 TB without shuffling the item stream. */
  final class MisraGriesAgg(cap: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < cap => b.updated(x, 1L)
        case None =>
          // decrement-all: the stream item and one unit of every counter
          // annihilate (cap+1 distinct items absorbed per unit of error).
          b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val comb = b.foldLeft(a) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (comb.size <= cap) comb
      else {
        // subtract the (cap+1)-th largest count from everything, drop <= 0
        val kth = comb.values.toIndexedSeq.sorted(Ordering[Long].reverse)(cap)
        comb.flatMap { case (k, c) => if (c > kth) Some(k -> (c - kth)) else None }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Bounded top-k-per-group: keeps the k largest (value, id) pairs
    * (value desc, ties id asc) in a k-element buffer. The point vs a rank
    * window is the EXPLICIT partial-aggregation bound: every map task
    * contributes at most k rows per group to the exchange by construction
    * — the guarantee a window formulation only gets when the optimizer's
    * WindowGroupLimit pushdown applies (and k·|groups|·|partitions| is the
    * worst-case exchange either way). Deterministic for distinct ids
    * whatever the merge order: top-k under a total order is associative
    * and commutative. */
  final class TopKByAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      if (b.size < k) (b :+ x).sortWith(better)
      else if (better(x, b.last)) (b.init :+ x).sortWith(better)
      else b

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (a ++ b).sortWith(better).take(k)

    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** 64-way MinHash signature via the double-hashing family
    * g_i(x) = h1(x) + i * h2(x) (wrap-around multiply is fine — any fixed
    * bijective mixing works for a min-hash family). Input: the two base
    * hashes of one set element; output: the 64-long signature array. */
  object MinHashSigAgg extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
    final val NumHashes = 64
    override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)
    override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      val (h1, h2) = in
      var i = 0
      while (i < NumHashes) {
        val v = h1 + i.toLong * h2
        if (v < b(i)) b(i) = v
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Relative-error quantile summary in the DDSketch construction (Masson,
    * Lee, Rigollet — VLDB'19, public paper): a positive value lands in
    * exponential bucket i = ⌈log_γ(x)⌉ with γ = (1+α)/(1-α), so every value
    * in bucket i lies within relative error α of the bucket midpoint
    * 2γ^i/(γ+1). State is the bucket→count map — a few hundred entries for
    * any n at α=1% — and MERGE IS EXACT (counts add, order-invariant),
    * which is the property q149 exploits: stored per-day maps re-aggregate
    * to any coarser grain losslessly, so rolled-up quantiles carry the SAME
    * α guarantee as a direct sketch of the raw stream. Quantile extraction
    * happens downstream in plain SQL (cumulative counts over bucket order);
    * the aggregator only maintains counts. Input must be > 0. */
  final class DdSketchAgg(gamma: Double)
      extends Aggregator[Double, Map[Int, Long], Map[Int, Long]] {
    private def bucket(x: Double): Int =
      math.ceil(math.log(x) / math.log(gamma)).toInt
    override def zero: Map[Int, Long] = Map.empty
    override def reduce(b: Map[Int, Long], x: Double): Map[Int, Long] = {
      val i = bucket(x)
      b.updated(i, b.getOrElse(i, 0L) + 1L)
    }
    override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
      b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
    override def finish(b: Map[Int, Long]): Map[Int, Long] = b
    override def bufferEncoder: Encoder[Map[Int, Long]] =
      ExpressionEncoder[Map[Int, Long]]()
    override def outputEncoder: Encoder[Map[Int, Long]] =
      ExpressionEncoder[Map[Int, Long]]()
  }
}
