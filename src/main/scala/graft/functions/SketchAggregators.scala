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
}
