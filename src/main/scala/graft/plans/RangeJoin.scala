package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the distributed answer to a pure range predicate
  * (`point BETWEEN lo AND hi` with NO equi key), which Spark otherwise
  * plans as a broadcast nested-loop join: O(|L|·|R|) comparisons and a
  * hard broadcast-size ceiling.
  *
  * Both sides map into fixed-width value bins: a point lands in exactly one
  * bin, a range covers every bin it overlaps (bounded by range_width /
  * bin_width rows). The join becomes an EQUI-join on the bin id — one
  * shuffle each side, partitionable to any cluster size — and the exact
  * range predicate filters residually. A (point, range) pair can only meet
  * in the point's single bin, so no dedup step is needed at all.
  *
  * binWidth tunes the explode-vs-selectivity tradeoff: ~the typical range
  * width is a good default (each range emits O(1) bin rows and each bin
  * pairs only near-in-value rows).
  */
object RangeJoin {

  /** Inner-join `points` to `ranges` on lo <= point <= hi. All three value
    * expressions must be numeric; output = point columns ++ range columns. */
  def binned(
      points: DataFrame, point: Column,
      ranges: DataFrame, lo: Column, hi: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val pb = points.withColumn("__bin", floor(point / binWidth).cast("long"))
    val rb = ranges.withColumn("__bin",
      explode(sequence(
        floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    pb.join(rb, Seq("__bin"))
      .filter(point >= lo && point <= hi)
      .drop("__bin")
  }
}
