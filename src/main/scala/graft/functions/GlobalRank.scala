package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking without a corpus-scale unpartitioned
  * window — the shared core of q152 (global ids), q196 (AUC rank-sum) and
  * q200 (conformal order statistic). Shape: repartitionByRange on the sort
  * key (the only exchange), sortWithinPartitions, per-partition local ids
  * from monotonically_increasing_id's (partition, offset) encoding, and a
  * collected #partitions-row count table whose prefix sums become each
  * partition's global offset (driver-sized by construction — never a
  * corpus collect). The result is ranking as a MAP-SIDE add.
  *
  * Callers must pass a sort key that is a TOTAL order (append a unique id
  * as the last column) — range partitioning on a key with heavy ties
  * cannot split a tie run across partitions, which is also why the rank is
  * well-defined without a tie rule here.
  */
object GlobalRank {

  /** Returns `df` with an additional 0-based `gid` column: the row's rank
    * in the total order of `sortCols`. */
  def withGlobalId(df: DataFrame, sortCols: Seq[Column],
      partitions: Int = 32): DataFrame =
    withGlobalIdAndCount(df, sortCols, partitions)._1

  /** Like [[withGlobalId]], but ALSO returns the total row count — the
    * offset pass already sums per-partition counts, so callers that need n
    * (percentile target ranks: q200/q208/q212) get it for free instead of
    * running a separate count() job over the corpus first. */
  def withGlobalIdAndCount(df: DataFrame, sortCols: Seq[Column],
      partitions: Int = 32): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val local = sorted
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
    // Empty partitions simply have no counts row; the prefix sum over the
    // non-empty partition ids (ascending) is still each one's offset.
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val ranked = local.join(offDf, "__pid")
      .withColumn("gid", col("__off") + col("__local"))
      .drop("__mid", "__pid", "__local", "__off")
    (ranked, acc)
  }
}
