package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** Partition-pruned physical layout control (SURVEY.md §7.6) — the write-side
  * 100 TB story: directory partitioning on low-cardinality columns so
  * point/range predicates prune entire directories at planning time, plus
  * file sizing (maxRecordsPerFile ↔ reference A8 max_rows_per_file,
  * tests/test_parquetbatch.py:197-208) and within-file ordering so min/max
  * row-group statistics actually prune.
  */
object LayoutWriter {

  /** Write `df` partitioned by `partitionCols`, each file capped at
    * `maxRecordsPerFile` rows, rows sorted by `sortCols` within partitions
    * (tight row-group min/max stats → predicate pushdown skips row groups).
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 1000000L,
      mode: String = "overwrite"): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    val w: DataFrameWriter[Row] = sorted.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Bucketed table write: pre-shuffle the data into `buckets` hash buckets
    * on the join key, sorted within buckets. Two tables bucketed the same
    * way join with NO exchange and NO sort — the co-located-join layout for
    * repeatedly-joined 100 TB fact tables. (Bucketing metadata lives in the
    * catalog, hence saveAsTable.) */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      mode: String = "overwrite"): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
