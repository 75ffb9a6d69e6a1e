package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest/egress with the same contract as [[JsonlSource]]: explicit
  * schema at scale (inference is an extra full pass), line-level malformed
  * -record tolerance (PERMISSIVE audit vs DROPMALFORMED throughput), and a
  * land-to-parquet step as the first pipeline action. CSV-specific care:
  * `multiLine` stays OFF by default — multi-line CSV files are NOT
  * splittable (one file = one task), which silently serializes a 100 TB
  * read; quoted newlines in source data are the one reason to accept that.
  */
object CsvSource {

  /** Audit-mode read: bad lines land in `_corrupt_record`. */
  def readCsv(spark: SparkSession, schema: StructType, header: Boolean,
      delimiter: String, path: String*): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path: _*)

  /** Throughput-mode read: malformed lines are dropped. */
  def readCsvDropMalformed(spark: SparkSession, schema: StructType, header: Boolean,
      delimiter: String, path: String*): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "DROPMALFORMED")
      .csv(path: _*)

  /** Write as CSV (egress/interchange). */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      delimiter: String = ",", mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("header", header.toString)
      .option("sep", delimiter)
      .csv(path)

  /** Land CSV into parquet — columnar layout, stats, pruning, pushdown. */
  def toParquet(spark: SparkSession, schema: StructType, csvPath: String,
      parquetPath: String, header: Boolean = true, delimiter: String = ","): Unit =
    readCsvDropMalformed(spark, schema, header, delimiter, csvPath)
      .write.mode("overwrite").parquet(parquetPath)
}
