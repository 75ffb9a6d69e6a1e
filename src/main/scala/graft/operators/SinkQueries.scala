package graft.operators

import graft.EngineQuery
import graft.dsl._
import org.apache.spark.sql.functions.col

/** Write-path parity (SURVEY.md §2 q30 ↔ reference A8): the reference's only
  * write surface is its test harness's parquet-dataset write with
  * max_rows_per_file / max_rows_per_group control (reference
  * tests/test_parquetbatch.py:197-208). Spark equivalent:
  * DataFrameWriter.option("maxRecordsPerFile", n) (+ parquet.block.size for
  * row groups). q30 writes q10's result, reads it back, and returns it — the
  * oracle is q10's SQL, so the round-trip must be lossless.
  */
object SinkQueries {

  val q30 = EngineQuery("q30_write_roundtrip", Some(RelationalQueries.q10Sql)) { t =>
    val out = java.nio.file.Files
      .createTempDirectory("graft_q30_roundtrip").toString
    RelationalQueries.q10Body(t)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000)     // ↔ reference max_rows_per_file
      .option("parquet.block.size", 1 << 20) // ↔ reference max_rows_per_group
      .parquet(out)
    orderedByAll(t.spark.read.parquet(out))
  }

  /** ORC write/read parity: the same q10 result round-trips through ORC —
    * Spark's other first-class columnar format (vectorized reader, predicate
    * pushdown, maxRecordsPerFile all apply as with parquet). The oracle is
    * still q10's SQL: DuckDB never sees the ORC files, it re-derives the
    * expected rows from the parquet source, so the check proves the ORC
    * round-trip lossless. */
  val q75 = EngineQuery("q75_orc_roundtrip", Some(RelationalQueries.q10Sql)) { t =>
    val out = java.nio.file.Files
      .createTempDirectory("graft_q75_orc").toString
    RelationalQueries.q10Body(t)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000)
      .orc(out)
    orderedByAll(t.spark.read.orc(out))
  }

  val all: Seq[EngineQuery] = Seq(q30, q75)
}
