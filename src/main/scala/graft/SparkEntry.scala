package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 is one entry in [[queries]];
  * each oracle-checkable one has its DuckDB SQL in [[oracleSql]].
  */
object SparkEntry {

  /** The full engine inventory, in SURVEY.md §2 order. */
  val engineQueries: Seq[EngineQuery] =
    operators.RelationalQueries.all ++
      operators.WindowQueries.all ++
      functions.ScalarFuncQueries.all ++
      streaming.StreamingQueries.all ++
      operators.TextQueries.all ++
      operators.SimilarityQueries.all ++
      functions.UdfQueries.all ++
      functions.SketchQueries.all ++
      operators.SinkQueries.all ++
      operators.MultimodalQueries.all ++
      operators.AdvancedQueries.all ++
      operators.TrainingDataQueries.all ++
      operators.GraphQueries.all ++
      operators.EvalQueries.all ++
      operators.ExperimentQueries.all ++
      operators.CurationQueries.all

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.q10Body(new Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    engineQueries.map(q => q.name -> ((s: SparkSession, dir: String) => q.run(s, dir))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q24 MinHash banding, q35 SimHash, q37 IVF — approximate/bit-level;
    * driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    engineQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
