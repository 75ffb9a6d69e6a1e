package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §7.6).
  *
  * AQE's skew-join (on by default in Spark 4) splits oversized shuffle
  * partitions at runtime and is the first line of defense. This utility is
  * the explicit fallback for the cases AQE can't fix — e.g. a single hot key
  * whose *build side* row must meet millions of probe rows, or joins under
  * `spark.sql.adaptive.enabled=false`: salt the skewed (probe) side into
  * `salts` sub-keys and replicate the small (build) side once per salt, so
  * one hot key spreads over `salts` tasks.
  *
  * The salt is a deterministic hash of the probe row's content, so results
  * are reproducible; correctness never depends on the salt value because
  * every build row exists under every salt.
  */
object SkewTools {

  /** Equi-join `probe ⋈ build` on `probeKey === buildKey`, with the probe
    * side salted into `salts` buckets and the build side replicated.
    * `build` must be the small side (it is broadcast after replication). */
  def saltedEquiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltCol = pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(salts))
    val saltedProbe = probe.withColumn("__salt", saltCol)
    val replicatedBuild = build.withColumn(
      "__salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedProbe
      .join(broadcast(replicatedBuild),
        saltedProbe(probeKey) === replicatedBuild(buildKey)
          && saltedProbe("__salt") === replicatedBuild("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Skewed aggregation: two-phase count/sum style aggs on a hot group key —
    * pre-aggregate on (key, salt), then combine per key. Use for aggregates
    * that decompose (sum/count/min/max); Spark's partial aggregation already
    * does this for hash aggs, so this is for the cases where the partial
    * step itself needs more parallelism on one key. */
  def saltedSum(df: DataFrame, groupKey: String, valueCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    salted
      .groupBy(col(groupKey), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(groupKey))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
