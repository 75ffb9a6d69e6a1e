package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline: the operators must COMPOSE — ingest
  * from JSONL, quality-filter, exact-dedup, near-dedup (MinHash buckets),
  * decontaminate against a held-out source, content-hash sample, land
  * Z-ordered parquet. Each stage runs the same logic as its oracled query;
  * the test asserts the row counts shrink monotonically, survivors are a
  * subset at every stage, and the landed table is queryable with pushdown.
  */
class PipelineSpec extends SharedSparkSpec {

  test("jsonl -> quality -> dedup -> decontaminate -> sample -> z-ordered parquet") {
    val dir = tmpDir("pipeline")
    val docs = new Tables(spark, sf001).documents

    // 0) ingest: docs arrive as JSONL, land with schema'd tolerant read
    sources.JsonlSource.writeJsonl(docs, s"$dir/raw")
    val ingested = sources.JsonlSource.readJsonlDropMalformed(
      spark, docs.schema, s"$dir/raw")
    assert(ingested.count() == docs.count())

    // 1) quality filter (q45's score >= 0.2 keeps most of this fixture)
    val tk = dsl.toks(col("text"))
    val stopRatio = size(filter(tk, x => x.isin("the", "a", "of", "and", "in", "to")))
      .cast("double") / size(tk).cast("double")
    val score = least(lit(1.0), size(tk).cast("double") / 200.0) * (lit(1.0) - stopRatio)
    val quality = ingested.filter(score >= 0.2)

    // 2) exact dedup on lower(trim(text)), min-doc_id survivor (q23 logic)
    val keyed = quality.withColumn("k", lower(trim(col("text"))))
    val keep = keyed.groupBy("k").agg(min("doc_id").as("keep_id"))
    val exactDeduped = keyed.join(keep,
      keyed("doc_id") === keep("keep_id"), "left_semi").drop("k")

    // 3) near-dedup: drop the higher doc_id of every q24 near-dup pair
    val nearPairs = SparkEntry.queries("q24_dedup_minhash")(spark, sf001)
      .select(col("doc_b").as("drop_id")).distinct()
    val nearDeduped = exactDeduped.join(nearPairs,
      exactDeduped("doc_id") === nearPairs("drop_id"), "left_anti")

    // 4) decontaminate: drop docs sharing an 8-shingle with source src0
    val contaminated = SparkEntry.queries("q50_decontaminate")(spark, sf001)
      .select(col("doc_id").as("bad_id")).distinct()
    val clean = nearDeduped.join(contaminated,
      nearDeduped("doc_id") === contaminated("bad_id"), "left_anti")

    // 5) reproducible ~20% content-hash sample (q57 predicate)
    val sampled = clean.filter(
      substring(md5(col("text").cast("binary")), 1, 2) <= "32")

    // monotone shrinkage, and every stage is a subset of the previous
    def ids(df: DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val chain = List(ingested, quality, exactDeduped, nearDeduped, clean, sampled).map(ids)
    chain.sliding(2).foreach { case List(prev, next) =>
      assert(next.subsetOf(prev))
    }
    assert(chain.last.nonEmpty && chain.last.size < chain.head.size)

    // 6) land Z-ordered on (doc_id, n_chars) and read back with pushdown
    sources.LayoutWriter.writeZOrdered(
      sampled.select("doc_id", "lang", "text", "source", "n_chars"),
      s"$dir/final", "doc_id", "n_chars")
    val landed = spark.read.parquet(s"$dir/final")
    assert(ids(landed) == chain.last)
    val plan = landed.filter(col("n_chars") > 100).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      plan.take(600))
  }
}
