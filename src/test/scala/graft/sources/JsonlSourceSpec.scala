package graft.sources

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** JSONL round-trip losslessness, malformed-line tolerance in both modes,
  * and the land-to-parquet path. */
class JsonlSourceSpec extends SharedSparkSpec {

  private def docs = new Tables(spark, sf001).documents
    .select("doc_id", "lang", "text", "source", "n_chars")

  test("jsonl round-trip: write then schema'd read equals the source") {
    val dir = tmpDir("jsonl_rt")
    JsonlSource.writeJsonl(docs, s"$dir/out")
    val back = JsonlSource.readJsonlDropMalformed(spark, docs.schema, s"$dir/out")
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("malformed lines: PERMISSIVE captures them, DROPMALFORMED drops them") {
    val dir = tmpDir("jsonl_bad")
    val f = new java.io.PrintWriter(s"$dir/data.jsonl")
    f.println("""{"doc_id": 1, "lang": "en"}""")
    f.println("""{"doc_id": oops not json""")
    f.println("""{"doc_id": 3, "lang": "de"}""")
    f.close()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("lang", "string")
    // Spark disallows filtering on ONLY the corrupt-record column of a raw
    // JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize full rows.
    val audit = JsonlSource.readJsonl(spark, schema, s"$dir/data.jsonl").collect()
    assert(audit.length == 3)
    assert(audit.count(r => !r.isNullAt(r.fieldIndex("_corrupt_record"))) == 1)
    assert(audit.count(r => r.isNullAt(r.fieldIndex("_corrupt_record"))) == 2)
    val dropped = JsonlSource.readJsonlDropMalformed(spark, schema, s"$dir/data.jsonl")
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("toParquet lands jsonl into a queryable parquet table") {
    val dir = tmpDir("jsonl_land")
    JsonlSource.writeJsonl(docs, s"$dir/in")
    JsonlSource.toParquet(spark, docs.schema, s"$dir/in", s"$dir/out")
    val pq = spark.read.parquet(s"$dir/out")
    assert(pq.count() == docs.count())
    // landed table benefits from pushdown: projection + filter reach the scan
    val plan = pq.filter(col("lang") === "en").select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan.take(600))
  }
}
