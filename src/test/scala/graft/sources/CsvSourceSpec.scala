package graft.sources

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CSV round-trip, malformed-line tolerance in both modes, and landing. */
class CsvSourceSpec extends SharedSparkSpec {

  private def docs = new Tables(spark, sf001).documents
    .select("doc_id", "lang", "n_chars") // no free text: commas stay simple

  test("csv round-trip: write then schema'd read equals the source") {
    val dir = tmpDir("csv_rt")
    CsvSource.writeCsv(docs, s"$dir/out")
    val back = CsvSource.readCsvDropMalformed(spark, docs.schema, header = true, ",", s"$dir/out")
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("malformed lines: PERMISSIVE captures, DROPMALFORMED drops") {
    val dir = tmpDir("csv_bad")
    val f = new java.io.PrintWriter(s"$dir/data.csv")
    f.println("doc_id,lang,n_chars")
    f.println("1,en,100")
    f.println("not-a-long,de,xyz")
    f.println("3,fr,250")
    f.close()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("lang", "string").add("n_chars", "long")
    val audit = CsvSource.readCsv(spark, schema, header = true, ",", s"$dir/data.csv").collect()
    assert(audit.length == 3)
    assert(audit.count(r => !r.isNullAt(r.fieldIndex("_corrupt_record"))) == 1)
    val dropped = CsvSource.readCsvDropMalformed(spark, schema, header = true, ",", s"$dir/data.csv")
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("toParquet lands csv into a queryable parquet table with pushdown") {
    val dir = tmpDir("csv_land")
    CsvSource.writeCsv(docs, s"$dir/in")
    CsvSource.toParquet(spark, docs.schema, s"$dir/in", s"$dir/out")
    val pq = spark.read.parquet(s"$dir/out")
    assert(pq.count() == docs.count())
    val plan = pq.filter(col("lang") === "en").select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan.take(600))
  }
}
