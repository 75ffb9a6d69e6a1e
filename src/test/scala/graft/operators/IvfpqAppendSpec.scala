package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** q186 (incremental IVF-PQ maintenance): appending a delta batch's codes
  * into the stored partition-directory layout must answer exactly like the
  * one-shot build (q146, itself pinned to the live q140), land only
  * delta-sized files inside the existing bucket dirs, and keep the DPP
  * partition prune on the serve.
  */
class IvfpqAppendSpec extends SharedSparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("q186 equals q146 row-for-row (frozen-model append == one-shot encode)") {
    val appended = topk(SimilarityQueries.q186.run(spark, sf001))
    val oneShot = topk(SimilarityQueries.q146.run(spark, sf001))
    assert(appended == oneShot)
    assert(appended.nonEmpty)
  }

  test("the append wrote only the delta vectors' codes, inside existing bucket dirs") {
    val t = new graft.Tables(spark, sf001)
    val st = SimilarityQueries.appendedCodesStats(t)
    assert(st.deltaFiles.nonEmpty)
    assert((st.baseFiles & st.deltaFiles).isEmpty)
    val deltaRows = spark.read
      .option("basePath", st.dir)
      .parquet(st.deltaFiles.toSeq: _*).count()
    assert(deltaRows == st.deltaRows)
    val expectedDelta = t.embeddings
      .filter(pmod(col("vec_id"), lit(8)) === 0).count()
    assert(deltaRows == expectedDelta)
    // Delta files live under the SAME bucket=<cell> dirs as the base —
    // the append extended inverted lists, it didn't create a parallel tree.
    def bucketOf(f: String) = f.split("/").find(_.startsWith("bucket=")).get
    val baseBuckets = st.baseFiles.map(bucketOf)
    assert(st.deltaFiles.map(bucketOf).subsetOf(baseBuckets))
    // Base + delta == the one-shot build's row count.
    val full = spark.read.parquet(SimilarityQueries.ivfpqCodesDir(t)).count()
    assert(st.baseRows + st.deltaRows == full)
  }

  test("q186: probe restriction still prunes partitions dynamically at the scan") {
    val p = SimilarityQueries.q186.run(spark, sf001)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(p).isDefined,
      "DPP prune lost after append:\n" + p.take(1500))
  }

  test("appended code layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(SimilarityQueries.appendedCodesStats(t).dir ==
      SimilarityQueries.appendedCodesStats(t).dir)
  }
}
