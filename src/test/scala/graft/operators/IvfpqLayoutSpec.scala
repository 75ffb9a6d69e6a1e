package graft.operators

import graft.SharedSparkSpec

/** q146 (residual IVF-PQ index at rest): serving from the stored code
  * partitions must reproduce q140's top-k row-for-row, the probe
  * restriction must reach the scan as a dynamic partition filter (the
  * layout-level IVF contract), and the codes must build once per
  * (session, dir).
  */
class IvfpqLayoutSpec extends SharedSparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

  test("q146 equals q140 row-for-row (stored codes serve the same answer)") {
    val live = topk(SimilarityQueries.q140.run(spark, sf001))
    val stored = topk(SimilarityQueries.q146.run(spark, sf001))
    assert(stored == live)
    assert(stored.length == 50)
  }

  test("q146: probe restriction prunes code PARTITIONS dynamically at the scan") {
    val p = SimilarityQueries.q146.run(spark, sf001)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(p).isDefined,
      "probe buckets did not reach the codes scan as a dynamic partition filter:\n" +
        p.take(1500))
  }

  test("ivfpq code layout builds once per (session, dir)") {
    val t = new graft.Tables(spark, sf001)
    assert(SimilarityQueries.ivfpqCodesDir(t) == SimilarityQueries.ivfpqCodesDir(t))
  }
}
