package graft.operators

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** q159's layout claims, checked at the parquet-metadata level and at the
  * scan metrics:
  *  1. the range exchange + in-partition sort must leave every FILE owning a
  *     disjoint ts interval (that is what makes min/max skipping effective —
  *     an unsorted write has every file spanning the whole month and nothing
  *     prunes);
  *  2. a one-day probe over the sorted copy must actually SKIP most row
  *     groups — the scan emits a fraction of the table's rows;
  *  3. the re-layout is lossless (row count preserved).
  */
class SortedLayoutSpec extends SharedSparkSpec {

  test("sorted event layout has disjoint per-file ts ranges and prunes a day probe") {
    val t = new Tables(spark, sf001)
    val dir = SinkQueries.sortedEventsDir(t)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length > 1, s"expected a multi-file layout, got ${files.length}")

    // per-file [min,max] of ts from the parquet footer statistics
    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = files.toSeq.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val stats = reader.getFooter.getBlocks.asScala.flatMap { rg =>
          rg.getColumns.asScala
            .find(_.getPath.toDotString == "ts")
            .map(_.getStatistics)
        }
        assert(stats.nonEmpty && stats.forall(s => s.hasNonNullValue),
          s"${f.getName}: ts row-group stats missing — nothing can prune")
        (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
          stats.map(_.genericGetMax.asInstanceOf[Long]).max)
      } finally reader.close()
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin,
          s"file ts ranges overlap: [..,$aMax] vs [$bMin,..] — sort not applied")
      case _ =>
    }

    // the day probe's scan must emit well under the full table (row-group
    // min/max skipping on the pushed ts predicate)
    val total = t.events.count()
    val probe = spark.read.parquet(dir)
      .filter(col("ts") >= lit("2024-01-08").cast("timestamp") &&
        col("ts") < lit("2024-01-09").cast("timestamp"))
      .groupBy("event_type").count()
    val r = graft.plans.PlanMetrics.run(probe)
    assert(r.rows > 0)
    assert(r.scanOutputRows.max < total / 2,
      s"probe scan emitted ${r.scanOutputRows.max} of $total rows — stats skipping ineffective")

    // lossless
    assert(spark.read.parquet(dir).count() == total)
  }
}
