package graft.sources

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q117's maintenance pass: compaction must (a) actually collapse the file
  * count to the byte-target bin-packing, (b) round-trip every row, and
  * (c) do it WITHOUT a shuffle — coalesce merges read partitions; an
  * exchange in the compact plan would move every byte of a 100 TB table
  * through the network for nothing. */
class CompactionSpec extends SharedSparkSpec {

  test("compact collapses a fragmented directory losslessly, no shuffle") {
    val li = new Tables(spark, sf001).lineitem
    val frag = tmpDir("frag")
    li.write.mode("overwrite").option("maxRecordsPerFile", 200).parquet(frag)

    val fragFiles = new java.io.File(frag).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(fragFiles > 10, s"fixture not fragmented: $fragFiles files")

    val out = tmpDir("compact")
    val (before, after, total) =
      LayoutWriter.compact(spark, frag, out, targetBytes = 1L << 20)
    assert(before == fragFiles)
    val expectedOut = math.max(1, math.ceil(total.toDouble / (1L << 20)).toInt)
    assert(after == expectedOut, s"expected $expectedOut files, got $after")
    assert(after < before)

    // lossless: same multiset of rows
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)

    // no exchange: the compact write plan is scan -> coalesce -> write
    val plan = spark.read.parquet(frag).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
  }

  test("already-compact directory stays at one file and round-trips") {
    val nation = new Tables(spark, sf001).nation
    val in = tmpDir("compact_in")
    nation.coalesce(1).write.mode("overwrite").parquet(in)
    val out = tmpDir("compact_out")
    val (before, after, _) =
      LayoutWriter.compact(spark, in, out, targetBytes = 64L << 20)
    assert(before == 1 && after == 1)
    assert(spark.read.parquet(out).count() == nation.count())
  }
}
