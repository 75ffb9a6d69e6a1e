package graft.operators

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** q137's layout claim, checked at the parquet-metadata level: the written
  * files must actually CARRY a bloom filter for l_partkey (a misspelled
  * option silently writes a plain file and the query still returns correct
  * rows — only this footer check catches it), and read-back must be
  * lossless. */
class BloomLayoutSpec extends SharedSparkSpec {

  test("bloom-annotated layout carries footer bloom filters and round-trips") {
    val t = new Tables(spark, sf001)
    val dir = SinkQueries.bloomDir(t)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val conf = spark.sparkContext.hadoopConfiguration
    var bloomCols = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.foreach { rg =>
          rg.getColumns.asScala.foreach { c =>
            val col = c.getPath.toDotString
            if (col == "l_partkey") {
              assert(c.getBloomFilterOffset >= 0,
                s"no bloom filter for l_partkey in ${f.getName}")
              bloomCols += 1
            } else {
              assert(c.getBloomFilterOffset < 0,
                s"unexpected bloom on $col (write option leaked)")
            }
          }
        }
      } finally reader.close()
    }
    assert(bloomCols > 0)
    // lossless: the probe over the bloom layout equals the source probe
    val probe = spark.read.parquet(dir)
      .filter(col("l_partkey") === 42).count()
    val want = t.lineitem.filter(col("l_partkey") === 42).count()
    assert(probe == want && want > 0)
  }
}
