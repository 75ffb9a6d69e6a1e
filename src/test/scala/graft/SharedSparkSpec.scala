package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession per test JVM (suites share it via getOrCreate). */
trait SharedSparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSparkSpec.session

  def sf001 = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/** The ONLY place a test SparkSession may be built. Every suite — including
  * scalacheck Properties objects, which don't extend the trait — must use
  * this session: `getOrCreate` ignores builder confs when a session already
  * exists, so a suite building its own session with fewer confs would decide
  * the STATIC confs (warehouse.dir) for the whole JVM depending on suite
  * execution order. That exact interference broke LayoutWriterSpec in
  * full-suite runs while it passed in isolation.
  */
object SharedSparkSpec {
  lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    // production registration path — strategy, rule AND SQL functions
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // warehouse.dir is a STATIC conf: it must be set before the first session
    // is built (bucketed saveAsTable in LayoutWriterSpec needs a writable one).
    .config("spark.sql.warehouse.dir", warehouseDir)
    .getOrCreate()
}
