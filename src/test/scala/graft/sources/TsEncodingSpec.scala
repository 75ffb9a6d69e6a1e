package graft.sources

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver testdata has shipped `events.ts` under three different parquet
  * encodings across regenerations: TIMESTAMP(NANOS) (read as nanos-as-long
  * under the legacy flag), timestamp[us] without UTC adjustment (read as
  * TIMESTAMP_NTZ by Spark 4), and timestamp[us] UTC-adjusted (TimestampType).
  * A regeneration between rounds 6 and 7 silently flipped NANOS → µs-NTZ and
  * broke every query that casts ts to BIGINT. This spec pins the loader
  * contract: `Tables.normalizeTs` must load IDENTICAL instants from all three
  * encodings, so the next encoding drift is caught here instead of in the
  * correctness gate.
  */
class TsEncodingSpec extends SharedSparkSpec {

  // Instants with sub-second micros, spanning a DST boundary of a non-UTC
  // zone (would diverge if anything resolved NTZ against a local zone).
  private val micros = Seq(
    0L,                      // epoch
    1667095200123456L,       // 2022-10-30 02:00:00.123456 UTC (EU DST fold)
    1700000000000001L,
    1767225599999999L)

  private def writeFixture(kind: String): String = {
    val dir = tmpDir(s"ts_enc_$kind")
    val df: DataFrame = kind match {
      case "nanos_long" =>
        // What the legacy nanosAsLong flag yields for TIMESTAMP(NANOS)
        // files: a raw LongType column of nanoseconds.
        spark.createDataFrame(
          java.util.List.of(micros.map(m => org.apache.spark.sql.Row(m * 1000L)): _*),
          StructType(Seq(StructField("ts", LongType))))
      case "us_ntz" =>
        spark.range(1).select(explode(lit(micros.toArray)).as("us"))
          .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      case "us_utc" =>
        spark.range(1).select(explode(lit(micros.toArray)).as("us"))
          .select(timestamp_micros(col("us")).as("ts"))
    }
    df.coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("all three historical ts encodings load identical instants") {
    val loaded = Seq("nanos_long", "us_ntz", "us_utc").map { kind =>
      val df = Tables.normalizeTs(
        spark.read.parquet(s"${writeFixture(kind)}/events.parquet"), "ts")
      assert(df.schema("ts").dataType == TimestampType,
        s"$kind must normalize to TimestampType")
      val got = df.select(unix_micros(col("ts")).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
      (kind, got)
    }
    loaded.foreach { case (kind, got) =>
      assert(got == micros.sorted, s"$kind instants drifted: $got")
    }
  }

  test("Tables.events loads via the normalizer (TimestampType at sf0.001)") {
    val t = Tables.forPath(spark, sf001)
    assert(t.events.schema("ts").dataType == TimestampType)
    // epochSec must analyze — the exact cast that broke under NTZ.
    assert(t.events.select(graft.dsl.epochSec(col("ts"))).count() > 0)
  }

  test("no loaded table exposes a TIMESTAMP_NTZ column (whole drift class closed)") {
    val t = Tables.forPath(spark, sf001)
    for (df <- Seq(t.region, t.nation, t.customer, t.supplier, t.part,
        t.orders, t.lineitem, t.events, t.documents, t.embeddings);
        f <- df.schema.fields)
      assert(f.dataType != TimestampNTZType,
        s"column ${f.name} loaded as TIMESTAMP_NTZ — normalizeAllTs missed it")
  }
}
