package graft.sources

import graft.SharedSparkSpec
import org.apache.spark.sql.functions.col

/** Mirrors the reference's test matrix (1-file / 3-file-even / 3-file-uneven,
  * nested schema — reference tests/test_parquetbatch.py:242-331) but with
  * genuinely DISTINCT rows, closing the blind spot its aliasing bug created
  * (SURVEY.md §0.1/§5.1): full-content equality is asserted, not just
  * first/last/count.
  */
case class Sub(sub_field_1: String, sub_field_2: Long, sub_field_3: Double,
    sub_field_4: Seq[Long])
case class Rec(field_1: String, field_2: Long, field_3: Double, field_4: Sub,
    field_5: Seq[Sub])

class ParquetRowReaderSpec extends SharedSparkSpec {
  import spark.implicits._

  private def mkRec(i: Int) = Rec(
    field_1 = s"string_field_$i",
    field_2 = i.toLong - 5,
    field_3 = i / 3.0,
    field_4 = Sub(s"sub_$i", i.toLong * 2, i / 7.0, (0L to (i % 9).toLong).toSeq),
    field_5 = (0 until 1 + i % 4).map(j => Sub(s"sub_${i}_$j", j.toLong, j / 3.0, Seq(j.toLong))))

  /** Write rows split across one parquet dir per "file" of the given sizes. */
  private def writeDataset(rowsPerFile: Seq[Int]): (Seq[String], Seq[Rec]) = {
    val dir = tmpDir("rowreader")
    var next = 0
    rowsPerFile.zipWithIndex.foreach { case (n, fi) =>
      val recs = (next until next + n).map(mkRec)
      next += n
      recs.toDS().coalesce(1).write.mode("overwrite").parquet(s"$dir/part_$fi")
    }
    (rowsPerFile.indices.map(fi => s"$dir/part_$fi"), (0 until next).map(mkRec))
  }

  private def matrix = Seq(
    "single file" -> Seq(12),
    "multi-file even" -> Seq(10, 10, 10),
    "multi-file uneven" -> Seq(10, 10, 7))

  for ((label, sizes) <- matrix) {
    test(s"row reader: $label — count/first/last/full equality") {
      val (paths, expected) = writeDataset(sizes)
      val reader = ParquetRowReader.fromPath(spark, paths: _*)
      // Explicit total order: Spark multi-file order is not guaranteed.
      val rows = ParquetRowReader
        .fromDataFrame(reader.df.orderBy(col("field_2")))
        .getRows().toVector
      assert(rows.size == expected.size)
      assert(rows.head("field_1") == expected.head.field_1)
      assert(rows.last("field_1") == expected.last.field_1)
      // Full content, deep-lowered: struct → Map, array → Seq.
      rows.zip(expected).foreach { case (m, e) =>
        assert(m("field_2") == e.field_2)
        assert(m("field_3") == e.field_3)
        val f4 = m("field_4").asInstanceOf[Map[String, Any]]
        assert(f4("sub_field_1") == e.field_4.sub_field_1)
        assert(f4("sub_field_4").asInstanceOf[Seq[Any]] == e.field_4.sub_field_4)
        val f5 = m("field_5").asInstanceOf[Seq[Any]]
        assert(f5.size == e.field_5.size)
      }
    }
  }

  test("row reader: projection returns only requested columns") {
    val (paths, _) = writeDataset(Seq(12))
    val rows = ParquetRowReader.fromPath(spark, paths: _*)
      .getRows(Seq("field_1", "field_2")).toVector
    assert(rows.nonEmpty)
    assert(rows.forall(_.keySet == Set("field_1", "field_2")))
  }

  test("row reader: lazy iterator equals collect") {
    val (paths, _) = writeDataset(Seq(10, 10, 7))
    val df = spark.read.parquet(paths: _*).orderBy(col("field_2"))
    val lazyRows = ParquetRowReader.fromDataFrame(df).getRows(Seq("field_2")).toVector
    val collected = df.select("field_2").collect().map(_.getLong(0)).toVector
    assert(lazyRows.map(_("field_2")) == collected)
  }

  test("row reader: explicit schema + corrupt-file tolerance options") {
    val (paths, expected) = writeDataset(Seq(12))
    val schema = spark.read.parquet(paths: _*).schema
    val reader = ParquetRowReader.fromPath(spark, paths.head, schema)
    assert(reader.getRows().size == expected.size)
  }

  test("row reader: A5 scan-tuning knobs apply per reader, not per session") {
    val (paths, expected) = writeDataset(Seq(10, 10, 7))
    val before = spark.conf.get("spark.sql.parquet.columnarReaderBatchSize")
    val reader = ParquetRowReader.tuned(
      spark,
      ParquetRowReader.ScanTuning(
        batchSize = 1000, ignoreCorruptFiles = true,
        openCostInBytes = Some("1m"), maxPartitionNum = Some(16)),
      paths: _*)
    // knobs hit the reader's scoped session...
    val scoped = reader.df.sparkSession
    assert(scoped.conf.get("spark.sql.parquet.columnarReaderBatchSize") == "1000")
    assert(scoped.conf.get("spark.sql.files.openCostInBytes") == "1m")
    // ...and do NOT leak into the caller's session (reference scopes per call)
    assert(spark.conf.get("spark.sql.parquet.columnarReaderBatchSize") == before)
    assert(reader.getRows(Seq("field_2")).size == expected.size)
  }

  test("type breadth: decimal, date, map, float-array round-trip (SURVEY §1)") {
    val dir = tmpDir("typebreadth")
    val df = spark.sql(
      """SELECT id,
        |  CAST(id * 1.5 AS DECIMAL(10,2)) AS dec,
        |  DATE '2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS d,
        |  map('k', id, 'k2', id * 2) AS m,
        |  CAST(array(id * 1.0, id * 2.0) AS array<float>) AS emb
        |FROM range(20)""".stripMargin)
    df.write.mode("overwrite").parquet(dir)
    val rows = ParquetRowReader.fromDataFrame(
      spark.read.parquet(dir).orderBy("id")).getRows().toVector
    assert(rows.size == 20)
    val r5 = rows(5)
    assert(r5("dec") == new java.math.BigDecimal("7.50"))
    assert(r5("d") == java.sql.Date.valueOf("2024-01-06"))
    assert(r5("m") == Map("k" -> 5L, "k2" -> 10L))
    assert(r5("emb") == List(5.0f, 10.0f))
  }
}
