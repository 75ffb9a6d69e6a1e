package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties (SURVEY.md §5.2.2): parquet write→read round-trip
  * losslessness for arbitrary row content, projection exactness, and
  * toLocalIterator ≡ collect. Run by sbt's native ScalaCheck framework.
  */
object RoundtripProps extends Properties("ParquetRoundtrip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // Shared JVM-wide test session (static confs are decided by the first
  // builder to run — see SharedSparkSpec scaladoc).
  private lazy val spark: SparkSession = graft.SharedSparkSpec.session

  final case class PRow(k: Long, s: String, d: Double, tags: Seq[Long])

  private val genRow: Gen[Long => PRow] = for {
    s <- Gen.alphaNumStr.map(_.take(12))
    d <- Gen.chooseNum(-1e9, 1e9)
    tags <- Gen.listOfN(3, Gen.chooseNum(-100L, 100L))
  } yield (k: Long) => PRow(k, s, d, tags)

  private val genRows: Gen[List[PRow]] = for {
    n <- Gen.chooseNum(1, 40)
    mk <- Gen.listOfN(n, genRow)
  } yield mk.zipWithIndex.map { case (f, i) => f(i.toLong) }

  property("write-read roundtrip is lossless") = Prop.forAll(genRows) { rows =>
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
    rows.toDS().write.mode("overwrite").parquet(dir)
    val back = ParquetRowReader.fromPath(spark, dir)
      .getRows().map(m => (m("k"), m("s"), m("d"), m("tags"))).toSet
    val want = rows.map(r => (r.k, r.s, r.d, r.tags.toList)).toSet
    back == want
  }

  property("projection returns exactly the requested columns") =
    Prop.forAll(genRows, Gen.someOf("k", "s", "d", "tags")) { (rows, colsRaw) =>
      val cols = colsRaw.toList
      (cols.nonEmpty) ==> {
        import spark.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
        rows.toDS().write.mode("overwrite").parquet(dir)
        val out = ParquetRowReader.fromPath(spark, dir).getRows(cols).toList
        out.size == rows.size && out.forall(_.keySet == cols.toSet)
      }
    }

  property("toLocalIterator equals collect") = Prop.forAll(genRows) { rows =>
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
    rows.toDS().write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).orderBy("k")
    val viaIter = ParquetRowReader.fromDataFrame(df).getRows(Seq("k", "s")).toList
    val viaCollect = df.select("k", "s").collect()
      .map(r => Map("k" -> r.getLong(0), "s" -> r.getString(1))).toList
    viaIter == viaCollect
  }
}
