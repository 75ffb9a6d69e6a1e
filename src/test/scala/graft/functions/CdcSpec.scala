package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** Contract for [[CdcChunks]] (q160): exact parity with an independent
  * single-node reference, the structural invariants (coverage, length
  * bounds), determinism under re-partitioning, and the property that makes
  * CDC worth having at all — boundaries re-synchronize after an edit, so a
  * prefix insertion leaves most downstream chunk hashes intact (a
  * fixed-size blocker shares ~zero blocks after a 1-byte shift).
  */
class CdcSpec extends SharedSparkSpec {

  private val MinLen = 8
  private val MaskBits = 5
  private val MaxLen = 128

  /** Independent reference chunker: recursive scan, no shared code with the
    * expression beyond the public gear/fnv constants it is specified
    * against. */
  private def refChunks(text: String): Seq[(Long, Int)] = {
    val bytes = text.getBytes("UTF-8")
    val mask = (1L << MaskBits) - 1
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    var h = 0L
    for (i <- bytes.indices) {
      h = (h << 1) + CdcChunks.Gear(bytes(i) & 0xFF)
      val len = i - cuts.last + 1
      if ((len >= MinLen && (h & mask) == 0L) || len >= MaxLen) {
        cuts += i + 1
        h = 0L
      }
    }
    if (cuts.last < bytes.length) cuts += bytes.length
    cuts.toSeq.sliding(2).collect { case Seq(a, b) =>
      (CdcChunks.fnv1a(bytes, a, b), b - a)
    }.toSeq
  }

  private def engineChunks(texts: Seq[String]): Map[String, Seq[(Long, Int)]] = {
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Tuple1(_)), 3).map(Row.fromTuple),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    df.select(col("text"), CdcChunks(col("text"), MinLen, MaskBits, MaxLen).as("c"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getInt(1))))
      .toMap
  }

  private def corpus: Seq[String] = {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("text").limit(60).collect().map(_.getString(0)).toSeq
    docs :+ "short" :+ ("x" * 200) :+ docs.head
  }

  test("expression chunks match the independent reference exactly") {
    val got = engineChunks(corpus)
    corpus.foreach { text =>
      assert(got(text) == refChunks(text), s"mismatch for: ${text.take(40)}…")
    }
  }

  test("chunks cover the document and respect the length bounds") {
    val got = engineChunks(corpus)
    corpus.foreach { text =>
      val chunks = got(text)
      assert(chunks.map(_._2).sum == text.getBytes("UTF-8").length)
      assert(chunks.forall(_._2 <= MaxLen))
      // every chunk except the document's tail met the min-length gate
      assert(chunks.dropRight(1).forall(_._2 >= MinLen))
    }
  }

  test("chunking is invariant under partitioning") {
    val a = engineChunks(corpus)
    val b = engineChunks(corpus.reverse)
    corpus.foreach(t => assert(a(t) == b(t)))
  }

  test("boundaries resynchronize after a prefix edit (the CDC property)") {
    // resync is a property of STREAMS (many chunks); a 3-chunk document has
    // nothing downstream of the edit to survive — chunk 10 docs at a time
    val texts = corpus.filter(_.length > 100).grouped(10)
      .map(_.mkString(" ")).filter(_.length > 1500).toSeq
    assert(texts.size >= 4)
    val edited = texts.map(t => "inserted preamble that shifts every byte: " + t)
    val orig = engineChunks(texts)
    val got = engineChunks(edited)
    texts.zip(edited).foreach { case (t, e) =>
      val a = orig(t).groupBy(identity).view.mapValues(_.size).toMap
      val b = got(e).groupBy(identity).view.mapValues(_.size).toMap
      val shared = a.keysIterator.map(k => math.min(a(k), b.getOrElse(k, 0))).sum
      // a fixed-size blocker would share ~0 of a's chunks; CDC must keep
      // most of them — only the chunks around the edit may change
      assert(shared * 2 >= a.values.sum,
        s"only $shared of ${a.values.sum} chunks survived a prefix edit")
    }
  }
}
