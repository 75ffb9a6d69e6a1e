package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts of the round-5 additions beyond the oracle hash-match:
  * q112's keep-first block algebra, q113's interval algebra (the properties
  * a dimension join actually relies on), q114's lossless re-layout, and
  * q115's exact Efraimidis–Spirakis parity against a local model.
  */
class HistorySamplingSpec extends SharedSparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("q112: per-doc accounting is consistent and matches a local recompute") {
    val out = run("q112_intradoc_dedup").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nBlocks, nDropped, after) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nDropped >= 1 && nDropped < nBlocks)
      assert(after >= 1)
    }
    // local model: non-overlapping 2-token blocks, keep first occurrence
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val tk = docs(r.getLong(0)).split(" ")
      val blocks = tk.grouped(2).map(_.mkString(" ")).toSeq
      val seen = scala.collection.mutable.Set[String]()
      var droppedTokens = 0
      var dropped = 0
      blocks.foreach { b =>
        if (!seen.add(b)) { dropped += 1; droppedTokens += b.split(" ").length }
      }
      assert(r.getLong(2) == blocks.size, s"n_blocks doc ${r.getLong(0)}")
      assert(r.getLong(3) == dropped, s"n_dropped doc ${r.getLong(0)}")
      assert(r.getLong(4) == tk.length - droppedTokens, s"tokens_after doc ${r.getLong(0)}")
    }
  }

  test("q113: versions are gapless, intervals abut, exactly one open version per user") {
    val rows = run("q113_scd2_history")
      .select("user_id", "version", "event_type", "valid_from", "valid_to").collect()
    val sentinel = 4102444800L
    rows.groupBy(_.getLong(0)).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length), s"user $user versions")
      sorted.foreach(r => assert(r.getLong(3) < r.getLong(4), s"user $user empty interval"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) == b.getLong(3), s"user $user gap/overlap")
          // consecutive versions must CHANGE state, else they'd have collapsed
          assert(a.getString(2) != b.getString(2), s"user $user no-op version")
        case _ =>
      }
      assert(sorted.count(_.getLong(4) == sentinel) == 1, s"user $user open versions")
    }
  }

  test("q114: re-layout is lossless (row count and key sums survive)") {
    val src = spark.read.parquet(s"$sf001/lineitem.parquet")
    val z = spark.read.parquet(SinkQueries.zorderedDir(graft.Tables.forPath(spark, sf001)))
    assert(z.count() == src.count())
    val s = src.agg(sum("l_partkey"), sum("l_suppkey")).head()
    val d = z.agg(sum("l_partkey"), sum("l_suppkey")).head()
    assert(s == d)
  }

  test("q116: as-of PIT lookup equals brute-force interval containment (no label leakage)") {
    // local model straight from the q113 output: prior state of a purchase =
    // the version whose [valid_from, valid_to) contains ts_sec - 1
    val versions = run("q113_scd2_history").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(3), r.getLong(4), r.getString(2)))).toMap
    val purchases = graft.Tables.forPath(spark, sf001).events
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("long").as("tsec"), col("value"))
      .collect()
    val expect = purchases
      .map { r =>
        val cutoff = r.getLong(1) - 1
        versions.getOrElse(r.getLong(0), Array.empty)
          .find { case (from, to, _) => from <= cutoff && cutoff < to }
          .map(_._3).getOrElse("none") -> r.getDouble(2)
      }
      .groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong,
        BigDecimal(vs.map(_._2).sum / vs.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val got = run("q116_pit_join").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (state, (n, avg)) =>
      assert(n == expect(state)._1, s"count for $state")
      assert(math.abs(avg - expect(state)._2) < 1e-3, s"avg for $state")
    }
  }

  test("q115: selection equals a local Efraimidis–Spirakis model, and is reproducible") {
    val got = run("q115_weighted_sample")
      .select("lang", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // local model over the collected fixture
    val md = java.security.MessageDigest.getInstance("MD5")
    val scored = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "lang", "text").collect().map { r =>
      val hex = md.digest(r.getString(2).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val u = (java.lang.Integer.parseInt(hex, 16) + 0.5) / 65536.0
      val w = r.getString(2).split(" ").length
      (r.getString(1), math.log(u) / w, r.getLong(0))
    }
    val expect = scored.groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
      ds.sortBy(d => (-d._2, d._3)).take(5).zipWithIndex
        .map { case (d, i) => (lang, i + 1, d._3) }.toSeq
    }.toSet
    assert(got == expect)
    val again = run("q115_weighted_sample")
      .select("lang", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == got)
  }
}
