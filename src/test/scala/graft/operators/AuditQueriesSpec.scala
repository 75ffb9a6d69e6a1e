package graft.operators

import graft.{SharedSparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Behavioral invariants for the round-6 audit/monitoring operators beyond
  * the driver's oracle hash: PSI algebra (q168), rendezvous-hash minimal
  * disruption (q169), EWMA fold parity against an independent local
  * reference (q170), and Benford probability algebra (q171).
  */
class AuditQueriesSpec extends SharedSparkSpec {

  test("q168: smoothed probabilities each sum to 1 and every PSI term is >= 0") {
    val rows = SparkEntry.queries("q168_psi_drift")(spark, sf001).collect()
    assert(rows.length == 10)
    // (p_a - p_b) and ln(p_a/p_b) always share a sign, so each term >= 0
    rows.foreach(r => assert(r.getAs[Double]("psi_term") >= 0.0))
    // Laplace smoothing: sum over bins of (n_i + 0.5)/(N + 5) == 1 exactly
    val na = rows.map(_.getAs[Long]("na")).sum
    val nb = rows.map(_.getAs[Long]("nb")).sum
    val pa = rows.map(r => (r.getAs[Long]("na") + 0.5) / (na + 5.0)).sum
    val pb = rows.map(r => (r.getAs[Long]("nb") + 0.5) / (nb + 5.0)).sum
    assert(math.abs(pa - 1.0) < 1e-9 && math.abs(pb - 1.0) < 1e-9)
  }

  test("q169: adding a shard only moves docs TO the new shard, churn ~ 1/9") {
    val t = Tables.forPath(spark, sf001)
    def hrw(n: Int) =
      array_max(transform(sequence(lit(0), lit(n - 1)), s =>
        struct(
          substring(md5(concat(col("doc_id").cast("string"), lit(":"), s.cast("string"))), 1, 15).as("h"),
          s.as("s")))).getField("s")
    val a = t.documents.select(col("doc_id"), hrw(8).as("s8"), hrw(9).as("s9")).collect()
    // HRW guarantee: a doc's shard changes only if the NEW shard wins
    a.foreach { r =>
      val (s8, s9) = (r.getInt(1), r.getInt(2))
      assert(s9 == s8 || s9 == 8, s"doc ${r.getLong(0)} moved $s8 -> $s9 (not the new shard)")
    }
    val moved = a.count(r => r.getInt(1) != r.getInt(2)).toDouble / a.length
    assert(moved > 0.0 && moved < 0.3, s"churn $moved should be near 1/9")
    // and the query's aggregate view agrees with the per-doc assignment
    val q = SparkEntry.queries("q169_rendezvous_shard")(spark, sf001).collect()
    assert(q.map(_.getAs[Long]("n_docs")).sum == a.length)
    assert(q.map(_.getAs[Long]("n_moved")).sum == a.count(r => r.getInt(1) != r.getInt(2)))
  }

  test("q170: distributed fold matches an independent local EWMA recursion") {
    val t = Tables.forPath(spark, sf001)
    val local: Map[Long, (Int, Double)] = t.orders
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").cast("long").as("ts"),
        col("o_orderkey"), col("o_totalprice"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        val xs = rs.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getDouble(3))
        // the textbook recursion, not the engine's higher-order aggregate
        k -> (xs.length, xs.tail.foldLeft(xs.head)((acc, x) => 0.3 * x + 0.7 * acc))
      }
    val got = SparkEntry.queries("q170_ewma")(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, e) = local(r.getAs[Long]("o_custkey"))
      assert(n >= 10 && r.getAs[Long]("n_orders") == n)
      assert(math.abs(r.getAs[Double]("ewma") - e) < 5e-5) // engine rounds to 4dp
    }
    assert(got.length == local.count(_._2._1 >= 10))
  }

  test("q171: observed first-digit probabilities cover all orders and sum to 1") {
    val rows = SparkEntry.queries("q171_benford_audit")(spark, sf001).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq.sorted == (1 to 9))
    val t = Tables.forPath(spark, sf001)
    assert(rows.map(_.getAs[Long]("n")).sum == t.orders.count())
    // Benford expectation is a fixed distribution: terms sum to 1
    assert(math.abs(rows.map(_.getAs[Double]("exp_p")).sum - 1.0) < 1e-3)
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
  }
}
