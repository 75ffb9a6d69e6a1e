package graft.plans

import graft.SharedSparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions wiring and the levenshtein length-guard rule:
  * semantics must be unchanged, the guard must appear exactly once (the
  * rule is idempotent under the optimizer's fixed-point), and a session
  * built with the extensions must plan the native as-of join without any
  * per-session register() call. */
class GraftExtensionsSpec extends SharedSparkSpec {

  private def pairs = {
    val d = new graft.Tables(spark, sf001).documents
      .select(col("doc_id"), col("lang"), col("text"))
      .filter(col("doc_id") < 60)
    d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.text").as("ta"), col("b.text").as("tb"))
  }

  test("length guard: same results, guard in optimized plan, idempotent") {
    def q = pairs.filter(levenshtein(col("ta"), col("tb")) <= 60)
      .select("da", "db")
    // NOTE: queryExecution caches per Dataset — build a FRESH q after
    // registering the rule, or the optimized plan predates it.
    val baseline = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ LevenshteinLengthGuard
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("abs((length("), optimized.take(1500))
      // idempotent: the guard is conjoined exactly once even though the
      // optimizer runs user rules to fixed point
      assert("abs\\(\\(length\\(".r.findAllIn(optimized).length == 1, optimized.take(1500))
      val guarded = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(guarded == baseline)
      assert(baseline.nonEmpty)
      // non-literal bound: the guard is a necessary condition for ANY
      // deterministic k, e.g. k = length(ta)/4 (q55's real shape)
      val qDyn = pairs.filter(
        levenshtein(col("ta"), col("tb")) <= length(col("ta")) / 4)
        .select("da", "db")
      val dynPlan = qDyn.queryExecution.optimizedPlan.toString
      assert(dynPlan.contains("abs((length("), dynPlan.take(1500))
      val dynBase = pairs.filter(
        levenshtein(col("ta"), col("tb")) <= length(col("ta")) / 4)
      assert(qDyn.count() == dynBase.count())
    } finally spark.experimental.extraOptimizations = prev
  }

  test("spark.sql.extensions session: as-of strategy + guard rule injected") {
    // A session BUILT with the extensions (the production path). getOrCreate
    // reuses the shared SparkContext but applies extensions only to a fresh
    // session, so the active/default sessions are cleared and restored.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne shared)
      // 1) the optimizer rule is active without extraOptimizations
      val d = new graft.Tables(s2, sf001).documents.limit(50)
        .select(col("doc_id"), col("text"))
      val opt = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
        .filter(levenshtein(col("a.text"), col("b.text")) <= 40)
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("abs((length("), opt.take(1500))
      // 2) the as-of strategy is active without AsOfJoin.register: plan the
      //    logical node directly and check the exec shows up.
      val ev = new graft.Tables(s2, sf001).events
      val l = ev.select(col("user_id"), col("ts"), col("event_id")).limit(100)
      // fresh attribute ids on the right: AsOfJoinPlan (unlike analyzer
      // Join) does not deduplicate a self-referencing right side
      val r = ev.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_event")).limit(100)
      import org.apache.spark.sql.GraftShims
      val lp = AsOfJoinPlan(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        Seq(GraftShims.expression(l("user_id"))), Seq(GraftShims.expression(r("r_user"))),
        GraftShims.expression(l("ts")), GraftShims.expression(r("r_ts")), Nil)
      val out = GraftShims.ofRows(s2, lp)
      // SparkPlan.nodeName strips the "Exec" suffix in plan strings
      assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin "))
      assert(out.count() == 100)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
