package graft

/** Driver-contract invariants: unique names, oracle keys ⊆ query keys,
  * entry smoke, and — for every query — a successful run at sf0.001 with a
  * non-empty schema and stable row count across two runs (determinism).
  */
class ContractSpec extends SharedSparkSpec {

  test("query names are unique and oracle keys match") {
    val names = SparkEntry.engineQueries.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // SURVEY §2 core inventory is fully declared:
    val declared = names.toSet
    val core = (1 to 23).map(i => f"q$i%02d") ++ Seq("q25", "q26", "q27", "q28", "q29", "q30")
    core.foreach { prefix =>
      assert(declared.exists(_.startsWith(prefix)), s"missing $prefix from SURVEY §2")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.engineQueries) {
    test(s"${q.name}: runs, non-empty schema, deterministic count at sf0.001") {
      val df = q.run(spark, sf001)
      assert(df.columns.nonEmpty)
      val c1 = df.count()
      val c2 = q.run(spark, sf001).count()
      assert(c1 == c2)
    }
  }
}
