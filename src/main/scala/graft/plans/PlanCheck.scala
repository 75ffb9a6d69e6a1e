package graft.plans

import org.apache.spark.sql.SparkSession

/** Dev tool: print the scan/join/exchange/aggregate skeleton of selected
  * queries' physical plans — the fast way to confirm pushdown, pruning, and
  * join strategy didn't regress. Run with the spark jars + compiled classes
  * on the classpath: `java -cp ... graft.plans.PlanCheck [names...]`.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val want: String => Boolean =
      if (args.isEmpty) _ => true else n => args.exists(n.contains)
    graft.SparkEntry.engineQueries.filter(q => want(q.name)).foreach { q =>
      println(s"===== ${q.name} =====")
      val df = q.run(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
      val plan = df.queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Scan") || l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("TakeOrdered") || l.contains("Window"))
        .map(_.take(260)).mkString("\n"))
    }
    spark.stop()
  }
}
