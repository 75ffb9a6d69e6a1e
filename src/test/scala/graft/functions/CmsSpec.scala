package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q86: the count-min guarantee must hold against exact counts —
  * never an undercount, overcount bounded by ε·N. */
class CmsSpec extends SharedSparkSpec {

  test("q86: exact <= estimate <= exact + eps * total tokens") {
    val rows = SketchQueries.q86.run(spark, sf001).collect()
    assert(rows.length == 20)
    val totalTokens = new Tables(spark, sf001).documents
      .select(explode(split(col("text"), " "))).count()
    val slack = math.ceil(0.001 * totalTokens).toLong
    rows.foreach { r =>
      val (term, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$term: CMS undercounted ($est < $exact)")
      assert(est <= exact + slack, s"$term: overcount $est > $exact + $slack")
    }
  }
}
