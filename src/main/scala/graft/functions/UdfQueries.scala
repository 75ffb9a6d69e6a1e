package graft.functions

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Weighted-average typed aggregator: avg(value weighted by weight).
  * The sanctioned Spark extension point for custom aggregation
  * (Aggregator[IN, BUF, OUT] + functions.udaf — SURVEY.md §4.2): partial
  * buffers merge map-side before the shuffle, exactly like built-in aggs,
  * so it scales the same way sum()/avg() do.
  */
object WeightedAvgAggregator extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The deliberate UDF/UDAF exercise (SURVEY.md §2 q27, q28). Everywhere else
  * the engine prefers codegen'd built-ins; these two queries exist to prove
  * the extension surface works and stays correct under partial aggregation.
  */
object UdfQueries {

  val q27 = EngineQuery(
    "q27_udf_scalar",
    Some("""SELECT split_part(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ', 1) AS token,
           |       CAST(count(*) AS BIGINT) AS cnt
           |FROM documents GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val normalize = udf { s: String =>
      if (s == null) null else s.toLowerCase.trim.replaceAll("\\s+", " ")
    }
    orderedByAll(
      t.documents
        .select(element_at(split(normalize(col("text")), " "), 1).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt")))
  }

  val q28 = EngineQuery(
    "q28_udaf",
    Some("""SELECT l_returnflag,
           |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
           |       CAST(count(*) AS BIGINT) AS cnt
           |FROM lineitem GROUP BY l_returnflag ORDER BY ALL""".stripMargin)) { t =>
    val wavg = udaf(WeightedAvgAggregator)
    orderedByAll(
      t.lineitem
        .groupBy("l_returnflag")
        .agg(
          round4(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"),
          count(lit(1)).as("cnt")))
  }

  val all: Seq[EngineQuery] = Seq(q27, q28)
}
