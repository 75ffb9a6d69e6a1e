package graft.functions

import graft.SharedSparkSpec
import org.apache.spark.sql.functions.col

/** GraftExtensions.injectFunction: the codegen expressions must be callable
  * from SQL text and produce the exact values of their DataFrame wrappers
  * (one implementation behind both surfaces). */
class SqlFunctionsSpec extends SharedSparkSpec {

  test("graft_cosine is SQL-callable and matches the DataFrame helper") {
    val sql = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c")
      .head.getDouble(0)
    assert(math.abs(sql - 1.0 / math.sqrt(2.0)) < 1e-12)

    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val helper = df.select(CosineSimilarity(col("a"), col("b")).as("c")).head.getDouble(0)
    assert(sql == helper)
  }

  test("graft_minhash_sig / graft_simhash_sig are SQL-callable and consistent") {
    val row = spark.sql(
      "SELECT graft_minhash_sig(array('a b c', 'b c d')) AS mh, " +
        "graft_simhash_sig(array('a b c', 'b c d')) AS sh").head
    val mh = row.getSeq[Long](0)
    assert(mh.length == 64 && mh.forall(_ != Long.MaxValue))

    import spark.implicits._
    val df = Seq(Tuple1(Array("a b c", "b c d"))).toDF("s")
    val helperMh = df.select(MinHashSignature(col("s")).as("m")).head.getSeq[Long](0)
    assert(mh == helperMh)
    val helperSh = df.select(SimHashSignature(col("s")).as("m")).head.getLong(0)
    assert(row.getLong(1) == helperSh)
  }

  test("graft_morton is SQL-callable, arity-checked") {
    val m = spark.sql("SELECT graft_morton(3L, 1L) AS m").head.getLong(0)
    // 3 = 0b11, 1 = 0b01 -> interleave(x=11, y=01) = 0b0111 = 7
    assert(m == MortonCode.interleave(3L, 1L))
    val e = intercept[Exception](spark.sql("SELECT graft_morton(1L)").collect())
    assert(e.getMessage.contains("graft_morton expects 2 arguments")
      || e.getMessage.toLowerCase.contains("invalid number of arguments"))
  }
}
