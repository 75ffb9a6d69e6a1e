package graft.operators

import graft.SharedSparkSpec
import org.apache.spark.sql.functions._

/** The depth-probed degrade path of q60's label propagation: on a deep
  * chain (the adversarial graph near-dup corpora don't produce but long
  * re-post chains can), pointer doubling must converge to the SAME labels
  * as the plain loop in far fewer supersteps. */
class DeepGraphSpec extends SharedSparkSpec {

  private val N = 40 // chain 0–1–2–…–40: diameter 40, one component

  private def chain = {
    import spark.implicits._
    (0 until N).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
  }

  test("deep chain: doubling converges to the plain loop's labels in O(log d) supersteps") {
    val (plainLabels, plainIters) =
      TextQueries.propagateMinLabels(chain, maxIters = 200, doublingAfter = Int.MaxValue)
    val (dblLabels, dblIters) =
      TextQueries.propagateMinLabels(chain, maxIters = 200, doublingAfter = 3)
    val plain = plainLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dbl = dblLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == dbl, "degrade path changed the cluster labels")
    assert(plain.values.toSet == Set(0L), "one chain must collapse to label 0")
    assert(plain.keySet == (0L to N.toLong).toSet)
    info(s"supersteps: plain=$plainIters, doubling=$dblIters (diameter $N)")
    // plain propagation pays O(diameter); doubling halves remaining depth
    // per round from wherever the probe switched, so the gap must be wide —
    // and both must actually have CONVERGED (not hit maxIters).
    assert(plainIters < 200 && dblIters < 200)
    assert(dblIters * 2 < plainIters,
      s"doubling ($dblIters) did not clearly beat plain ($plainIters) on a deep chain")
  }

  test("production graphs stay on the plain path: shallow corpus converges before the probe") {
    // q60's own corpus: labels must converge in <= DoublingAfter supersteps,
    // proving the degrade path never fires on real near-dup graphs.
    val docs = new graft.Tables(spark, sf001).documents
    val pairs = TextQueries.ngramJaccardPairs(docs)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val (_, iters) =
      TextQueries.propagateMinLabels(pairs, maxIters = 40, doublingAfter = TextQueries.DoublingAfter)
    info(s"near-dup corpus supersteps: $iters (probe at ${TextQueries.DoublingAfter})")
    assert(iters <= TextQueries.DoublingAfter,
      s"shallow corpus took $iters supersteps — the depth probe assumption broke")
  }
}
