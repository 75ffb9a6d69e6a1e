package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BPE vocabulary training has no SQL oracle (an iterative argmax loop);
  * correctness is pinned by PARITY instead: the distributed trainer must
  * produce the exact merge sequence of an independent single-node reference
  * trainer — rank by rank, frequencies included — on real corpus data and
  * on adversarial hand-built word tables. */
class BpeTrainSpec extends SharedSparkSpec {

  test("distributed merges equal the single-node reference on sf0.001") {
    val docs = new Tables(spark, sf001).documents
    val wordCounts = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = BpeTrainer.trainLocal(wordCounts, 40)
    val dist = BpeTrainer.train(docs, 40)
    assert(ref.nonEmpty, "corpus learned no merges — test data degenerate?")
    assert(dist == ref,
      s"distributed merge sequence diverged:\n dist=${dist.take(8)}\n ref =${ref.take(8)}")
  }

  test("reference trainer: known corpus, hand-checked merges") {
    // "low"x5 + "lower"x2, traced by hand:
    //   rank0: (l,o)=7 vs (o,w)=7 tie -> left "l" < "o" -> (l,o)
    //   rank1: (lo,w)=7
    //   rank2: (low,e)=2 vs (e,r)=2 tie -> left "e" < "low" -> (e,r)
    //   rank3: (low,er)=2; then "low"(5)/"lower"(2) have no pairs -> stop
    val merges = BpeTrainer.trainLocal(Seq(("low", 5L), ("lower", 2L)), 10)
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("l", "o", 7L), ("lo", "w", 7L), ("e", "r", 2L), ("low", "er", 2L)),
      s"unexpected merge sequence: $merges")
  }

  test("greedy merge application never re-pairs a consumed symbol") {
    assert(BpeTrainer.applyMerge(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(BpeTrainer.applyMerge(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
    assert(BpeTrainer.applyMerge(Vector("x"), "a", "a") == Vector("x"))
    assert(BpeTrainer.applyMerge(Vector.empty[String], "a", "a") == Vector())
  }

  test("trainer stops when no pair repeats (freq < 2 learns nothing)") {
    assert(BpeTrainer.trainLocal(Seq(("abc", 1L)), 10).isEmpty)
    assert(BpeTrainer.trainLocal(Seq(("ab", 1L), ("cd", 1L)), 10).isEmpty)
    assert(BpeTrainer.trainLocal(Seq(("a", 99L)), 10).isEmpty) // no pairs at all
  }

  test("q106 emits the reference merge table; q107 totals match a local recompute") {
    val q106 = graft.SparkEntry.queries("q106_bpe_train")(spark, sf001).collect()
    val docs = new Tables(spark, sf001).documents
    val wordCounts = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = BpeTrainer.trainLocal(wordCounts, 40)
    val got = q106.map(r => BpeTrainer.Merge(
      r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).sortBy(_.rank)
    assert(got.toSeq == ref, "q106 merge table differs from reference trainer")
    q106.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))

    // q107: tokenize with the TRAINED vocab; recompute locally with the
    // same greedy longest-match tokenizer over the same learned vocab
    val vocab = BpeTrainer.vocabOf(ref, (('a' to 'z') ++ ('0' to '9')).map(_.toString))
    val vSet = vocab.toSet
    val vMax = vocab.map(_.length).max
    val expected = docs.select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (lang, ds) =>
        val ws = ds.map(_._2.split(" ", -1).length.toLong).sum
        val bpe = ds.map(_._2.split(" ", -1).toSeq
          .map(w => GreedyBpe.tokenizeWord(w, vSet, vMax).length.toLong).sum).sum
        lang -> (ds.length.toLong, bpe,
          BigDecimal(bpe.toDouble / ws).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val q107 = graft.SparkEntry.queries("q107_bpe_train_tokenize")(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(q107 == expected, s"q107 mismatch:\n got=$q107\n exp=$expected")
  }
}
