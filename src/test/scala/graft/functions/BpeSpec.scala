package graft.functions

import graft.{SharedSparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Greedy-BPE tokenization has no SQL oracle (longest-match is inherently
  * sequential); correctness is pinned three ways instead: the codegen
  * expression must match the plain-Scala reference tokenizer exactly, the
  * tokenization must satisfy BPE structural invariants, and q89's packing
  * totals must equal a locally recomputed packing over reference counts. */
class BpeSpec extends SharedSparkSpec {

  private val vocabSet = GreedyBpe.Vocab.toSet
  private val maxLen = GreedyBpe.Vocab.map(_.length).max

  test("expression matches the reference tokenizer on every sf0.001 document") {
    val docs = new Tables(spark, sf001).documents
    val viaExpr = docs
      .select(col("doc_id"), GreedyBpeTokens(split(col("text"), " ")).as("bpe"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    val local = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val toks = r.getString(1).split(" ", -1).toSeq
        .flatMap(w => GreedyBpe.tokenizeWord(w, vocabSet, maxLen))
      r.getLong(0) -> toks
    }.toMap
    assert(viaExpr.keySet == local.keySet)
    local.foreach { case (id, ref) =>
      assert(viaExpr(id) == ref, s"doc $id: expression differs from reference")
    }
  }

  test("structural invariants: reconstruction, greediness, unk fallback") {
    // reconstruction: concatenating non-unk subwords with unks replaced by
    // the consumed source char reproduces the word
    def check(word: String): Unit = {
      val toks = GreedyBpe.tokenizeWord(word, vocabSet, maxLen)
      var pos = 0
      toks.foreach { t =>
        if (t == GreedyBpe.Unk) pos += 1
        else {
          assert(word.regionMatches(pos, t, 0, t.length), s"$word: $t at $pos")
          pos += t.length
        }
      }
      assert(pos == word.length, s"$word not fully consumed")
      // greediness: at position 0 no LONGER vocab entry can match
      if (toks.nonEmpty && toks.head != GreedyBpe.Unk) {
        val better = vocabSet.exists(v =>
          v.length > toks.head.length && word.startsWith(v))
        assert(!better, s"$word: ${toks.head} is not the longest match")
      }
    }
    Seq("the", "theory", "ingestion", "x9z", "", "a", "qqq", "päx",
      "management", "450turbo", "zzzzzzzzzz").foreach(check)
    // chars outside the vocab degrade to <unk>, one char each
    assert(GreedyBpe.tokenizeWord("ä", vocabSet, maxLen) == Seq(GreedyBpe.Unk))
    assert(GreedyBpe.tokenizeWord("a#b", vocabSet, maxLen) ==
      Seq("a", GreedyBpe.Unk, "b"))
    // alphanumeric words never produce <unk> (all singles are in vocab)
    assert(!GreedyBpe.tokenizeWord("xq7w", vocabSet, maxLen).contains(GreedyBpe.Unk))
    // ArrayType(StringType) admits null elements (a SQL array literal can
    // carry them even though split() never does): map to <unk>, never NPE
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("the"), null, UTF8String.fromString("a")))
    val toks = GreedyBpe.tokenizeWords(withNull, vocabSet, maxLen)
    assert((0 until toks.numElements()).map(toks.getUTF8String(_).toString) ==
      Seq("the", GreedyBpe.Unk, "a"))
  }

  test("q89 packing totals equal a local recomputation over reference counts") {
    val rows = graft.SparkEntry.queries("q89_bpe_pack")(spark, sf001).collect()
    val docs = new Tables(spark, sf001).documents
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs
      .map { case (id, lang, text) =>
        val ws = text.split(" ", -1).length.toLong
        val bpe = text.split(" ", -1).toSeq
          .map(w => GreedyBpe.tokenizeWord(w, vocabSet, maxLen).length.toLong).sum
        (id, lang, ws, bpe)
      }
      .groupBy(_._2).toSeq
      .flatMap { case (lang, ds) =>
        val sorted = ds.sortBy(_._1)
        var cum = 0L
        sorted.map { case (_, _, ws, bpe) =>
          val bin = cum / 2048L
          cum += bpe
          (lang, bin, ws, bpe)
        }
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((lang, bin), g) =>
        (lang, bin) -> (g.size.toLong, g.map(_._4).sum, g.map(_._3).sum)
      }
    val got = rows.map(r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected, s"packing mismatch:\n got=$got\n exp=$expected")
  }
}
