package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the round-5 bounded-state aggregators —
  * pure-JVM (no Spark session): arbitrary streams, arbitrary chunkings and
  * merge orders, asserting exactly the guarantees their queries (q121,
  * q128) and the plan-width tests rely on.
  */
object AggregatorProps extends Properties("BoundedAggregators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  // ---- Misra-Gries -------------------------------------------------------

  private val genStream: Gen[List[String]] = for {
    nHeavy <- Gen.chooseNum(1, 4)
    heavyReps <- Gen.chooseNum(20, 80)
    tail <- Gen.chooseNum(0, 120)
    seed <- Gen.chooseNum(0, 1000)
  } yield {
    val heavy = (0 until nHeavy).flatMap(h => List.fill(heavyReps)(s"h$h"))
    val rest = (0 until tail).map(i => s"t${(seed + i * 7) % 97}")
    // deterministic interleave (no Random: proper shuffling isn't needed,
    // adversarial ORDER is covered by chunking variation below)
    (heavy ++ rest).zipWithIndex.sortBy { case (_, i) => (i * 31) % 101 }
      .map(_._1).toList
  }

  private val genCap = Gen.chooseNum(4, 16)

  property("MG: est<=true, undercount<=n/(cap+1), heavy survive, any chunking") =
    Prop.forAll(genStream, genCap, Gen.chooseNum(1, 6)) { (stream, cap, chunks) =>
      val agg = new SketchAggregators.MisraGriesAgg(cap)
      val parts = stream.grouped(math.max(1, stream.size / chunks)).toList
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.reduceLeft(agg.merge)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = stream.size.toDouble / (cap + 1)
      val bounds = merged.forall { case (k, est) =>
        est <= exact(k) && exact(k) - est <= bound
      }
      val survival = exact.filter(_._2 > bound).keys.forall(merged.contains)
      val capacity = merged.size <= cap
      bounds :| "bounds" && survival :| "heavy survival" && capacity :| "capacity"
    }

  // ---- bounded top-k -----------------------------------------------------

  private val genPairs: Gen[List[(Double, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    vs <- Gen.listOfN(n, Gen.chooseNum(-100, 100))
  } yield vs.zipWithIndex.map { case (v, i) => (v.toDouble, i.toLong) }

  property("TopK: any chunking+merge order == sort-take truth") =
    Prop.forAll(genPairs, Gen.chooseNum(1, 7), Gen.chooseNum(1, 5)) { (xs, k, chunks) =>
      val agg = new SketchAggregators.TopKByAgg(k)
      val parts = if (xs.isEmpty) List(agg.zero)
        else xs.grouped(math.max(1, xs.size / chunks)).toList
          .map(_.foldLeft(agg.zero)(agg.reduce))
      val forward = parts.reduceLeft(agg.merge)
      val backward = parts.reverse.reduceLeft(agg.merge)
      val truth = xs.sortBy { case (v, id) => (-v, id) }.take(k)
      (forward == truth) :| s"forward $forward != $truth" &&
        (backward == truth) :| "merge order changed the result"
    }

  // ---- PQ encode ---------------------------------------------------------

  private val genVec: Gen[Array[Double]] =
    Gen.listOfN(64, Gen.chooseNum(-8.0, 8.0)).map(_.toArray)

  property("PQ: local encode picks the argmin codeword per subspace, ties->lowest") =
    Prop.forAll(Gen.listOfN(20, genVec), genVec) { (sample, v) =>
      val books = (0 until PqIndex.M).map { s =>
        val sub = sample.zipWithIndex.map { case (x, i) =>
          (i.toLong, x.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim))
        }
        KMeansTrainer.trainLocal(sub.toIndexedSeq, math.min(PqIndex.K, sample.size), 5, 1e-3).centroids
      }
      val m = PqIndex.Model(books)
      val codes = PqIndex.encodeLocal(v, m)
      codes.zipWithIndex.forall { case (c, s) =>
        val sub = v.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim)
        val d = books(s).map(cw => KMeansTrainer.d2(sub, cw))
        d(c) == d.min && !d.take(c).exists(_ == d.min)
      }
    }
}
