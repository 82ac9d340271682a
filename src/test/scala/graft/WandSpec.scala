package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Codec, IndexBuilder}
import graft.index.Codec.Decoded
import graft.index.Scorers._

/** WAND ≡ exhaustive scoring on random corpora (SURVEY.md §5.2 item 4;
  * north rule mandates block-max WAND).
  */
class WandSpec extends AnyFunSuite with GenSamples {

  private val avgdl = 40.0

  /** Random mini-corpus: up to 4 terms, each with a random posting list over
    * docIds < 3000, dl shared per doc.
    */
  private val corpusGen: Gen[Seq[(Double, Vector[Decoded])]] = for {
    nTerms <- Gen.choose(1, 4)
    terms <- Gen.listOfN(nTerms, for {
      idf <- Gen.choose(0.1, 5.0)
      n <- Gen.choose(1, 400)
      ids <- Gen.listOfN(n, Gen.choose(0L, 3000L))
      tfs <- Gen.listOfN(n, Gen.choose(1, 8))
    } yield {
      val docs = ids.distinct.sorted
      val run = docs.zip(tfs).map { case (d, tf) =>
        Decoded(d, tf, dl = 20 + (d % 40).toInt, positions = Array.range(0, tf))
      }.toVector
      (idf, run)
    })
  } yield terms

  private def scorers(corpus: Seq[(Double, Vector[Decoded])]): IndexedSeq[TermScorer] =
    corpus.map { case (idf, run) =>
      new TermScorer(new TermIterator(Codec.encode(run.iterator, avgdl)), idf).withAvgdl(avgdl)
    }.toIndexedSeq

  private def bruteForce(corpus: Seq[(Double, Vector[Decoded])], k: Int): Seq[(Long, Double)] = {
    val byDoc = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
    corpus.foreach { case (idf, run) =>
      run.foreach { d =>
        byDoc(d.docId) += idf * d.tf * (IndexBuilder.K1 + 1.0) /
          (d.tf + IndexBuilder.K1 * ((1.0 - IndexBuilder.B) + (IndexBuilder.B / avgdl) * d.dl))
      }
    }
    byDoc.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("block-max WAND top-k ≡ exhaustive disjunction scoring") {
    forAll(corpusGen, Gen.oneOf(1, 3, 10, 50)) { (corpus, k) =>
      val wand = wandTopK(scorers(corpus), k)
      val want = bruteForce(corpus, k)
      assert(wand.map(_._1) === want.map(_._1))
      wand.zip(want).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("exhaustive BoolScorer disjunction agrees too") {
    forAll(corpusGen) { corpus =>
      val root = new BoolScorer(IndexedSeq.empty, scorers(corpus), IndexedSeq.empty)
      val got = exhaustiveTopK(root, 10)
      assert(got === bruteForce(corpus, 10))
    }
  }

  test("TermIterator.advance skips blocks correctly") {
    forAll(corpusGen) { corpus =>
      corpus.foreach { case (_, run) =>
        whenever(run.nonEmpty) {
          val targets = Seq(run.head.docId, run(run.length / 2).docId,
            run.last.docId, run.last.docId + 1)
          targets.foreach { t =>
            val it = new TermIterator(Codec.encode(run.iterator, avgdl))
            it.advance(t)
            val expected = run.find(_.docId >= t).map(_.docId)
            assert((if (it.doc == NoMoreDocs) None else Some(it.doc)) === expected)
          }
        }
      }
    }
  }
}
