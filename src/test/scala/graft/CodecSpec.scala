package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.index.Codec
import graft.index.Codec.Decoded

/** Compression round-trip + property tests (SURVEY.md §5.2 item 4). */
class CodecSpec extends AnyFunSuite with GenSamples {

  private val postingGen: Gen[Vector[Decoded]] = for {
    n <- Gen.choose(0, 600)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 5000L))
    tfs <- Gen.listOfN(n, Gen.choose(1, 20))
    dls <- Gen.listOfN(n, Gen.choose(1, 400))
  } yield {
    val docIds = gaps.scanLeft(10L)(_ + _).tail
    docIds.lazyZip(tfs).lazyZip(dls).map { (d, tf, dl) =>
      val positions = (0 until tf).scanLeft(0)((p, _) => p + 1 + (d % 7).toInt).tail.toArray
      Decoded(d, tf, dl max tf, positions)
    }.toVector
  }

  test("vlong round-trip") {
    forAll(Gen.choose(0L, Long.MaxValue / 2)) { v =>
      val buf = new Codec.ByteWriter()
      Codec.writeVLong(buf, v)
      val (got, n) = Codec.readVLong(buf.toArray, 0)
      assert(got === v && n === buf.size)
    }
  }

  test("block encode/decode identity over arbitrary sorted posting runs") {
    forAll(postingGen) { run =>
      val blocks = Codec.encode(run.iterator, avgdl = 57.3)
      val decoded = blocks.flatMap(Codec.decode)
      assert(decoded.map(_.docId) === run.map(_.docId))
      assert(decoded.map(_.tf) === run.map(_.tf))
      assert(decoded.map(_.dl) === run.map(_.dl))
      decoded.zip(run).foreach { case (a, b) => assert(a.positions.toSeq === b.positions.toSeq) }
    }
  }

  test("block metadata: bounds, sizes, block-max is an upper bound") {
    forAll(postingGen) { run =>
      whenever(run.nonEmpty) {
        val avgdl = 57.3
        val blocks = Codec.encode(run.iterator, avgdl)
        assert(blocks.map(_.count).sum === run.length)
        assert(blocks.forall(_.count <= Codec.BlockSize))
        assert(blocks.head.firstDoc === run.head.docId)
        assert(blocks.last.lastDoc === run.last.docId)
        // firstDoc/lastDoc ordered and disjoint
        blocks.sliding(2).foreach {
          case Seq(a, b) => assert(a.lastDoc < b.firstDoc)
          case _ =>
        }
        blocks.foreach { b =>
          val docs = Codec.decode(b)
          docs.foreach { d =>
            val norm = d.tf * 2.2 / (d.tf + 1.2 * (0.25 + (0.75 / avgdl) * d.dl))
            assert(norm <= b.maxTfNorm + 1e-12)
            assert(d.tf <= b.maxTf)
          }
        }
      }
    }
  }
}
