package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic property-test driver: replays each Gen over fixed seeds
  * (scalatestplus bridge is not on the offline classpath).
  */
trait GenSamples {
  def forAll[A](g: Gen[A], n: Int = 60)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => body(t._1, t._2))

  def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body
}
