package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.index.DocIds

/** The input_hint invariants: per-turn text equality under stable
  * (conv_id, turn_idx) ordering, identical at two parallelism levels
  * (the sandbox stand-in for N vs 4N executors).
  */
class DeterminismSpec extends SparkSpec {

  test("transcript generation is a pure function of (seed, conv, turn)") {
    val a = TranscriptGen.transcripts(spark, 50).collect().sortBy(t => (t.conv_id, t.turn_idx))
    val b = TranscriptGen.transcripts(spark, 50).collect().sortBy(t => (t.conv_id, t.turn_idx))
    assert(a === b)
    assert(a.length > 500)
    // role/tool skew present (exercises salting)
    assert(a.map(_.role).distinct.sorted === Seq("assistant", "system", "tool", "user"))
  }

  test("docID assignment is dense rank over (conv_id, turn_idx), stable across parallelism") {
    def assign(s: SparkSession, parts: Int): Array[(String, Int, Long, String)] = {
      val turns = TranscriptGen.transcripts(s, 80)
      DocIds.assign(turns.toDF(), Seq("conv_id", "turn_idx"), "docId", parts)
        .select(col("conv_id"), col("turn_idx"), col("docId"), col("text"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
        .sortBy(t => (t._1, t._2))
    }
    val at3 = assign(spark, 3)
    val at13 = assign(spark, 13)
    assert(at3 === at13, "docIds differ across partition counts")
    // dense 0..n-1 and ordered like (conv_id, turn_idx)
    assert(at3.map(_._3).toSeq === at3.indices.map(_.toLong))
    // per-turn text equality under the stable ordering (input_hint invariant)
    at3.zipWithIndex.foreach { case ((conv, turn, _, text), i) =>
      val expected = TranscriptGen.genTurn(42L, conv.stripPrefix("conv-").toLong, turn).text
      assert(text === expected, s"text mismatch at rank $i")
    }
  }

  test("docID count pass engages the pre-sort exchange RDD (round 5)") {
    // the count-pass optimization (skip the Tungsten sort when counting)
    // depends on finding the range exchange in the sorted RDD's lineage —
    // this pins that the walk works on the exact plan DocIds.assign builds,
    // so a Spark upgrade can't silently fall back to the sorted pass
    val keys = Seq(col("conv_id"), col("turn_idx"))
    val sorted = TranscriptGen.transcripts(spark, 20).toDF()
      .repartitionByRange(8, keys: _*)
      .sortWithinPartitions(keys: _*)
    val rdd = sorted.rdd
    val anc = DocIds.shuffledAncestor(rdd)
    assert(anc.nonEmpty, "no shuffle ancestor found — count pass falls back to the sorted RDD")
    assert(anc.get.getNumPartitions === rdd.getNumPartitions)
    assert(anc.get ne rdd)
  }
}
