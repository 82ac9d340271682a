package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curate, Decontam, Dedup}

/** Composition invariants of the end-to-end curation operator (the gate
  * proves cross-engine equality; this proves the pipeline's contracts).
  */
class CurateSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val out = Curate.curate(docs, "doc_id", "text", "source", k = 10).cache()

  test("every group keeps at most k docs, ranked 1..k by quality") {
    val byGroup = out.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("maxrk"), min(col("rk")).as("minrk"))
      .collect()
    assert(byGroup.nonEmpty)
    byGroup.foreach { r =>
      assert(r.getLong(1) <= 10L && r.getLong(2) <= 10L && r.getLong(3) == 1L, r.toString)
    }
  }

  test("no benchmark-slice, contaminated, or duplicate doc survives; splits are valid") {
    val ids = out.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 17 != 0), "benchmark-slice doc leaked through")
    val contaminated = Decontam.contaminationHits(
        docs.filter(col("doc_id") % 17 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 17 === 0), "doc_id", "text")
      .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty, "contaminated doc leaked through")
    // dedup runs AFTER decontamination, so the canonical reference set is
    // exact-dedup over the KEPT subset (a cluster whose min id sits in the
    // benchmark slice or is contaminated legitimately keeps its next id)
    val kept = docs.filter(col("doc_id") % 17 =!= 0)
      .filter(!col("doc_id").isInCollection(contaminated.toSeq :+ -1L))
    val dups = Dedup.exact(kept, "doc_id", "text")
      .filter(col("is_dup")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(dups).isEmpty, "non-canonical duplicate leaked through")
    val splits = out.select(col("split")).distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("the contaminated-id anti-join is broadcast (corpus never joins a corpus-sized side)") {
    val plan = Curate.curate(docs, "doc_id", "text", "source", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")), plan.take(4000))
  }
}
