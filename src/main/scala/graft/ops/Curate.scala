package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, as one operator: benchmark-decontaminate, exact-dedup,
  * select the quality top-k per group, and assign train/val/test splits.
  * Nothing here is new machinery; it is [[Decontam]], [[Dedup.exact]],
  * [[Sampling.topKPerGroup]], and [[Sampling.splitAssign]] chained on their
  * public contracts — the point (and what the gate proves) is that the
  * stages COMPOSE with both engines still agreeing bit-for-bit.
  *
  * Scale shape is the union of its parts: one broadcast join against the
  * benchmark shingle set, one content-digest shuffle for dedup, one
  * group-key shuffle for selection, and a map-only split assignment over
  * the k·|groups|-bounded selection.
  */
object Curate {

  /** Returns (doc_id, groupCol, quality, rk, split) for the curated corpus:
    * documents outside the benchmark slice, not contaminated by it, exact-
    * duplicate-free (min-id canonical), within the quality top-`k` of their
    * group, each with its deterministic split label.
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      benchMod: Int = 17,
      minHits: Int = 2,
      k: Int = 50,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt: String = "graft"): DataFrame = {
    val norm = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), col(groupCol))
    val corpus = norm.filter(col("doc_id") % benchMod =!= 0)
    val bench = norm.filter(col("doc_id") % benchMod === 0)
    val survivors = Decontam.decontaminate(
      corpus, "doc_id", "text", bench, "doc_id", "text", minHits = minHits)
    val kept = corpus.join(survivors, Seq("doc_id"))
    val canonical = Dedup.exact(kept, "doc_id", "text")
      .filter(!col("is_dup")).select(col("doc_id"))
    val undup = kept.join(canonical, Seq("doc_id"))
    val sel = Sampling.topKPerGroup(undup, "doc_id", "text", groupCol, k)
    val split = Sampling.splitAssign(sel.select(col("doc_id")), "doc_id", fractions, salt)
    sel.join(split.select(col("doc_id"), col("split")), Seq("doc_id"))
  }
}
