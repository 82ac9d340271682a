package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and per-group selection operators — the
  * subsetting half of a training-data pipeline (the reference engine
  * indexes and queries; a 100 TB corpus also gets *selected* before
  * training).
  *
  * Sampling is HASH-based, never `rand()`: a random sample is not
  * reproducible across engines, retries, or speculative re-executions
  * (a recomputed partition would draw fresh randoms and double-count or
  * drop rows), while `md5(id)`-bucketing gives every engine the same
  * sample bit-for-bit (the DuckDB oracle recomputes it), keeps the
  * sample stable under re-runs, and composes (the p=0.25 sample is a
  * subset of the p=0.5 sample with the same salt). All three operators
  * are a narrow map except [[topKPerGroup]], which shuffles once on the
  * group key.
  */
object Sampling {

  /** Rate → integer bucket threshold, computed ONCE here so the Spark plan
    * and the oracle SQL can never disagree on double→long conversion.
    */
  def threshold(rate: Double): Long = math.round(rate * 1000000.0)

  /** Deterministic bucket in [0, 1e6) from the doc id and a salt —
    * md5-derived (Dedup.hash64), so any engine reproduces it.
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(Dedup.hash64(concat(id.cast("string"), lit(":" + salt))), lit(1000000L))

  /** Deterministic Bernoulli sample: keep a row iff its hash bucket falls
    * below rate·1e6. Map-only — no shuffle, no RNG state; scales as a pure
    * filter pushed against the scan.
    */
  def hashSample(docs: DataFrame, idCol: String, rate: Double, salt: String = "graft"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        hashBucket(col(idCol).cast("long"), salt).as("bucket"))
      .filter(col("bucket") < threshold(rate))

  /** Stratified sampling: a per-group rate (source/lang/quality-band
    * strata), unlisted groups fall back to `defaultRate`. The rate table is
    * a literal CASE over the group column — still a narrow map; group keys
    * are distinct so the CASE order is immaterial.
    */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(threshold(r))).otherwise(acc)
    }
    docs.select(col(idCol).cast("long").as("doc_id"), col(groupCol),
        hashBucket(col(idCol).cast("long"), salt).as("bucket"))
      .filter(col("bucket") < thr)
  }

  /** The split label for a bucket column under `fractions`' cumulative
    * cuts — ONE kernel shared by [[splitAssign]] and [[Curate]] so the
    * label rule can never diverge between the standalone and composed ops.
    */
  def splitLabel(bucket: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "split needs at least one label")
    val cuts = fractions.map(_._2).scanLeft(0L)((acc, f) => acc + threshold(f)).tail
    fractions.init.zip(cuts.init).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
  }

  /** Deterministic train/val/test split assignment: the hash bucket is cut
    * at the cumulative fraction boundaries, so every row gets exactly one
    * label, the assignment is reproducible in any engine, and re-running
    * over a grown corpus never moves an existing row between splits (a
    * row's bucket depends only on its id and the salt). Map-only.
    *
    * `fractions` are (label, fraction) in order; the LAST label absorbs any
    * rounding remainder so the labels partition the bucket space exactly.
    */
  def splitAssign(
      docs: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      salt: String = "graft"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        hashBucket(col(idCol).cast("long"), salt).as("bucket"))
      .withColumn("split", splitLabel(col("bucket"), fractions))

  /** Quality-based selection: the top `k` documents per group by the
    * composite quality score ([[TextAnalysis.qualityCol]] — identical
    * expression to the op_quality gate), ties broken by doc id. One shuffle
    * on the group key; a degenerate group sorts in a single task (same
    * documented caveat as Dedup's bucket window — O(N log N), never N²).
    */
  def topKPerGroup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      k: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(groupCol),
        TextAnalysis.rawTokens(col(textCol)).as("toks")) // materialized once
      .select(col("doc_id"), col(groupCol),
        TextAnalysis.qualityColOf(col("toks")).as("quality"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("quality").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rk") <= k)
}
