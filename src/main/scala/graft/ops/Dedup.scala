package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over a document table.
  * All token hashing is MD5-derived (`hash64`) so results are reproducible
  * in any engine (the DuckDB oracle recomputes them bit-identically) — no
  * JVM-specific hash functions in data paths.
  *
  * Scale notes: every operator is a pure column pipeline (codegen'd, no
  * UDFs); pair generation is always blocked (band buckets / label blocks),
  * never an unblocked O(N²) cross join.
  */
object Dedup {

  /** 60-bit deterministic hash of a string column via md5 hex. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Raw token array (lowercased alphanumeric runs) — dedup uses unfiltered
    * tokens (no stop removal), unlike the search index.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Word w-shingles as space-joined strings (empty array when the doc has
    * fewer than w tokens — guard against Spark's descending `sequence`).
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", (0 until w).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group by content hash, canonical = min doc id per group
    * (hash-groupBy — one shuffle on the 16-byte digest, scales to any N).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).cast("long").as("doc_id"), md5(col(textCol)).as("content_md5"))
    val canon = hashed.groupBy(col("content_md5")).agg(min(col("doc_id")).as("canonical_id"))
    hashed.join(canon, Seq("content_md5"))
      .select(col("doc_id"), col("canonical_id"), (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }

  /** MinHash signatures over word-3-gram shingles: h_i = min over shingles
    * of hash64(shingle || "#i"). One narrow pass + one groupBy(doc) — the
    * classic shingle→minhash step of MinHash+LSH dedup.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String, numHashes: Int = 8): DataFrame = {
    val sh = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(shingles(col(textCol))).as("shingle"))
    val aggs = (0 until numHashes).map(i =>
      min(hash64(concat(col("shingle"), lit(s"#$i")))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signatures → band buckets → candidate pairs within a
    * bucket (a<b) → verified with true shingle Jaccard. The band join is the
    * scale path: candidates ∝ collisions, never N².
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, numHashes)
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val key = concat_ws("|", lit(b.toString) +:
        (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}").cast("string")): _*)
      sig.select(col("doc_id"), key.as("bucket"))
    }.reduce(_ unionByName _)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val shingleSets = docs.select(col(idCol).cast("long").as("doc_id"),
      array_distinct(shingles(col(textCol))).as("sh"))
    cand
      .join(shingleSets.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), Seq("a"))
      .join(shingleSets.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard", floor(col("inter") / col("uni") * 1000000.0 + 0.5) / 1000000.0)
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 32-bit SimHash over distinct tokens: bit j of the fingerprint is the
    * sign of Σ_tokens (±1 by bit j of hash32(token)).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
      .withColumn("h", conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val sums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map(j =>
      when(col(s"b$j") > 0, lit(1L) * (1L << j)).otherwise(0L)).reduce(_ + _)
    sums.select(col("doc_id"), fp.as("simhash"))
  }

  /** Top-k most similar pairs by word-3-gram Jaccard within a blocking key
    * (here: same `source`) — n-gram Jaccard near-dup with explicit blocking.
    */
  def ngramJaccardTop(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String, k: Int = 20): DataFrame = {
    val sets = docs.select(col(idCol).cast("long").as("doc_id"), col(blockCol).as("blk"),
      array_distinct(shingles(col(textCol))).as("sh"))
    sets.as("x").join(sets.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (floor(size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh"))).cast("double") * 1000000.0 + 0.5) / 1000000.0).as("jaccard"))
      .orderBy(col("jaccard").desc, col("a").asc, col("b").asc)
      .limit(k)
  }
}
