package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence shaping for training-data pipelines: context-window chunking
  * (long documents → overlapping fixed-token windows) and deterministic
  * sequence packing (short documents → token-budget packs).
  *
  * Both are built for the 100 TB shape:
  *
  *   - [[chunk]] is ONE narrow map over the corpus — tokens, window starts,
  *     and slices are all per-row array expressions (no explode-join, no
  *     shuffle; the explode is of a tiny per-row start list).
  *   - [[pack]] never builds a global order (a single `ORDER BY doc_id`
  *     cumsum would serialize the corpus through one task). Documents are
  *     salted into `numBuckets` hash buckets and packed by cumulative token
  *     count WITHIN each bucket — one shuffle on the bucket key, each bucket
  *     an independent window task, and a row's (bucket, pack) assignment is
  *     reproducible from its id alone plus the ids sorting below it in the
  *     same bucket. At cluster scale `numBuckets` is sized ≫ executor count.
  *
  * Token kernel is [[TextAnalysis.rawTokens]] (lowercased alphanumeric
  * runs), identical to the gated token-count op, so chunk token counts and
  * pack budgets agree with `op_tokens` exactly.
  */
object Chunking {

  /** Bucket count for [[pack]]/[[chunkPack]]. The old fixed default of 32
    * was a footgun at corpus scale — 32 window tasks over the whole corpus
    * (VERDICT r5) — so a non-positive `numBuckets` now derives the default
    * from the session's shuffle parallelism (floored at 32), which scales
    * with the cluster. NOTE: the (bucket, pack_id) assignment is a pure
    * function of ids + salt ONLY for a fixed bucket count — pipelines that
    * need cross-session-reproducible pack ids (the gated queries pass 32)
    * must pin `numBuckets` explicitly.
    */
  private def resolveBuckets(docs: DataFrame, numBuckets: Int): Int = {
    if (numBuckets > 0) numBuckets
    else math.max(32, docs.sparkSession.sessionState.conf.numShufflePartitions)
  }

  /** Overlapping fixed-size token windows per document: window `i` covers
    * tokens `[i·stride, i·stride + chunkSize)`; the last window may be
    * short. Emits (doc_id, chunk_id, chunk_text, n_tokens). Map-only.
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 32,
      stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.rawTokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    toks
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("col") + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), size(col("toks")) - col("col")).cast("long").as("n_tokens"))
  }

  /** Deterministic sequence packing: assign each document to a token-budget
    * pack by the cumulative token count of the documents before it (doc_id
    * order) in its hash bucket — the "concatenate then split at budget
    * boundaries" packing every training pipeline runs before batching.
    * A pack may overflow `budget` by at most one document (documents are
    * never split; chunk first if that matters). Emits
    * (doc_id, bucket, n_tokens, pack_id); the global pack key is
    * (bucket, pack_id).
    */
  def pack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long = 2048L,
      numBuckets: Int = -1,
      salt: String = "graft"): DataFrame = {
    val buckets = resolveBuckets(docs, numBuckets)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      pmod(Dedup.hash64(concat(col(idCol).cast("long").cast("string"), lit(":" + salt))),
        lit(buckets.toLong)).as("bucket"),
      size(TextAnalysis.rawTokens(col(textCol))).cast("long").as("n_tokens"))
    // doc_id is unique within a bucket, so the default RANGE frame equals
    // ROWS and both engines see the same cumulative sums
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    base.withColumn("pack_id",
      floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget.toDouble))
        .cast("long"))
  }

  /** [[chunk]] then [[pack]] — the composition that handles oversize
    * documents: a document longer than the budget is first split into
    * ≤ chunkSize-token windows (stride = chunkSize by default: training
    * packs should not duplicate tokens), then the CHUNKS are packed, so a
    * pack can overflow the budget by at most chunkSize − 1 tokens instead
    * of by a whole document. Same scale shape as its parts: one narrow map
    * for chunking, one bucket-key shuffle for packing; pack ordering within
    * a bucket is the unique (doc_id, chunk_id). Emits
    * (doc_id, chunk_id, n_tokens, bucket, pack_id).
    */
  def chunkPack(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 32,
      stride: Int = 32,
      budget: Long = 2048L,
      numBuckets: Int = -1,
      salt: String = "graft"): DataFrame = {
    require(chunkSize <= budget, s"chunkSize $chunkSize must fit the budget $budget")
    val buckets = resolveBuckets(docs, numBuckets)
    val ch = chunk(docs, idCol, textCol, chunkSize, stride)
    val key = concat(col("doc_id").cast("string"), lit(":"),
      col("chunk_id").cast("string"), lit(":" + salt))
    val base = ch.select(col("doc_id"), col("chunk_id"), col("n_tokens"),
      pmod(Dedup.hash64(key), lit(buckets.toLong)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"), col("chunk_id"))
    base.withColumn("pack_id",
      floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget.toDouble))
        .cast("long"))
  }
}
