package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * All math runs in double (elements cast up) as pure column expressions —
  * `zip_with` for the elementwise product, `aggregate` for the sums — so the
  * plan stays inside whole-stage codegen and the DuckDB oracle reproduces
  * the values.
  */
object Similarity {

  private def foldCol(a: Column, b: Column, l2: Boolean): Column =
    org.apache.spark.sql.GraftColumn.column(
      graft.functions.VecFoldExpression(
        org.apache.spark.sql.GraftColumn.expression(a),
        org.apache.spark.sql.GraftColumn.expression(b), l2))

  /** A literal double-array as ONE Literal node (round 6). The old
    * `array(xs.map(lit): _*)` built a CreateArray over |xs| child literals —
    * for 64-dim centroids × nCentroids argmin alternatives that is a
    * ~512-node subtree the analyzer/optimizer re-walks on EVERY Lloyd
    * iteration's job (and the generated code re-materializes per row).
    * ConstantFolding collapses the old shape to exactly this literal, so
    * values are identical; building it directly skips the tree tax.
    */
  private def litArray(xs: Seq[Double]): Column =
    org.apache.spark.sql.GraftColumn.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        xs.toArray,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)))

  /** Σ aᵢbᵢ in index order (deterministic summation). Native codegen'd
    * expression (round 6) — the `aggregate(zip_with(...))` formulation is
    * CodegenFallback, an interpreted lambda per element per row; the fold
    * order and null semantics are reproduced exactly
    * ([[graft.functions.VecFoldExpression]], property-tested against the
    * old expression).
    */
  def dot(a: Column, b: Column): Column = foldCol(a, b, l2 = false)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of one query vector: broadcast the
    * query against a full scan — the exact baseline. At cluster scale the
    * scan is embarrassingly parallel; only k rows reach the driver
    * (TakeOrderedAndProject).
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int = 10): DataFrame = {
    val q = broadcast(emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec")))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(q)
      .select(col(idCol).cast("long").as("vec_id"),
        round(cosine(col(vecCol), col("qvec")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-bucket key over the first `bits` components — a deterministic
    * stand-in for random-hyperplane LSH (the hyperplanes are the axes).
    */
  def signBucket(vec: Column, bits: Int = 6): Column =
    (0 until bits).map(i =>
      when(element_at(vec, i + 1) >= 0f, lit(1L) * (1L << i)).otherwise(0L)).reduce(_ + _)

  /** Bucketed ANN: probe only the query's sign bucket (IVF-style coarse
    * quantization; at scale the bucket column is a partition key, so a probe
    * reads one partition instead of the corpus).
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int = 10, bits: Int = 6): DataFrame = {
    val withBucket = emb.withColumn("bucket", signBucket(col(vecCol), bits))
    val q = broadcast(withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), col("bucket").as("qbucket")))
    withBucket.crossJoin(q)
      .filter(col("bucket") === col("qbucket") && col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("vec_id"),
        round(cosine(col(vecCol), col("qvec")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Multi-probe LSH ANN: probe every bucket within Hamming distance
    * `hamming` of the query's sign bucket (Lv et al. 2007 multi-probe LSH —
    * recovers the recall a single-bucket probe loses at bucket boundaries).
    * At scale: `hamming+1 choose bits` partitions read instead of one —
    * still a tiny fraction of the corpus.
    */
  def multiProbeTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, bits: Int = 6, hamming: Int = 1): DataFrame = {
    val withBucket = emb.withColumn("bucket", signBucket(col(vecCol), bits))
    val q = broadcast(withBucket.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), col("bucket").as("qbucket")))
    withBucket.crossJoin(q)
      .filter(bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= hamming &&
        col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("vec_id"),
        round(cosine(col(vecCol), col("qvec")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Σ (aᵢ−bᵢ)² in index order — same native fold as [[dot]]. */
  def l2sq(a: Column, b: Column): Column = foldCol(a, b, l2 = true)

  // ---- IVF ---------------------------------------------------------------
  //
  // The coarse codebook is tiny and bounded (nCentroids rows), so it is
  // collected to the driver — the same Lucene-TermStates-shaped collect the
  // query planner already does for term stats — and embedded as LITERALS in
  // the assignment expression. Cell assignment is then a NARROW map over the
  // corpus (scan → project), where the previous shape crossJoined a
  // broadcast centroid frame and re-aggregated all N×1 rows by vid: a full
  // shuffle of every vector per Lloyd pass. The driver-side arithmetic
  // (left-fold Σ(x−y)² in index order over doubles) is bit-identical to the
  // Catalyst `aggregate`/`zip_with` fold, so assignments — and therefore the
  // gated outputs — are unchanged.

  /** IVF input frame: (vid, v) with null vectors dropped — the driver-side
    * collects (query vector, centroids, Lloyd means) would NPE on a null
    * Seq, and a null embedding can never rank in a cosine top-k anyway.
    */
  private def ivfInput(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)

  /** The seed codebook (sorted by cid) AND the query vector off ONE bounded
    * (≤ nCentroids + 1 row) collect — round 6: every IVF op needed both and
    * paid two separately-scheduled scan jobs. The filter is the union of
    * the two old ones, the double-cast transform identical, and a query
    * vector that is itself a seed centroid is served from the same row both
    * ways. None when the query id is absent: callers return an empty
    * result, matching the old empty-broadcast-crossJoin behavior.
    */
  private def collectCentroidsAndQuery(e: DataFrame, nCentroids: Int, queryId: Long)
      : (Seq[(Long, IndexedSeq[Double])], Option[IndexedSeq[Double]]) = {
    val rows = e.filter(col("vid") < nCentroids || col("vid") === queryId)
      .select(col("vid"), transform(col("v"), x => x.cast("double")).as("vd"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
    (rows.filter(_._1 < nCentroids).sortBy(_._1), rows.find(_._1 == queryId).map(_._2))
  }

  /** Driver-side Σ(x−y)² with the exact fold order of [[l2sq]]. */
  private def l2sqDriver(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Σ(x−y)² of a vector column against a literal centroid (index-order fold). */
  private def l2sqLit(v: Column, ce: Seq[Double]): Column =
    l2sq(v, litArray(ce))

  /** Narrow cell assignment: argmin over literal centroids (ties → lowest
    * cid) via `array_min` over (dist, cid) structs — struct ordering IS the
    * tie-break. No join, no shuffle: scan → project.
    */
  private def assignLit(e: DataFrame, cents: Seq[(Long, IndexedSeq[Double])]): DataFrame =
    e.withColumn("cid", array_min(array(cents.map { case (cid, ce) =>
      struct(l2sqLit(col("v"), ce).as("dist"), lit(cid).as("cid"))
    }: _*)).getField("cid"))

  /** Empty (vec_id, cos_r) frame — the no-query / no-codebook result. */
  private def emptyTopK(e: DataFrame): DataFrame =
    e.sparkSession.emptyDataFrame
      .select(lit(0L).as("vec_id"), lit(0.0).as("cos_r")).limit(0)

  /** Top-k cosine scan of the (narrow-filtered) candidate rows against a
    * literal query vector: project + TakeOrderedAndProject, nothing else.
    */
  private def probeTopK(cand: DataFrame, qvec: IndexedSeq[Double], queryId: Long, k: Int): DataFrame =
    cand.filter(col("vid") =!= queryId)
      .select(col("vid").as("vec_id"),
        round(cosine(col("v"), litArray(qvec)), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
      .limit(k)

  /** IVF-style ANN: a fixed coarse codebook (the first `nCentroids` vectors
    * stand in for trained k-means centroids — deterministic, so the oracle
    * can recompute the structure), one assignment pass (argmin L2, ties by
    * centroid id), probe = top-k cosine within the query's cell only. The
    * whole probe is scan → narrow filter/project → top-k; at cluster scale
    * the cell id is the partition key, so it reads one partition instead of
    * the corpus.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, nCentroids: Int = 8): DataFrame = {
    val e = ivfInput(emb, idCol, vecCol)
    val (cents, qvecOpt) = collectCentroidsAndQuery(e, nCentroids, queryId)
    qvecOpt.filter(_ => cents.nonEmpty).fold(emptyTopK(e)) { qvec =>
      val qcid = cents.minBy { case (cid, ce) => (l2sqDriver(qvec, ce), cid) }._1
      probeTopK(assignLit(e, cents).filter(col("cid") === qcid), qvec, queryId, k)
    }
  }

  /** IVF with multi-cell probe — the recall/latency knob every production
    * IVF index exposes (nprobe): candidates come from the query vector's
    * `nprobe` L2-nearest cells instead of only its own. The cell ranking is
    * a driver computation over the ≤ nCentroids collected codebook; the
    * probe filter is `cid IN (...)` — at cluster scale, `nprobe` partitions
    * read instead of the corpus.
    */
  def ivfProbeTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, nCentroids: Int = 8, nprobe: Int = 3): DataFrame = {
    val e = ivfInput(emb, idCol, vecCol)
    val (cents, qvecOpt) = collectCentroidsAndQuery(e, nCentroids, queryId)
    qvecOpt.filter(_ => cents.nonEmpty).fold(emptyTopK(e)) { qvec =>
      val qcids = cents.map { case (cid, ce) => (l2sqDriver(qvec, ce), cid) }
        .sorted.take(nprobe).map(_._2)
      probeTopK(assignLit(e, cents).filter(col("cid").isin(qcids: _*)), qvec, queryId, k)
    }
  }

  /** IVF with a TRAINED coarse codebook: `iters` deterministic Lloyd
    * iterations from the fixed seed centroids (first `nCentroids` vectors),
    * then single-cell probe. Per iteration: one NARROW assignment pass
    * (literal-centroid argmin) and one aggregation for the element-wise
    * means (posexplode → avg by (cid, i)) — the only shuffle, and it
    * combines map-side. The ≤ nCentroids mean rows are collected and become
    * the next iteration's literals; an empty cluster keeps its previous
    * centroid. Mean uses plain `avg`; an assignment flip would need two
    * centroid distances within float-sum ulp distance (measure-zero for
    * continuous embeddings; the oracle runs the identical recipe).
    */
  def ivfTrainedTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, nCentroids: Int = 8, iters: Int = 2): DataFrame = {
    val e = ivfInput(emb, idCol, vecCol)
    var (cents, qvecOpt0) = collectCentroidsAndQuery(e, nCentroids, queryId)
    val qvecOpt = qvecOpt0.filter(_ => cents.nonEmpty)
    if (qvecOpt.isEmpty) return emptyTopK(e)
    for (_ <- 0 until iters) {
      // collect the ≤ nCentroids×dim (cid, i, mean) rows and assemble the
      // per-cid vectors on the driver (round 6): the second groupBy —
      // array_sort(collect_list(struct)) — was a whole extra exchange per
      // Lloyd iteration just to concatenate a bounded row set; sorting by i
      // driver-side is the identical assembly, and `avg` is untouched so
      // the centroid doubles are bit-identical
      val means = assignLit(e, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i")).agg(avg(col("x").cast("double")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq
        }
      cents = cents.map { case (cid, ce) => (cid, means.getOrElse(cid, ce)) }
    }
    val qvec = qvecOpt.get
    val qcid = cents.minBy { case (cid, ce) => (l2sqDriver(qvec, ce), cid) }._1
    probeTopK(assignLit(e, cents).filter(col("cid") === qcid), qvec, queryId, k)
  }

  /** Embedding-cosine near-duplicate pairs: sign-bucket LSH blocking with a
    * per-bucket neighbor cap. Round 1 blocked on the fixed-cardinality
    * `label` column — O(N²) in disguise, since each block's size grows with
    * the corpus. Sign buckets grow in NUMBER as dimensionality/bit count
    * allows, and the cap bounds any degenerate bucket, so candidate count is
    * ≤ maxNeighbors · N by construction. Near-identical vectors share the
    * full sign pattern, so true near-dups land in the same bucket.
    */
  def cosinePairsTop(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 20,
      bits: Int = 6,
      maxNeighbors: Int = 32): DataFrame = {
    val e = emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    // capped successor pairing as ONE window pass (round 6, same rewrite as
    // Dedup.lshCandidates): collect each vector's next `maxNeighbors`
    // (vec_id, v) successors within its bucket and explode — the identical
    // pair set (and identical cosine operand order: a = the lower id's
    // vector) the old rn self-join produced by scanning and
    // window-shuffling the corpus TWICE.
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("vec_id"))
      .rowsBetween(1, maxNeighbors)
    e.withColumn("succ", collect_list(struct(col("vec_id"), col("v"))).over(wNext))
      .select(col("vec_id").as("a"), col("v").as("va"), explode(col("succ")).as("s"))
      .select(col("a"), col("s.vec_id").as("b"),
        round(cosine(col("va"), col("s.v")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("a").asc, col("b").asc)
      .limit(k)
  }
}
