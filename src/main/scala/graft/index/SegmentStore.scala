package graft.index

import java.nio.file.{Files, Paths}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzers
import graft.index.Codec.Block

/** One term's compressed posting run within a document shard. A hot term
  * whose run crosses a range-partition boundary simply yields several rows
  * with disjoint (minDoc, maxDoc) ranges — that IS the skew handling: no
  * single task ever owns a hot term's full posting stream (north rule).
  */
final case class SegmentRow(
    shard: Int,
    field: String,
    term: String,
    df: Long,
    cf: Long,
    minDoc: Long,
    maxDoc: Long,
    bytes: Long,
    pid: Int, // encoding partition, for lineage
    blocks: Seq[Block])

/** Per-stage, per-partition build lineage (north rule: resumable with
  * per-partition lineage + row/term/byte metrics).
  */
final case class LineageRow(stage: String, pid: Int, rowsIn: Long, rowsOut: Long, bytesOut: Long)

/** Per-partition, per-field fold of the dl-marker rows an encode task
  * emitted: (docCount, Σdl) summed over the partition's (shard, field)
  * marker rows. Riding back on an accumulator, these give the build exact
  * field stats with ZERO read-back jobs (the old shape re-read the
  * just-written segments parquet for a metadata aggregation); the driver
  * fold dedupes by pid (retried tasks are deterministic per partition) and
  * sums longs, so the result is bit-identical to the read-back agg.
  */
final case class MarkerStat(pid: Int, field: String, docCount: Long, sumDl: Long)

/** The on-disk index: compressed posting segments + stats + spec, built in
  * resumable stages — the Spark-scale analog of the reference's Lucene index
  * directory with `last_seq` commit user data as its checkpoint
  * (/root/reference/src/main/java/com/github/rnewson/couchdb/lucene/DatabaseIndexer.java:199-211,715-729).
  *
  * Layout under `dir/`:
  *   termstats/   (field, term, df, cf) parquet (vocab-sized — stays a table)
  *   segments/    SegmentRow parquet, range-partitioned by (shard, field, term, docId)
  *   lineage/     lineage.tsv — per-partition LineageRow sidecar per stage
  *   checkpoints/ <stage>.json markers — a rerun skips completed stages —
  *                plus the driver-side metadata sidecars (round 6):
  *                spec.tsv (indexField, source, kind, analyzer, boost),
  *                fieldstats.tsv (gen, field, docCount, avgdl, sumDl).
  *                Pre-round-6 dirs carry spec/ + fieldstats/ parquet
  *                instead; readers fall back to those when no sidecar exists
  *
  * Production note: each stage's write maps 1:1 onto an Iceberg table commit
  * (snapshot id = the checkpoint); this sandbox has no Iceberg jars, so the
  * commit protocol is parquet dir + `_SUCCESS` + checkpoint marker.
  */
object SegmentStore {

  private def ckptPath(dir: String, stage: String) = Paths.get(s"$dir/checkpoints/$stage.json")

  // ---- driver-side metadata sidecars (round 6) -------------------------
  // spec, fieldstats and lineage are #fields / #generations×#fields /
  // #partitions-sized metadata that is ALREADY driver-resident at every
  // write site (FieldDefs in memory, marker-accumulator folds, lineage
  // accumulators) — the Lucene segments-info/commit-user-data analog.
  // Round-5 wrote and re-read them as parquet THROUGH Spark: one scheduled
  // job (plus a full plan/optimize cycle) per tiny table per build/open —
  // pure serial tax on the build path and a fixed per-open cost on every
  // maintenance op (guide §1.2: remove driver-synchronized passes first).
  // They are now TSV sidecars written/read driver-side with zero jobs; the
  // parquet read paths remain as fallbacks so pre-round-6 dirs still open.

  private def escTsv(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def unescTsv(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\')
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case o => sb.append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def writeTsv(path: java.nio.file.Path, lines: Seq[String]): Unit = {
    Files.createDirectories(path.getParent)
    Files.writeString(path, lines.mkString("", "\n", "\n"))
  }

  private def readTsv(path: java.nio.file.Path): Seq[Array[String]] =
    Files.readString(path).split("\n").toSeq.filter(_.nonEmpty)
      // -1: keep trailing empty cells (an empty analyzer name is legal)
      .map(_.split("\t", -1).map(unescTsv))

  private def specTsvPath(dir: String) = Paths.get(s"$dir/checkpoints/spec.tsv")

  private[graft] def fieldStatsTsvPath(dir: String) = Paths.get(s"$dir/checkpoints/fieldstats.tsv")

  /** Write the full per-generation fieldstats map (driver-side, no job). */
  private[graft] def writeFieldStatsGens(dir: String, gens: Map[String, Seq[FieldStats]]): Unit =
    writeTsv(fieldStatsTsvPath(dir),
      gens.toSeq.sortBy(_._1).flatMap { case (gen, rows) =>
        rows.sortBy(_.field).map(r =>
          s"${escTsv(gen)}\t${escTsv(r.field)}\t${r.docCount}\t" +
            s"${java.lang.Double.toString(r.avgdl)}\t${r.sumDl}")
      })

  private[graft] def readFieldStatsGens(dir: String): Option[Map[String, Seq[FieldStats]]] =
    if (!Files.exists(fieldStatsTsvPath(dir))) None
    else Some(readTsv(fieldStatsTsvPath(dir))
      .map(c => (c(0), FieldStats(c(1), c(2).toLong, java.lang.Double.parseDouble(c(3)), c(4).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap)

  /** Upsert one generation's rows into the sidecar. A pre-round-6 dir
    * (parquet generations, no sidecar) is seeded first by folding the
    * parquet ONCE under a `legacy` key — including the pre-sumDl per-row
    * reconstruction [[readFieldStats]] performs — so mixed stores keep the
    * exact openMerged fold. Idempotent per gen key (a replayed batch
    * overwrites its own rows with identical values).
    */
  private[graft] def updateFieldStatsGen(
      spark: SparkSession, dir: String, gen: String, rows: Seq[FieldStats]): Unit = {
    val existing = readFieldStatsGens(dir).orElse {
      if (!Files.exists(Paths.get(s"$dir/fieldstats"))) None
      else Some(Map("legacy" -> readFieldStats(spark, s"$dir/fieldstats").collect().toSeq
        .map(r => FieldStats(r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))))
    }.getOrElse(Map.empty)
    writeFieldStatsGens(dir, existing + (gen -> rows))
  }

  /** Lineage rows as a TSV sidecar (accumulator output — driver data). */
  private def lineageTsvPath(dir: String) = Paths.get(s"$dir/lineage/lineage.tsv")

  private[graft] def writeLineage(dir: String, rows: Seq[LineageRow]): Unit =
    writeTsv(lineageTsvPath(dir),
      rows.map(r => s"${escTsv(r.stage)}\t${r.pid}\t${r.rowsIn}\t${r.rowsOut}\t${r.bytesOut}"))

  def readLineage(dir: String): Seq[LineageRow] =
    if (!Files.exists(lineageTsvPath(dir))) Nil
    else readTsv(lineageTsvPath(dir))
      .map(c => LineageRow(c(0), c(1).toInt, c(2).toLong, c(3).toLong, c(4).toLong))

  // ---- shard spec (docsPerShard) ---------------------------------------
  // Persisted so readers can route a docId to its shard without scanning
  // segment metadata — tombstone rows are co-grouped with their shard's
  // posting rows at query time (no driver-side Set broadcast).

  private def shardSpecPath(dir: String) = Paths.get(s"$dir/checkpoints/shardspec.json")

  def hasShardSpec(dir: String): Boolean = Files.exists(shardSpecPath(dir))

  def writeShardSpec(dir: String, docsPerShard: Long): Unit = {
    Files.createDirectories(shardSpecPath(dir).getParent)
    Files.writeString(shardSpecPath(dir), s"""{"docsPerShard": $docsPerShard}""")
  }

  def docsPerShardOf(dir: String): Long =
    if (!Files.exists(shardSpecPath(dir))) {
      // A lost shardspec under an index WITH tombstones is not guessable:
      // a wrong docsPerShard routes deleted docIds to the wrong shard
      // co-group and deleted docs silently reappear. Refuse to serve.
      if (Files.exists(Paths.get(s"$dir/tombstones")))
        throw new IllegalStateException(
          s"$dir has tombstones but no checkpoints/shardspec.json — refusing to guess " +
            "docsPerShard (deletes would be silently mis-routed); restore the shardspec " +
            "or run optimize() to rewrite the index")
      1L << 20
    } else """"docsPerShard":\s*(\d+)""".r.findFirstMatchIn(Files.readString(shardSpecPath(dir)))
      .map(_.group(1).toLong).getOrElse(1L << 20)

  def stageDone(dir: String, stage: String): Boolean = Files.exists(ckptPath(dir, stage))

  /** One map-side-combined posting run (see the combine note in
    * [[encodeSegments]]): (shard, field, term, minDoc, docIds ascending,
    * tfs, dls, positions).
    */
  private[index] type MiniRun =
    (Int, String, String, Long, Array[Long], Array[Int], Array[Int], Array[Array[Int]])

  /** Postings buffered per map task before a mini-run flush — the Lucene
    * flush-by-RAM bound (~100 MB of primitive buffers at typical position
    * counts); several flush windows per task just mean several mini-runs
    * per term, which the encode-side merge folds anyway.
    */
  private[index] val FlushPostings: Int = 1 << 20

  /** Growable parallel posting buffers for one (shard, field, term)
    * mini-run of the map-side combine (shared with the fused
    * tokenize-to-mini-run pass, [[IndexBuilder.tokenizeMiniRuns]]).
    */
  private[index] final class RunBuf {
    private var n = 0
    private var isSorted = true
    private var docIds = new Array[Long](4)
    private var tfs = new Array[Int](4)
    private var dls = new Array[Int](4)
    private var poss = new Array[Array[Int]](4)
    def add(docId: Long, tf: Int, dl: Int, p: Array[Int]): Unit = {
      if (n == docIds.length) {
        val c = n * 2
        docIds = java.util.Arrays.copyOf(docIds, c)
        tfs = java.util.Arrays.copyOf(tfs, c)
        dls = java.util.Arrays.copyOf(dls, c)
        poss = java.util.Arrays.copyOf(poss, c)
      }
      if (n > 0 && docId < docIds(n - 1)) isSorted = false
      docIds(n) = docId; tfs(n) = tf; dls(n) = dl; poss(n) = p
      n += 1
    }
    /** Trimmed, docId-ascending copies (input usually arrives ascending —
      * tokenize streams docs in order — so the sort is the rare path).
      */
    def result(): (Array[Long], Array[Int], Array[Int], Array[Array[Int]]) =
      if (isSorted)
        (java.util.Arrays.copyOf(docIds, n), java.util.Arrays.copyOf(tfs, n),
          java.util.Arrays.copyOf(dls, n), java.util.Arrays.copyOf(poss, n))
      else {
        val idx = Array.range(0, n).sortBy(docIds(_))
        val d2 = new Array[Long](n)
        val t2 = new Array[Int](n)
        val l2 = new Array[Int](n)
        val p2 = new Array[Array[Int]](n)
        var i = 0
        while (i < n) {
          val j = idx(i)
          d2(i) = docIds(j); t2(i) = tfs(j); l2(i) = dls(j); p2(i) = poss(j)
          i += 1
        }
        (d2, t2, l2, p2)
      }
  }

  private def commitStage(dir: String, stage: String, metrics: Map[String, Long]): Unit = {
    Files.createDirectories(Paths.get(s"$dir/checkpoints"))
    val body = metrics.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    Files.writeString(ckptPath(dir, stage),
      s"""{"stage": "$stage", "completedAtMs": ${System.currentTimeMillis()}, "metrics": $body}""")
  }

  /** Staged, resumable build; returns the indexed doc count (max over
    * fields). `failAfterStage` is a test failpoint: throw after committing
    * that stage (kill-between-stages test, SURVEY.md §5.2).
    *
    * Serial-tax design (the N→4N scaling criterion measures exactly this):
    * the whole build is 2 corpus-scale jobs — the docID/count pass the
    * caller ran, and ONE tokenize→shuffle→encode+write job whose
    * per-partition lineage comes back through an accumulator instead of a
    * read-back agg. Term/field stats are DERIVED from the encoded segment
    * rows afterwards (df/cf per (shard, field, term) ride on every row;
    * dl-marker runs become stats-only rows carrying per-shard
    * (docCount, Σdl)) — the Lucene per-segment-stats fold, expressed as a
    * vocab×shards metadata aggregation over a column-pruned read of the
    * just-written parquet, NOT a second tokenize of the corpus. Block-max
    * bounds use block-local encAvgdl (see [[Codec.RunEncoder.encodeLocal]]),
    * which is what breaks the old stats→encode ordering dependency.
    * avgdl and docCount flow driver-side in memory; parquet read-backs
    * happen only on the (rare) resume path.
    */
  def build(
      docs: DataFrame,
      docIdCol: String,
      fields: Seq[FieldDef],
      dir: String,
      docsPerShard: Long = 1L << 20,
      failAfterStage: Option[String] = None,
      storedColumns: Seq[String] = Nil): Long = {
    val spark = docs.sparkSession
    import spark.implicits._

    def failpoint(stage: String): Unit =
      if (failAfterStage.contains(stage)) throw new RuntimeException(s"failpoint after $stage")

    Timing.timed("build.spec") {
      if (!stageDone(dir, "spec")) writeSpec(spark, dir, fields)
      if (!Files.exists(shardSpecPath(dir))) writeShardSpec(dir, docsPerShard)
    }
    failpoint("spec")

    // Stored-fields / doc-values sidecar (reference: Lucene stored fields +
    // doc values, DatabaseIndexer.java:517-633): a docId-keyed columnar
    // projection of the requested source columns, shard-partitioned and
    // docId-sorted within partitions. Typed point/range predicates filter it
    // column-pruned (the doc-values shape); the envelope's sort keys and
    // include_fields join back against it. Skipped entirely when no columns
    // are requested.
    def runStored(): Unit =
      Timing.timed("build.stored") {
        // AQE-coalescible (no explicit count) — see the encodeSegments note;
        // also keeps output files near the advisory size instead of one
        // sliver per session shuffle partition (guide: file sizing on write)
        docs.select(col(docIdCol).cast("long").as("docId") +: storedColumns.map(col): _*)
          .withColumn("shard", (col("docId") / lit(docsPerShard)).cast("int"))
          .repartition(col("shard"))
          .sortWithinPartitions("docId")
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/stored")
        commitStage(dir, "stored", Map("columns" -> storedColumns.size.toLong))
      }
    val needStored = storedColumns.nonEmpty && !stageDone(dir, "stored")
    // The stored sidecar and the encode job are independent (both read only
    // the source `docs`), so on the normal path they run CONCURRENTLY
    // (guide §2.6 "overlap independent jobs"): the stored write back-fills
    // executor capacity the encode's stage tails leave idle, instead of
    // serializing a whole extra corpus-scan job ahead of it. The failpoint
    // path keeps the legacy sequential order so the kill-between-stages
    // resume tests exercise the exact stage boundaries they name.
    val overlapStored = needStored && failAfterStage.isEmpty && !stageDone(dir, "segments")
    if (needStored && !overlapStored) runStored()
    failpoint("stored")

    // ONE corpus-scale job: tokenize → shard shuffle → encode → write.
    // The build reads AND shuffles the source exactly one
    // time; stats are derived from the encoded rows below. (The round-4
    // persist-vs-recompute dilemma — cache postings between a stats pass
    // and an encode pass, or tokenize twice — is gone: there is only one
    // consumer now.)
    val needStats = !stageDone(dir, "stats")
    val needSegments = !stageDone(dir, "segments")

    // marker stats ride the encode job's accumulator (fresh builds) — the
    // stats stage then writes field stats with NO read-back aggregation;
    // the read-back fold below stays as the resume path only
    var markerStatsMem: Option[IndexedSeq[FieldStats]] = None
    val storedPool =
      if (overlapStored) Some(java.util.concurrent.Executors.newFixedThreadPool(1)) else None
    val storedFut = storedPool.map { p =>
      scala.concurrent.Future(runStored())(scala.concurrent.ExecutionContext.fromExecutor(p))
    }
    if (needSegments) try {
      Timing.timed("build.encode") {
        // dl-marker rows are NOT shipped through the shuffle (round 5): the
        // encode tasks reconstruct each (shard, field)'s marker from the
        // postings they already stream — exact, because a marker exists iff
        // the (field, doc) has ≥1 posting — which drops one shuffle row per
        // (doc, field) from the build's widest stage. Falls back to shipped
        // markers only for docsPerShard beyond the BitSet range.
        val recon = docsPerShard <= Int.MaxValue
        // per-partition lineage rides back on an accumulator — the round-2
        // build re-read the committed segments for a metadata agg (a pure
        // driver-synchronized second job)
        val linAcc = spark.sparkContext.collectionAccumulator[LineageRow]("graft.lineage")
        val mkAcc = spark.sparkContext.collectionAccumulator[MarkerStat]("graft.markerstats")
        // recon path: the FUSED tokenize→mini-run pass (no per-posting
        // object stream — see IndexBuilder.tokenizeMiniRuns); the wide-shard
        // fallback keeps the posting stream since it must ship markers
        val encoded =
          if (recon)
            encodeRuns(IndexBuilder.tokenizeMiniRuns(docs, docIdCol, fields, docsPerShard),
              Some(linAcc), reconstructMarkers = true, Some(mkAcc), docsPerShard)
          else
            encodeSegments(IndexBuilder.tokenizePostingsWithMarkers(docs, docIdCol, fields),
              docsPerShard, Some(linAcc), reconstructMarkers = false, markerAcc = Some(mkAcc))
        encoded.write.mode(SaveMode.Overwrite).parquet(s"$dir/segments")
        // dedupe by pid: a speculative/retried task may report twice; the
        // rows are deterministic per partition so first-wins is exact
        val rows = {
          import scala.jdk.CollectionConverters._
          linAcc.value.asScala.groupBy(_.pid).map(_._2.head).toIndexedSeq.sortBy(_.pid)
        }
        markerStatsMem = {
          import scala.jdk.CollectionConverters._
          Some(foldMarkerStats(mkAcc.value.asScala.toSeq))
        }
        writeLineage(dir, rows) // accumulator output — driver write, no job
        commitStage(dir, "segments",
          Map("segmentRows" -> rows.map(_.rowsOut).sum, "postingBytes" -> rows.map(_.bytesOut).sum,
            "postingsIn" -> rows.map(_.rowsIn).sum))
      }
    } finally {
      // join the overlapped stored write before any later stage (and before
      // returning or propagating a failure): build() must never leave the
      // sidecar write in flight
      storedFut.foreach { f =>
        try scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
        finally storedPool.foreach(_.shutdown())
      }
    }
    failpoint("segments")

    var fieldStatsMem: Option[Seq[FieldStats]] = None
    if (needStats) {
      Timing.timed("build.stats") {
        // per-segment stats fold: vocab×shards METADATA rows, column-pruned
        // off the just-written parquet (blocks never read) — sums of longs,
        // so the totals are bit-identical to a direct postings aggregation
        val seg = readSegments(spark, s"$dir/segments")
          .select(col("field"), col("term"), col("df"), col("cf"))
        seg.filter(col("term") =!= IndexBuilder.DlMarker)
          .groupBy(col("field"), col("term"))
          .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
          .as[TermStats]
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/termstats")
        // field stats: folded from the encode job's marker accumulator when
        // the encode ran in THIS call (zero extra jobs); the read-back agg
        // over the marker segment rows is the resume path (segments stage
        // committed by an earlier, crashed run)
        val fsRows = markerStatsMem.getOrElse {
          seg.filter(col("term") === IndexBuilder.DlMarker)
            .groupBy(col("field"))
            .agg(sum(col("df")).as("docCount"), (sum(col("cf")) / sum(col("df"))).as("avgdl"),
              sum(col("cf")).as("sumDl"))
            .as[FieldStats].collect().toIndexedSeq
        }
        writeFieldStatsGens(dir, Map("base" -> fsRows)) // driver write, no job
        fieldStatsMem = Some(fsRows)
        commitStage(dir, "stats",
          Map("docCount" -> fsRows.map(_.docCount).maxOption.getOrElse(0L)))
      }
    }
    failpoint("stats")
    fieldStatsMem.map(_.map(_.docCount).maxOption.getOrElse(0L))
      .orElse(stageMetric(dir, "stats", "docCount"))
      .getOrElse(0L)
  }

  /** A committed stage's numeric metric from its checkpoint marker. */
  def stageMetric(dir: String, stage: String, key: String): Option[Long] = {
    val p = ckptPath(dir, stage)
    if (!Files.exists(p)) None
    else s""""$key":\\s*(\\d+)""".r.findFirstMatchIn(Files.readString(p)).map(_.group(1).toLong)
  }

  /** Canonical digest of an index field spec — the identity the reference
    * bakes into its index directory name (a changed view function ⇒ a new
    * digest ⇒ a fresh index dir, DatabaseIndexer.java:343-348 /
    * LuceneServlet cleanup). Pure function of the FieldDefs.
    */
  def specDigest(fields: Seq[FieldDef]): String = {
    val canon = fields.map { f =>
      val (kind, an) = f.kind match {
        case TextField(a) => ("text", analyzerName(a))
        case StringField => ("string", "")
      }
      s"${f.indexField}|${f.source}|$kind|$an|${f.boost}"
    }.mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** True when `dir` holds a committed spec that differs from `fields` —
    * the signal that the index must be rebuilt from scratch (the reference
    * ends its changes loop on a design-doc change and starts a fresh
    * digest-named dir).
    */
  def specChanged(spark: SparkSession, dir: String, fields: Seq[FieldDef]): Boolean =
    stageDone(dir, "spec") && persistedSpecDigest(spark, dir).exists(_ != specDigest(fields))

  private def specDigestPath(dir: String) = Paths.get(s"$dir/checkpoints/spec.digest")

  /** The committed spec's digest. Served from the tiny digest file when
    * present (written by [[writeSpec]] since round 4 — cheap enough to poll
    * every micro-batch); falls back to re-digesting the spec parquet for
    * dirs written by earlier rounds.
    */
  def persistedSpecDigest(spark: SparkSession, dir: String): Option[String] =
    if (Files.exists(specDigestPath(dir))) Some(Files.readString(specDigestPath(dir)).trim)
    else if (stageDone(dir, "spec")) Some(specDigest(open0Fields(spark, dir)))
    else None

  /** Spec schema pinned at read (round 6): schema inference over the spec
    * parquet was a per-open job; `boost` entered the schema in round 2, so a
    * round-1 dir reads it as null → 1.0.
    */
  private val SpecSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "indexField STRING, source STRING, kind STRING, analyzer STRING, boost DOUBLE")

  private def open0Fields(spark: SparkSession, dir: String): Seq[FieldDef] = {
    import spark.implicits._
    def mk(idxF: String, src: String, kind: String, an: String, boost: Double): FieldDef =
      FieldDef(idxF, src, kind match {
        case "text" => TextField(Analyzers.byName(an))
        case "string" => StringField
      }, boost)
    // sidecar first (driver read, no job); parquet fallback for old dirs
    if (Files.exists(specTsvPath(dir)))
      readTsv(specTsvPath(dir)).map(c => mk(c(0), c(1), c(2), c(3), c(4).toDouble))
    else
      spark.read.schema(SpecSchema).parquet(s"$dir/spec")
        .select(col("indexField"), col("source"), col("kind"), col("analyzer"),
          coalesce(col("boost"), lit(1.0)).as("boost"))
        .as[(String, String, String, String, Double)].collect()
        .map { case (idxF, src, kind, an, boost) => mk(idxF, src, kind, an, boost) }.toSeq
  }

  /** Commit the index field spec (queryable name, source column, kind,
    * analyzer) — readable without the builder, so [[open]] reconstructs
    * analyzers. Shared by the batch build and the incremental appender.
    */
  def writeSpec(spark: SparkSession, dir: String, fields: Seq[FieldDef]): Unit = {
    // driver-side sidecar write (round 6): the spec is #fields rows of
    // in-memory data — the old coalesce(1) parquet write scheduled a whole
    // Spark job (plus a plan cycle) per build/append to persist a kilobyte
    writeTsv(specTsvPath(dir), fields.map { f =>
      val (kind, an) = f.kind match {
        case TextField(a) => ("text", analyzerName(a))
        case StringField => ("string", "")
      }
      s"${escTsv(f.indexField)}\t${escTsv(f.source)}\t$kind\t${escTsv(an)}\t" +
        java.lang.Double.toString(f.boost)
    })
    Files.createDirectories(specDigestPath(dir).getParent)
    Files.writeString(specDigestPath(dir), specDigest(fields))
    commitStage(dir, "spec", Map("fields" -> fields.size.toLong))
  }

  /** The encode pipeline: explicit range-partitioned shuffle of the term
    * space within doc shards; the sort brings each (shard, field, term) run
    * contiguous and docId-ordered for the block encoder (SURVEY.md §2.5).
    * Shared by the batch build and the incremental (streaming) appender.
    */
  /** `reconstructMarkers`: for inputs WITHOUT dl-marker rows (the optimize
    * path decodes postings only — stats-only rows have no blocks to
    * decode), re-derive each (shard, field)'s marker row inside the encode
    * task: partitions hold whole shards and runs arrive sorted by
    * (shard, field, term, docId), so a per-(shard, field) BitSet over
    * LOCAL docIds (≤ docsPerShard bits, reused across groups) counts each
    * doc once and sums its dl — field stats then fold from segment
    * metadata with NO extra pass over the postings. Never set this when
    * the input already carries marker rows (they would double-count).
    */
  def encodeSegments(
      postings: Dataset[Posting],
      docsPerShard: Long,
      lineageAcc: Option[org.apache.spark.util.CollectionAccumulator[LineageRow]] = None,
      reconstructMarkers: Boolean = false,
      markerAcc: Option[org.apache.spark.util.CollectionAccumulator[MarkerStat]] = None): Dataset[SegmentRow] = {
    val spark = postings.sparkSession
    import spark.implicits._
    // ---- map-side run combine (round 6; guide §2.3 "aggregate before you
    // shuffle"). The old shape shuffled ONE ROW PER POSTING and then
    // Tungsten-sorted every posting row by (shard, field, term, docId)
    // inside the encode partitions — measured at 4 cores / 613k turns that
    // in-partition sort alone was HALF the whole encode stage (5.7 s of
    // 11.8 s) and the posting-row shuffle another quarter. Postings are now
    // combined into per-(shard, field, term) MINI-RUNS inside each map task
    // first — the Lucene flush-then-merge shape: the exchange ships one row
    // per term per flush window (~vocab-sized, not corpus-sized; same
    // payload bytes), and the reduce sort orders run KEYS instead of every
    // posting. The encode tasks merge a term's mini-runs back into one
    // docId-ordered run: mini-runs are docId-sorted and (build path) cover
    // disjoint docId ranges, so the merge is a concatenation; overlapping
    // ranges (possible on exotic inputs) fall back to an index sort of that
    // run. The encoder then sees EXACTLY the posting sequence the old
    // per-posting sort produced, so every SegmentRow — blocks, stats,
    // min/max — is bit-identical (SegmentSpec/StreamingSpec/WandSpec +
    // the seg_* oracle gates pin this end-to-end).
    //
    // Memory bound: a map task buffers at most FlushPostings postings
    // before flushing its mini-runs downstream — Lucene's flush-by-RAM —
    // so a giant input split cannot grow the combine without bound.
    //
    // Shard exchange notes (unchanged): hash-partition by shard (shard
    // sizes are bounded by docsPerShard — balanced by construction); no
    // explicit partition count, AQE coalesces from observed sizes, and
    // coalescing merges whole post-shuffle partitions so the whole-shards-
    // per-partition invariant the marker reconstruction needs is preserved.
    val mini: Dataset[SegmentStore.MiniRun] = postings.mapPartitions { it =>
      new Iterator[SegmentStore.MiniRun] {
        private var out: Iterator[SegmentStore.MiniRun] = Iterator.empty
        private def refill(): Unit = {
          val bufs = new scala.collection.mutable.HashMap[(Int, String, String), RunBuf]()
          var buffered = 0
          while (it.hasNext && buffered < FlushPostings) {
            val p = it.next()
            val shard = (p.docId / docsPerShard).toInt
            bufs.getOrElseUpdate((shard, p.field, p.term), new RunBuf())
              .add(p.docId, p.tf, p.dl, p.positions)
            buffered += 1
          }
          out = bufs.iterator.map { case ((shard, field, term), b) =>
            val (d, t, l, ps) = b.result()
            (shard, field, term, d(0), d, t, l, ps)
          }
        }
        def hasNext: Boolean = {
          while (!out.hasNext && it.hasNext) refill()
          out.hasNext
        }
        def next(): SegmentStore.MiniRun = out.next()
      }
    }
    encodeRuns(mini, lineageAcc, reconstructMarkers, markerAcc, docsPerShard)
  }

  /** The post-combine half of [[encodeSegments]]: shard-shuffle the
    * mini-runs, merge each (shard, field, term)'s runs docId-ascending, and
    * block-encode. Callable directly with mini-runs built by the FUSED
    * tokenize pass ([[IndexBuilder.tokenizeMiniRuns]]), which skips the
    * per-posting object stream entirely.
    */
  private[graft] def encodeRuns(
      mini: Dataset[SegmentStore.MiniRun],
      lineageAcc: Option[org.apache.spark.util.CollectionAccumulator[LineageRow]],
      reconstructMarkers: Boolean,
      markerAcc: Option[org.apache.spark.util.CollectionAccumulator[MarkerStat]],
      docsPerShard: Long): Dataset[SegmentRow] = {
    val spark = mini.sparkSession
    import spark.implicits._
    val sortedRuns = mini
      .toDF("shard", "field", "term", "minDoc", "docIds", "tfs", "dls", "poss")
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("field"), col("term"), col("minDoc"))
      .as[SegmentStore.MiniRun]

    val encodeFn = (it: Iterator[SegmentStore.MiniRun]) => {
      val pid = TaskContext.getPartitionId()
      val src = it.buffered
      // reusable run buffers + encoder per task (VERDICT r3 #1b): no boxed
      // per-posting objects in the build's widest stage — the allocation
      // bandwidth the N→4N scaling gate is sensitive to
      val enc = new Codec.RunEncoder
      new Iterator[SegmentRow] {
        private var cap = 1024
        private var docIds = new Array[Long](cap)
        private var tfs = new Array[Int](cap)
        private var dls = new Array[Int](cap)
        private var poss = new Array[Array[Int]](cap)
        private def grow(): Unit = {
          cap *= 2
          docIds = java.util.Arrays.copyOf(docIds, cap)
          tfs = java.util.Arrays.copyOf(tfs, cap)
          dls = java.util.Arrays.copyOf(dls, cap)
          poss = java.util.Arrays.copyOf(poss, cap)
        }
        /** Index-sort the first `n` buffered postings by docId (the rare
          * overlapping-mini-run fallback — see the merge note above).
          */
        private def sortRun(n: Int): Unit = {
          val idx = Array.range(0, n).sortBy(docIds(_))
          val d2 = new Array[Long](n)
          val t2 = new Array[Int](n)
          val l2 = new Array[Int](n)
          val p2 = new Array[Array[Int]](n)
          var i = 0
          while (i < n) {
            val j = idx(i)
            d2(i) = docIds(j); t2(i) = tfs(j); l2(i) = dls(j); p2(i) = poss(j)
            i += 1
          }
          System.arraycopy(d2, 0, docIds, 0, n)
          System.arraycopy(t2, 0, tfs, 0, n)
          System.arraycopy(l2, 0, dls, 0, n)
          System.arraycopy(p2, 0, poss, 0, n)
        }
        // marker-reconstruction state (reconstructMarkers only): the
        // current (shard, field) group's distinct-doc bitset + stats
        private var mShard = -1
        private var mField: String = null
        private var mBits: java.util.BitSet = null
        private var mCount = 0L
        private var mSum = 0L
        private var mMin = Long.MaxValue
        private var mMax = Long.MinValue
        private def flushMarker(): SegmentRow = {
          val r = SegmentRow(mShard, mField, IndexBuilder.DlMarker,
            mCount, mSum, mMin, mMax, 0L, pid, Vector.empty)
          mField = null; mCount = 0L; mSum = 0L
          mMin = Long.MaxValue; mMax = Long.MinValue
          if (mBits != null) mBits.clear()
          r
        }
        def hasNext: Boolean = src.hasNext || mField != null
        def next(): SegmentRow = {
          if (!src.hasNext) return flushMarker() // tail group's marker
          val shard = src.head._1
          val field = src.head._2
          val term = src.head._3
          if (reconstructMarkers && mField != null &&
            (shard != mShard || field != mField)) {
            return flushMarker() // group changed: emit previous marker first
          }
          if (reconstructMarkers && mField == null) {
            mShard = shard; mField = field
            if (mBits == null) {
              require(docsPerShard <= Int.MaxValue,
                s"reconstructMarkers needs docsPerShard <= Int.MaxValue, got $docsPerShard")
              // grow-on-demand: docIds are dense (DocIds.assign), so the
              // bitset tops out at the shard's ACTUAL population — never the
              // nominal docsPerShard (which may be 2^31: a 256 MB/task
              // preallocation for a shard holding a few million docs)
              mBits = new java.util.BitSet()
            }
          }
          // merge the key's mini-runs into the reusable buffers; min/max and
          // cf accumulate during the append (order-insensitive), the bitset
          // marker fold likewise counts each (field, doc) once in any order
          var n = 0
          var cf = 0L
          var minDoc = Long.MaxValue
          var maxDoc = Long.MinValue
          var runSorted = true
          while (src.hasNext && src.head._1 == shard &&
            src.head._2 == field && src.head._3 == term) {
            val r = src.next()
            val (rd, rt, rl, rp) = (r._5, r._6, r._7, r._8)
            if (n > 0 && rd(0) < docIds(n - 1)) runSorted = false
            if (rd(0) < minDoc) minDoc = rd(0)
            if (rd(rd.length - 1) > maxDoc) maxDoc = rd(rd.length - 1)
            var i = 0
            while (i < rd.length) {
              if (n == cap) grow()
              val docId = rd(i)
              docIds(n) = docId; tfs(n) = rt(i); dls(n) = rl(i); poss(n) = rp(i)
              n += 1
              cf += rt(i)
              if (reconstructMarkers) {
                // count each (field, doc) once across all its term runs
                val local = (docId - shard.toLong * docsPerShard).toInt
                if (!mBits.get(local)) {
                  mBits.set(local)
                  mCount += 1
                  mSum += rl(i)
                  if (docId < mMin) mMin = docId
                  if (docId > mMax) mMax = docId
                }
              }
              i += 1
            }
          }
          if (term == IndexBuilder.DlMarker) {
            // dl-marker run → STATS-ONLY segment row, no blocks: markers
            // carry tf = dl per (doc, field), so this run's (df, cf) IS the
            // shard's (docCount, Σdl) for the field. The stats stage folds
            // these rows into fieldstats — field stats ride the encode
            // shuffle for free instead of paying their own corpus pass.
            SegmentRow(shard, field, term, n.toLong, cf, minDoc, maxDoc, 0L, pid, Vector.empty)
          } else {
            if (!runSorted) sortRun(n)
            val blocks = enc.encodeLocal(docIds, tfs, dls, poss, n)
            var bytes = 0L
            blocks.foreach(b => bytes +=
              b.docBytes.length + b.tfBytes.length + b.dlBytes.length + b.posBytes.length)
            SegmentRow(shard, field, term, n.toLong, cf, minDoc, maxDoc, bytes, pid, blocks)
          }
        }
      }
    }
    if (lineageAcc.isEmpty && markerAcc.isEmpty) sortedRuns.mapPartitions(encodeFn)
    else
      sortedRuns.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val out = encodeFn(it)
        new Iterator[SegmentRow] {
          private var rowsIn = 0L
          private var rowsOut = 0L
          private var bytesOut = 0L
          // per-field (docCount, Σdl) fold of this partition's marker rows —
          // emitted once at exhaustion so the accumulator carries
          // #partitions × #fields rows, never one per (shard, field)
          private val perField = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
          private var reported = false
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !reported) {
              reported = true // report once; empty partitions stay silent
              if (rowsOut > 0)
                lineageAcc.foreach(_.add(LineageRow("segments", pid, rowsIn, rowsOut, bytesOut)))
              markerAcc.foreach(acc => perField.foreach { case (f, (dc, sd)) =>
                acc.add(MarkerStat(pid, f, dc, sd))
              })
            }
            h
          }
          def next(): SegmentRow = {
            val r = out.next()
            // stats-only marker rows are metadata, not postings — keep
            // the lineage invariant rowsIn == postings tokenized
            if (r.term != IndexBuilder.DlMarker) {
              rowsIn += r.df; rowsOut += 1; bytesOut += r.bytes
            } else if (markerAcc.isDefined) {
              val cur = perField.getOrElse(r.field, (0L, 0L))
              perField.update(r.field, (cur._1 + r.df, cur._2 + r.cf))
            }
            r
          }
        }
      }
  }

  /** Fold a marker-stat accumulator's rows into exact [[FieldStats]]: dedupe
    * by (pid, field) — a speculative/retried task may report twice, and the
    * rows are deterministic per partition — then sum longs per field. The
    * division is the same long→double cast as the read-back agg's
    * `sum(cf)/sum(df)`, so the stats are bit-identical.
    */
  /** [[foldMarkerStats]] straight off an accumulator — for the incremental
    * appender (same dedupe + fold, one definition).
    */
  private[graft] def foldMarkerStatsPublic(
      acc: org.apache.spark.util.CollectionAccumulator[MarkerStat]): IndexedSeq[FieldStats] = {
    import scala.jdk.CollectionConverters._
    foldMarkerStats(acc.value.asScala.toSeq)
  }

  private def foldMarkerStats(rows: Seq[MarkerStat]): IndexedSeq[FieldStats] =
    rows.groupBy(m => (m.pid, m.field)).map(_._2.head).toSeq
      .groupBy(_.field).map { case (f, ms) =>
        val dc = ms.map(_.docCount).sum
        val sd = ms.map(_.sumDl).sum
        FieldStats(f, dc, sd.toDouble / dc.toDouble, sd)
      }.toIndexedSeq.sortBy(_.field)

  /** Open an index whose `termstats`/`fieldstats`/`segments` hold several
    * appended generations (incremental maintenance): stats are folded at
    * read — Lucene's multi-segment reader, expressed as aggregations.
    * NOTE: assumes a doc appears in at most one generation (append-only
    * corpus; updates go through tombstones + optimize).
    */
  def openMerged(spark: SparkSession, dir: String): SegmentIndex = {
    import spark.implicits._
    val (base, fsRows) = openRaw(spark, dir)
    val mergedTerm = base.termStats
      .groupBy($"field", $"term")
      .agg(sum($"df").as("df"), sum($"cf").as("cf"))
      .as[TermStats]
    // exact fold: Σdl travels as a long per generation, so the merged avgdl
    // is one division over exact integer sums — no docCount·avgdl FP
    // round-trip that could drift after many appended generations. The
    // per-generation rows are tiny (#generations × #fields), so the fold
    // runs on the driver over the SAME collect open() already did (round 6:
    // the old shape read the fieldstats dir twice per openMerged and paid a
    // groupBy exchange job for the fold).
    val mergedField = fsRows
      .groupBy(_.field).map { case (f, gens) =>
        val dc = gens.map(_.docCount).sum
        val sd = gens.map(_.sumDl).sum
        f -> FieldStats(f, dc, sd.toDouble / dc.toDouble, sd)
      }
    new SegmentIndex(base.segments, mergedTerm, mergedField, base.fields, base.docsPerShard,
      stored = base.stored)
  }

  /** `_optimize` analog (reference DatabaseIndexer.java:274-279,
    * forceMerge(1)): decode every run, drop tombstoned docs, and re-encode
    * each (shard, field, term) as a single fresh run with tight blocks.
    * Writes a full replacement `segments/` + stats (new dir returned).
    *
    * Single-pass like the build (round 5): decode → anti-join → ONE
    * shuffle+encode job; the encode tasks reconstruct each
    * (shard, field)'s marker row from the postings they already see
    * (`reconstructMarkers` — a per-group distinct-doc BitSet), and
    * term/field stats fold from the new segments' metadata. No persist of
    * the decoded postings, no separate stats aggregations — the old shape
    * ran three corpus-scale passes over a MEMORY_AND_DISK cache.
    */
  def optimize(spark: SparkSession, dir: String, outDir: String, docsPerShard: Long = -1L): Unit = {
    import spark.implicits._
    // default (non-positive): carry the source index's shard spec — a
    // maintenance op should not silently re-shard the corpus
    val dps = if (docsPerShard > 0) docsPerShard else docsPerShardOf(dir)
    // tombstones dropped via anti-join (never a driver-side Set — at scale
    // deletes are normal state, potentially corpus-sized)
    val decoded: Dataset[Posting] = readSegments(spark, s"$dir/segments").as[SegmentRow]
      .flatMap { row =>
        row.blocks.iterator.flatMap(Codec.decode(_).iterator)
          .map(d => Posting(row.field, row.term, d.docId, d.tf, d.positions, d.dl))
      }
    // re-select in Posting declaration order: the using-join moves docId to
    // the front, and encodeSegments binds a positional tuple encoder
    val postings = decoded.join(deletedDocsDF(spark, dir), Seq("docId"), "left_anti")
      .select("field", "term", "docId", "tf", "positions", "dl")
      .as[Posting]
    // spec carries over; stats recomputed post-expunge
    java.nio.file.Files.createDirectories(Paths.get(outDir))
    writeShardSpec(outDir, dps)
    // spec carries over VERBATIM — byte-level file copies (round 6): the
    // old read→rewrite through Spark was a whole job to reproduce a
    // kilobyte file the source dir already holds. The sidecar TSV is the
    // primary form; a pre-round-6 source additionally carries the spec
    // parquet, copied as-is so the optimized dir opens under either path.
    if (Files.exists(specTsvPath(dir))) {
      Files.createDirectories(specTsvPath(outDir).getParent)
      Files.copy(specTsvPath(dir), specTsvPath(outDir),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    deleteRecursively(s"$outDir/spec")
    if (Files.exists(Paths.get(s"$dir/spec"))) {
      Files.createDirectories(Paths.get(s"$outDir/spec"))
      scala.util.Using.resource(Files.list(Paths.get(s"$dir/spec")))(_.forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.copy(p, Paths.get(s"$outDir/spec").resolve(p.getFileName))
      })
    }
    if (Files.exists(specDigestPath(dir))) {
      Files.createDirectories(specDigestPath(outDir).getParent)
      Files.copy(specDigestPath(dir), specDigestPath(outDir),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    commitStage(outDir, "spec", Map.empty)
    // stored sidecar: expunge tombstoned rows too — a doc-value-only query
    // (no posting conjunction) reads stored directly, so a row surviving
    // its postings would resurrect the deleted doc
    if (Files.exists(Paths.get(s"$dir/stored"))) {
      readInferred(spark, s"$dir/stored")
        .join(deletedDocsDF(spark, dir), Seq("docId"), "left_anti")
        .withColumn("shard", (col("docId") / lit(dps)).cast("int"))
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stored")
      commitStage(outDir, "stored", Map.empty)
    }
    // marker strategy mirrors build's, keyed on the SAME pinned shard spec.
    // Marker segment rows are stats-only (no blocks) in EVERY index, so the
    // decode above never recovers marker postings; for dps <= Int.MaxValue
    // the encode tasks reconstruct them (bitset path), and for a wider
    // shard spec — where reconstruction's local-offset bitset can't exist
    // and hardcoding reconstructMarkers = true crashed every optimize on
    // encodeSegments' require — the (field, doc, dl) markers are
    // re-synthesized from the decoded postings (dl rides every posting;
    // distinct is the same shape tokenizePostingsWithMarkers ships at build)
    val recon = dps <= Int.MaxValue
    val encodable =
      if (recon) postings
      else postings.unionByName(
        postings.select(col("field"), col("docId"), col("dl")).distinct()
          .select(col("field"), lit(IndexBuilder.DlMarker).as("term"), col("docId"),
            col("dl").as("tf"), lit(Array.empty[Int]).as("positions"), col("dl"))
          .as[Posting])
    val mkAcc = spark.sparkContext.collectionAccumulator[MarkerStat]("graft.markerstats")
    encodeSegments(encodable, dps, reconstructMarkers = recon, markerAcc = Some(mkAcc))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/segments")
    commitStage(outDir, "segments", Map.empty)
    val seg = readSegments(spark, s"$outDir/segments")
      .select(col("field"), col("term"), col("df"), col("cf"))
    seg.filter(col("term") =!= IndexBuilder.DlMarker)
      .groupBy(col("field"), col("term"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
      .as[TermStats]
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/termstats")
    // field stats fold from the encode job's marker accumulator — the
    // optimize runs its encode unconditionally, so no read-back fallback
    val fsRows = {
      import scala.jdk.CollectionConverters._
      foldMarkerStats(mkAcc.value.asScala.toSeq)
    }
    writeFieldStatsGens(outDir, Map("base" -> fsRows)) // driver write, no job
    commitStage(outDir, "stats", Map.empty)
  }

  /** `_cleanup` analog (reference LuceneServlet.java:75-118 deletes index
    * directories no longer referenced): optimize into a staging dir, then
    * swap it in and expire every superseded generation file — appended
    * `termstats`/`fieldstats`/`segments` generations and the tombstone log
    * all collapse to one fresh generation, so an incrementally-maintained
    * index stops growing monotonically. A stale staging dir from a crashed
    * prior attempt is discarded and rebuilt (the swap itself is the
    * non-atomic window; production maps this to an Iceberg
    * snapshot-replace commit, see the class note above).
    */
  def optimizeInPlace(spark: SparkSession, dir: String, docsPerShard: Long = -1L): Unit = {
    val dps = if (docsPerShard > 0) docsPerShard else docsPerShardOf(dir)
    val staging = s"$dir/staging-optimize"
    deleteRecursively(staging)
    optimize(spark, dir, staging, dps)
    val subs = Seq("spec", "termstats", "fieldstats", "segments") ++
      (if (Files.exists(Paths.get(s"$staging/stored"))) Seq("stored") else Nil)
    subs.foreach { sub =>
      // spec/fieldstats live in the checkpoint sidecars since round 6, so
      // their staged parquet dirs exist only when the SOURCE was an old
      // store; the stale live dir is dropped either way (the swapped-in
      // sidecar is authoritative)
      deleteRecursively(s"$dir/$sub")
      if (Files.exists(Paths.get(s"$staging/$sub"))) {
        Files.move(Paths.get(s"$staging/$sub"), Paths.get(s"$dir/$sub"))
        // `_cleanup` hygiene: drop the Hadoop commit side-files (`_SUCCESS`,
        // `.crc`) from the swapped-in dirs — generation promotion only ever
        // moves `*.parquet`, and these markers are per-write artifacts, not
        // index data; leaving them made the "cleanup shrinks the dir"
        // observable depend on how many part files the writes happened to emit
        scala.util.Using.resource(Files.list(Paths.get(s"$dir/$sub")))(_.forEach { p =>
          val n = p.getFileName.toString
          if (!n.endsWith(".parquet")) Files.delete(p)
        })
      }
    }
    // promote the staged metadata sidecars over the live ones
    Seq(specTsvPath _, specDigestPath _, fieldStatsTsvPath _).foreach { pathOf =>
      if (Files.exists(pathOf(staging))) {
        Files.createDirectories(pathOf(dir).getParent)
        Files.move(pathOf(staging), pathOf(dir),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    // compact the upsert key map (if any): drop rows whose docIds the
    // optimize just expunged, BEFORE clearing the tombstone log
    if (Files.exists(Paths.get(s"$dir/keys"))) {
      val live = readInferred(spark, s"$dir/keys")
        .join(deletedDocsDF(spark, dir), Seq("docId"), "left_anti")
      val compacted = s"$dir/keys-compact"
      live.write.mode(SaveMode.Overwrite).parquet(compacted)
      deleteRecursively(s"$dir/keys")
      Files.move(Paths.get(compacted), Paths.get(s"$dir/keys"))
    }
    deleteRecursively(s"$dir/tombstones")
    writeShardSpec(dir, dps)
    deleteRecursively(staging)
  }

  private[graft] def deleteRecursively(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path)) {
      // Files.walk streams hold an open directory fd until closed — leaks
      // per micro-batch in the long-running streaming indexer (ADVICE r2)
      scala.util.Using.resource(Files.walk(path)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(Files.delete(_))
      }
    }
  }

  /** Total file count under an index dir — the observable that `_cleanup`
    * shrinks (generation hygiene).
    */
  def fileCount(dir: String): Long = {
    val path = Paths.get(dir)
    if (!Files.exists(path)) 0L
    else scala.util.Using.resource(Files.walk(path))(_.filter(Files.isRegularFile(_)).count())
  }

  /** Delete-by-docId: tombstone file, honored by [[SegmentSearcher]] and
    * dropped for real by [[optimize]] — the reference's `deleteDocuments` +
    * `_expunge` pair (DatabaseIndexer.java:350-355,266-271).
    */
  def deleteDocs(spark: SparkSession, dir: String, docIds: Seq[Long]): Unit = {
    import spark.implicits._
    // this overload's input is by construction a driver-resident (bounded)
    // id list — write it as ONE file instead of fanning a LocalTableScan
    // across default parallelism (32+ near-empty tasks and part files per
    // delete call; the DataFrame overload below stays the corpus-scale path)
    deleteDocs(docIds.toDS().toDF("docId").coalesce(1), dir)
  }

  /** Distributed delete: tombstone a whole DataFrame of docIds without ever
    * materializing the delete set on the driver — at scale deletes are
    * normal state, potentially corpus-sized (the upsert path already writes
    * tombstones this way; this is the public API for it).
    */
  def deleteDocs(docIds: DataFrame, dir: String): Unit =
    docIds.select(col("docId").cast("long").as("docId"))
      .write.mode(SaveMode.Append).parquet(s"$dir/tombstones")

  /** Tombstoned docIds as a (distinct) DataFrame — the scale-safe shape:
    * the query path co-groups these with segment rows per shard, and
    * [[optimize]] anti-joins them; nothing is collected to the driver.
    */
  def deletedDocsDF(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (!Files.exists(Paths.get(s"$dir/tombstones"))) spark.emptyDataset[Long].toDF("docId")
    else spark.read.schema("docId BIGINT").parquet(s"$dir/tombstones").distinct()
  }

  /** Driver-side tombstone set — bounded uses only (tests, info counts). */
  def deletedDocs(spark: SparkSession, dir: String): Set[Long] = {
    import spark.implicits._
    deletedDocsDF(spark, dir).as[Long].collect().toSet
  }

  /** Index info — the reference's `GET .../{view}` stats endpoint analog
    * (DatabaseIndexer.java:386-430): doc/term/byte counts and field list.
    */
  def info(spark: SparkSession, dir: String): Map[String, Any] = {
    val idx = openMerged(spark, dir)
    val seg = idx.segments
    // ONE action for all the distributed counts: the segment-metadata agg
    // and the tombstone count cross-joined into a single row (each side is a
    // 1-row aggregate), instead of two separately-scheduled jobs per call
    val tomb = deletedDocsDF(spark, dir).agg(count(lit(1)).as("del"))
    val m = seg.agg(count(lit(1)), sum(col("bytes")), countDistinct(col("shard")))
      .crossJoin(tomb).head()
    Map(
      "doc_count" -> idx.fieldStats.values.map(_.docCount).max,
      "fields" -> idx.fields.map(_.indexField),
      "segment_rows" -> m.getLong(0),
      "disk_bytes" -> m.getLong(1),
      "shards" -> m.getLong(2),
      "deleted_count" -> m.getLong(3))
  }

  /** Canonical analyzer name persisted in the spec; must round-trip through
    * [[Analyzers.byName]] so [[specDigest]] distinguishes every representable
    * analyzer. An unrepresentable analyzer fails LOUDLY — the old "default
    * to standard" fallback made a Standard→NGram spec change digest-equal,
    * so reindexOnSpecChange silently kept serving the stale index (ADVICE r3).
    */
  def analyzerName(a: graft.analysis.Analyzer): String = a match {
    case Analyzers.Standard => "standard"
    case Analyzers.Classic => "classic"
    case Analyzers.Simple => "simple"
    case Analyzers.Whitespace => "whitespace"
    case Analyzers.Keyword => "keyword"
    case Analyzers.NGram(inner, min, max) => s"ngram:${analyzerName(inner)}:$min:$max"
    case other => throw new IllegalArgumentException(
      s"analyzer $other has no persistable name — add it to SegmentStore.analyzerName/Analyzers.byName")
  }

  /** Read a fieldstats dir tolerantly: generations written before `sumDl`
    * entered the schema (round 5) lack the column — reconstruct their Σdl
    * per ROW as round(docCount·avgdl), the exact inverse of how that
    * generation's avgdl was computed. Without this, open() crashes on a
    * pre-upgrade store, and worse, openMerged on a MIXED store (old + new
    * generations under mergeSchema) would sum nulls as zero and fold a
    * silently deflated avgdl into BM25.
    */
  private val FieldStatsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "field STRING, docCount BIGINT, avgdl DOUBLE, sumDl BIGINT")

  // schemas pinned from the writer-side encoders (round 6): every
  // `spark.read.parquet` without a schema runs a footer-inference job —
  // opens and maintenance ops paid one per table read
  private val SegmentRowSchema = org.apache.spark.sql.Encoders.product[SegmentRow].schema
  private val TermStatsSchema = org.apache.spark.sql.Encoders.product[TermStats].schema

  /** Segments read with the pinned schema (no inference job). */
  private[graft] def readSegments(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(SegmentRowSchema).parquet(path)

  /** Per-path schema memo for the store tables whose schema is CORPUS-shaped
    * (stored sidecar, upsert key map) and so cannot be pinned statically:
    * the first read of a path infers (one footer job), later reads pin it.
    * Sound because a store dir's stored/keys schema is fixed by its spec for
    * the dir's whole lifetime — generations append, optimize rewrites the
    * same columns (temp-dir paths are never recycled across different specs).
    */
  private val inferredSchemaCache =
    scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.types.StructType]()

  private def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(
      inferredSchemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)).parquet(path)

  private def readFieldStats(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    // explicit schema (round 6): the old mergeSchema read ran a distributed
    // footer-merge job per open; pinning the schema reads pre-sumDl
    // generation files as null sumDl, which the same coalesce reconstructs
    val raw = spark.read.schema(FieldStatsSchema).parquet(path)
    raw.select(col("field"), col("docCount"), col("avgdl"),
      coalesce(col("sumDl"), round(col("docCount") * col("avgdl")).cast("long")).as("sumDl"))
  }

  def open(spark: SparkSession, dir: String): SegmentIndex = openRaw(spark, dir)._1

  /** [[open]] plus the raw per-generation fieldstats rows — so
    * [[openMerged]] can fold them without a second read of the dir.
    */
  private def openRaw(spark: SparkSession, dir: String): (SegmentIndex, Seq[FieldStats]) = {
    import spark.implicits._
    // boost entered the spec in round 2 — a round-1 (4-column) dir still
    // opens, defaulting boost to 1.0 (ADVICE r2: no opaque encoder error)
    val fields = open0Fields(spark, dir)
    // sidecar first (driver read, no job); parquet fallback for old dirs
    val fsRows = readFieldStatsGens(dir) match {
      case Some(gens) => gens.toSeq.sortBy(_._1).flatMap(_._2)
      case None => readFieldStats(spark, s"$dir/fieldstats").as[FieldStats].collect().toSeq
    }
    val stored =
      if (Files.exists(Paths.get(s"$dir/stored"))) Some(readInferred(spark, s"$dir/stored"))
      else None
    val idx = new SegmentIndex(
      readSegments(spark, s"$dir/segments").as[SegmentRow],
      spark.read.schema(TermStatsSchema).parquet(s"$dir/termstats").as[TermStats],
      fsRows.map(fs => fs.field -> fs).toMap, fields, docsPerShardOf(dir), stored = stored)
    (idx, fsRows)
  }
}

final class SegmentIndex(
    val segments: Dataset[SegmentRow],
    val termStats: Dataset[TermStats],
    val fieldStats: Map[String, FieldStats],
    val fields: Seq[FieldDef],
    val docsPerShard: Long = 1L << 20,
    /** True when every partition of `segments` holds only whole shards
      * (see [[cached]]) — queries then skip the per-query shuffle.
      */
    val shardAligned: Boolean = false,
    /** Stored-fields / doc-values sidecar (docId + source columns): serves
      * typed point/range predicates, field-sort keys, and include_fields
      * on the segment path. None when the build didn't request it.
      */
    val stored: Option[DataFrame] = None) {

  /** Driver-side term-stats memo (see TextIndex.statsCache); LRU-bounded —
    * an open-ended query vocabulary must not grow the driver map forever.
    */
  @transient lazy val statsCache: LruCache[(String, String), Option[TermStats]] =
    new LruCache(65536)

  /** Serving mode: repartition ONCE by shard and pin in memory. Every
    * subsequent query runs as a single narrow stage (filter → per-partition
    * shard top-k → TakeOrdered) instead of paying a groupByKey shuffle per
    * query — the per-query exchange amortizes into index open, exactly
    * like Lucene opening per-segment readers up front.
    */
  /** Serving partition count defaults to the INDEX's shape (one partition
    * per ~4 shards, capped), not the querying session's shuffle conf: a
    * query job must cost the same task count regardless of how many cores
    * the session happens to have — per-query work scales with data, task
    * overhead does not (at 4×cpus partitions a 4-core tier paid 4× the
    * per-query scheduling of a 1-core tier for identical work).
    */
  def cached(servingPartitions: Int = 16): SegmentIndex = {
    val parts = servingPartitions
    // sortWithinPartitions by (field, term): the columnar cache's per-batch
    // min/max stats then give every query batch-level term pruning — a term
    // query decompresses only the few batches whose [min,max] term range
    // covers it, instead of scanning the whole cached index (the per-query
    // bandwidth that capped query core-scaling). Keep batches small enough
    // to prune (see Bench session conf inMemoryColumnarStorage.batchSize).
    val aligned = segments
      .repartition(parts, org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("field", "term", "minDoc")
    val idx = new SegmentIndex(aligned, termStats, fieldStats, fields, docsPerShard,
      shardAligned = true, stored = stored.map(_.persist()))
    idx.segments.persist()
    idx.termStats.persist()
    idx
  }
}
