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

/** The on-disk index: compressed posting segments + stats + spec, built in
  * resumable stages — the Spark-scale analog of the reference's Lucene index
  * directory with `last_seq` commit user data as its checkpoint
  * (/root/reference/src/main/java/com/github/rnewson/couchdb/lucene/DatabaseIndexer.java:199-211,715-729).
  *
  * Layout under `dir/`:
  *   spec/        index field spec (source col, kind, analyzer)
  *   termstats/   (field, term, df, cf)
  *   fieldstats/  (field, docCount, avgdl)
  *   segments/    SegmentRow parquet, range-partitioned by (shard, field, term, docId)
  *   lineage/     LineageRow parquet per stage
  *   checkpoints/ <stage>.json markers — a rerun skips completed stages
  *
  * Production note: each stage's write maps 1:1 onto an Iceberg table commit
  * (snapshot id = the checkpoint); this sandbox has no Iceberg jars, so the
  * commit protocol is parquet dir + `_SUCCESS` + checkpoint marker.
  */
object SegmentStore {

  val Stages = Seq("spec", "stats", "segments")

  private def ckptPath(dir: String, stage: String) = Paths.get(s"$dir/checkpoints/$stage.json")

  def stageDone(dir: String, stage: String): Boolean = Files.exists(ckptPath(dir, stage))

  private def commitStage(dir: String, stage: String, metrics: Map[String, Long]): Unit = {
    Files.createDirectories(Paths.get(s"$dir/checkpoints"))
    val body = metrics.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    Files.writeString(ckptPath(dir, stage),
      s"""{"stage": "$stage", "completedAtMs": ${System.currentTimeMillis()}, "metrics": $body}""")
  }

  /** Staged, resumable build. `failAfterStage` is a test failpoint: throw
    * after committing that stage (kill-between-stages test, SURVEY.md §5.2).
    */
  def build(
      docs: DataFrame,
      docIdCol: String,
      fields: Seq[FieldDef],
      dir: String,
      docsPerShard: Long = 1L << 20,
      failAfterStage: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._

    def failpoint(stage: String): Unit =
      if (failAfterStage.contains(stage)) throw new RuntimeException(s"failpoint after $stage")

    if (!stageDone(dir, "spec")) {
      fields.map(f => (f.indexField, f.source, f.kind match {
        case TextField(_) => "text"
        case StringField => "string"
      }, f.kind match {
        case TextField(a) => analyzerName(a)
        case StringField => ""
      })).toDF("indexField", "source", "kind", "analyzer")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/spec")
      commitStage(dir, "spec", Map("fields" -> fields.size.toLong))
    }
    failpoint("spec")

    if (!stageDone(dir, "stats")) {
      val postings = IndexBuilder.tokenizePostings(docs, docIdCol, fields)
      val ts = IndexBuilder.termStats(postings)
      ts.write.mode(SaveMode.Overwrite).parquet(s"$dir/termstats")
      val lengths = IndexBuilder.docLengths(docs, docIdCol, fields)
      lengths.groupBy($"field")
        .agg(count(lit(1)).as("docCount"), avg($"dl").as("avgdl"))
        .as[FieldStats]
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/fieldstats")
      val nTerms = spark.read.parquet(s"$dir/termstats").count()
      commitStage(dir, "stats", Map("terms" -> nTerms))
    }
    failpoint("stats")

    if (!stageDone(dir, "segments")) {
      val avgdls = spark.read.parquet(s"$dir/fieldstats").as[FieldStats]
        .collect().map(fs => fs.field -> fs.avgdl).toMap
      val bcAvgdl = spark.sparkContext.broadcast(avgdls)
      val postings = IndexBuilder.tokenizePostings(docs, docIdCol, fields)
      val parts = spark.sessionState.conf.numShufflePartitions
      // explicit range-partitioned shuffle of the term space within doc
      // shards; sort brings each (shard, field, term) run contiguous and
      // docId-ordered for the encoder (SURVEY.md §2.5)
      val sortedRuns = postings
        .withColumn("shard", (col("docId") / lit(docsPerShard)).cast("int"))
        .repartitionByRange(parts, col("shard"), col("field"), col("term"), col("docId"))
        .sortWithinPartitions(col("shard"), col("field"), col("term"), col("docId"))
        .as[(String, String, Long, Int, Array[Int], Int, Int)] // field,term,docId,tf,positions,dl,shard

      val encodeFn = (it: Iterator[(String, String, Long, Int, Array[Int], Int, Int)]) => {
        val pid = TaskContext.getPartitionId()
        val avg = bcAvgdl.value
        val src = it.buffered
        new Iterator[SegmentRow] {
          def hasNext: Boolean = src.hasNext
          def next(): SegmentRow = {
            val (field, term, _, _, _, _, shard) = src.head
            var df = 0L
            var cf = 0L
            var minDoc = Long.MaxValue
            var maxDoc = Long.MinValue
            val run = Vector.newBuilder[Codec.Decoded]
            while (src.hasNext && src.head._1 == field &&
              src.head._2 == term && src.head._7 == shard) {
              val (_, _, docId, tf, positions, dl, _) = src.next()
              df += 1; cf += tf
              if (docId < minDoc) minDoc = docId
              if (docId > maxDoc) maxDoc = docId
              run += Codec.Decoded(docId, tf, dl, positions)
            }
            val blocks = Codec.encode(run.result().iterator, avg(field))
            val bytes = blocks.map(b =>
              b.docBytes.length + b.tfBytes.length + b.dlBytes.length + b.posBytes.length).sum.toLong
            SegmentRow(shard, field, term, df, cf, minDoc, maxDoc, bytes, pid, blocks)
          }
        }
      }
      val segments = sortedRuns.mapPartitions(encodeFn)
      segments.write.mode(SaveMode.Overwrite).parquet(s"$dir/segments")
      // lineage from the committed segment rows (cheap agg over metadata)
      val seg = spark.read.parquet(s"$dir/segments")
      seg.groupBy(col("pid"))
        .agg(sum(col("df")).as("rowsIn"), count(lit(1)).as("rowsOut"), sum(col("bytes")).as("bytesOut"))
        .select(lit("segments").as("stage"), col("pid"), col("rowsIn"), col("rowsOut"), col("bytesOut"))
        .as[LineageRow]
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineage")
      val m = seg.agg(count(lit(1)), sum(col("bytes"))).head()
      commitStage(dir, "segments",
        Map("segmentRows" -> m.getLong(0), "postingBytes" -> m.getLong(1)))
    }
    failpoint("segments")
  }

  def analyzerName(a: graft.analysis.Analyzer): String = a match {
    case Analyzers.Standard => "standard"
    case Analyzers.Simple => "simple"
    case Analyzers.Whitespace => "whitespace"
    case Analyzers.Keyword => "keyword"
    case _ => "standard"
  }

  def open(spark: SparkSession, dir: String): SegmentIndex = {
    import spark.implicits._
    val spec = spark.read.parquet(s"$dir/spec")
      .as[(String, String, String, String)].collect()
    val fields = spec.map { case (idxF, src, kind, an) =>
      FieldDef(idxF, src, kind match {
        case "text" => TextField(Analyzers.byName(an))
        case "string" => StringField
      })
    }.toSeq
    val fieldStats = spark.read.parquet(s"$dir/fieldstats").as[FieldStats]
      .collect().map(fs => fs.field -> fs).toMap
    new SegmentIndex(
      spark.read.parquet(s"$dir/segments").as[SegmentRow],
      spark.read.parquet(s"$dir/termstats").as[TermStats],
      fieldStats, fields)
  }
}

final class SegmentIndex(
    val segments: Dataset[SegmentRow],
    val termStats: Dataset[TermStats],
    val fieldStats: Map[String, FieldStats],
    val fields: Seq[FieldDef]) {
  def cached(): SegmentIndex = {
    segments.persist(); termStats.persist(); this
  }
}
