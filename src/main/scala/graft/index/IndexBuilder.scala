package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The in-memory (DataFrame-level) form of an index over one corpus:
  * postings + stats + the stored-document table. This is the Catalyst-native
  * query surface; the compressed segment form (delta+VByte+skip, for the
  * 100 TB path) is built from `postings` by [[SegmentWriter]].
  */
final case class TextIndex(
    postings: Dataset[Posting],
    docs: DataFrame, // stored fields, includes docIdCol
    termStats: Dataset[TermStats],
    fieldStatsFn: () => Map[String, FieldStats],
    docIdCol: String,
    fields: Seq[FieldDef]) {

  /** Per-field corpus stats, computed on FIRST use (round 6): a doc-value
    * query (typed point/range over the stored table) touches neither
    * postings nor stats — eager stats forced a full tokenize+collect of the
    * corpus at build for queries that never score a term.
    */
  @transient lazy val fieldStats: Map[String, FieldStats] = fieldStatsFn()

  /** Driver-side memo of term statistics: each distinct query term costs one
    * filtered scan of the (cached) stats table once, then is served from the
    * map — the analog of Lucene's per-reader TermStates cache. LRU-bounded
    * so an open-ended query vocabulary can't grow driver memory forever.
    */
  @transient lazy val statsCache: LruCache[(String, String), Option[TermStats]] =
    new LruCache(65536)

  def analyzerFor(field: String): graft.analysis.Analyzer =
    fields.collectFirst { case FieldDef(`field`, _, TextField(a), _) => a }
      .getOrElse(graft.analysis.Analyzers.Keyword)

  def isTextField(field: String): Boolean =
    fields.exists(f => f.indexField == field && f.kind.isInstanceOf[TextField])

  /** Pin the hot tables in memory for repeated queries (search service mode).
    *
    * Postings are sorted by (field, term) within partitions BEFORE the
    * persist (round 6) — the same discipline [[SegmentIndex.cached]] already
    * applies: the columnar cache keeps per-batch min/max stats, so a term
    * query decompresses only the few batches whose [min, max] term range
    * covers it instead of scanning the whole cached index on EVERY query
    * (the dominant per-query cost of the DataFrame path — each search was a
    * full 500k-row cache scan per referenced term). One-time sort at cache
    * fill, amortized over every query served.
    */
  def cached(): TextIndex = {
    copy(postings = postings.sortWithinPartitions("field", "term").persist(),
      docs = docs.persist(), termStats = termStats.persist())
  }
}

/** Builds the inverted index from a document table — the Spark-first
  * re-expression of the reference's indexing dataflow (SURVEY.md §2.2/§2.5;
  * reference loop: DatabaseIndexer.java:293-384 feeding Lucene's
  * IndexWriter).
  *
  * Plan shape (scale notes):
  *  - tf/positions/dl are computed *inside the tokenize flatMap* — each
  *    (field, term, docId) posting comes from exactly one source row, so
  *    posting construction needs NO shuffle at all; the only wide exchanges
  *    in the whole build are the small stats aggregations and the
  *    range-partitioned term shuffle when writing compressed segments.
  *  - term stats use an explicit salted two-phase aggregation: hot terms
  *    (role:/tool: values, stop-adjacent words) are first combined per
  *    (term, salt) so no single reducer receives a hot term's full posting
  *    stream (north rule: skew handled explicitly).
  */
object IndexBuilder {

  val K1 = 1.2
  val B = 0.75

  /** BM25 idf, Lucene 6.4.1 default similarity (SURVEY.md §2.7):
    * ln(1 + (N - df + 0.5) / (df + 0.5)).
    */
  def idf(df: Long, n: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** BM25 term score for one posting — the expression shape (association
    * order) is kept identical across the DataFrame path (Searcher.bm25Col),
    * the segment scorer, and the test oracle so all paths produce
    * bit-identical doubles.
    */
  def bm25(tf: Double, idf: Double, dl: Double, avgdl: Double): Double =
    idf * tf * (K1 + 1.0) / (tf + K1 * ((1.0 - B) + (B / avgdl) * dl))

  /** Synthetic per-(doc, field) marker row carrying the field length — lets
    * field stats fall out of the same tokenize pass with a #fields-row
    * shuffle instead of a doc-level one. The empty term is unreachable by
    * any analyzer, so markers can never collide with a real posting.
    */
  val DlMarker = ""

  /** One corpus scan emitting real postings AND dl marker rows.
    *
    * Multi-valued sources (ArrayType columns): the reference folds repeated
    * `add()`s of one field into a single multi-valued Lucene field whose
    * positions continue across values (DatabaseIndexer.java:571-584,
    * rhino/RhinoDocument.java:64-117; Lucene's default position-increment
    * gap is 0). TEXT fields therefore analyze the values as one
    * space-joined stream (done in the `select` — the hot tokenize loop is
    * untouched); STRING fields index each element as an exact term with
    * tf = equal-element count and dl = element count.
    */
  def tokenizePostingsWithMarkers(docs: DataFrame, docIdCol: String, fields: Seq[FieldDef]): Dataset[Posting] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val schema = docs.schema
    def isArraySource(f: FieldDef): Boolean =
      schema.fields.find(_.name == f.source).exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val arrayString: Set[Int] = fields.zipWithIndex.collect {
      case (f, i) if f.kind == StringField && isArraySource(f) => i
    }.toSet
    val cols = col(docIdCol).cast(LongType) +: fields.zipWithIndex.map { case (f, i) =>
      if (isArraySource(f)) {
        val arr = col(f.source).cast(org.apache.spark.sql.types.ArrayType(StringType))
        // empty-string elements are dropped like nulls: term "" would collide
        // with the DlMarker sentinel, double-counting the doc in field stats
        // and vanishing from termstats (ADVICE r3) — empty means absent
        if (arrayString(i)) filter(arr, x => x.isNotNull && x =!= lit(""))
        else array_join(arr, " ") // null elements skipped, like null scalars
      } else col(f.source).cast(StringType)
    }
    val emptyPos = Array.empty[Int]
    docs.select(cols: _*).mapPartitions { rows =>
      // one reusable (term, pos) buffer per partition: no Token objects, no
      // ArrayBuffer growth, no TimSort scratch in the build's hottest loop
      // (per-doc allocation was the 4-core scaling limiter — see
      // analysis.TokenBuffer)
      val buf = new graft.analysis.TokenBuffer(256)
      rows.flatMap { row =>
        val docId = row.getLong(0)
        fields.iterator.zipWithIndex.flatMap { case (f, i) =>
          if (row.isNullAt(i + 1)) Iterator.empty
          else if (arrayString(i)) {
            val elems = row.getSeq[String](i + 1)
            val m = elems.length
            if (m == 0) Iterator.empty
            else {
              val byTerm = elems.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1)
              byTerm.iterator.map { case (term, occ) =>
                Posting(f.indexField, term, docId, occ.length, occ.map(_._2).toArray, m)
              } ++ Iterator(Posting(f.indexField, DlMarker, docId, m, emptyPos, m))
            }
          }
          else f.kind match {
            case TextField(analyzer) =>
              buf.clear()
              analyzer.tokensInto(row.getString(i + 1), buf)
              val dl = buf.len
              if (dl == 0) Iterator.empty
              else {
                // sort-based run grouping (no per-doc HashMap churn)
                buf.sort()
                val terms = buf.terms
                val poss = buf.poss
                val out = new ArrayBuffer[Posting](16)
                var s = 0
                while (s < dl) {
                  var e = s + 1
                  while (e < dl && terms(e) == terms(s)) e += 1
                  val positions = java.util.Arrays.copyOfRange(poss, s, e)
                  out += Posting(f.indexField, terms(s), docId, e - s, positions, dl)
                  s = e
                }
                out += Posting(f.indexField, DlMarker, docId, dl, emptyPos, dl)
                out.iterator
              }
            case StringField =>
              val v = row.getString(i + 1)
              // empty string ≡ absent (it IS the DlMarker sentinel — see the
              // array branch note); a doc with an empty STRING value simply
              // has no term in this field
              if (v.isEmpty) Iterator.empty
              else Iterator(
                Posting(f.indexField, v, docId, 1, Array(0), 1),
                Posting(f.indexField, DlMarker, docId, 1, emptyPos, 1))
          }
        }
      }
    }
  }

  def tokenizePostings(docs: DataFrame, docIdCol: String, fields: Seq[FieldDef]): Dataset[Posting] = {
    import docs.sparkSession.implicits._
    tokenizePostingsWithMarkers(docs, docIdCol, fields).filter(_.term != DlMarker)
  }

  /** FUSED tokenize → map-side posting combine (round 6): one loop per
    * partition that tokenizes each document and appends its term runs
    * straight into per-term [[SegmentStore.RunBuf]]s, emitting
    * [[SegmentStore.MiniRun]] rows per shard — the input to
    * [[SegmentStore.encodeRuns]].
    *
    * Semantically identical to `tokenizePostings |> encodeSegments`'s
    * internal combine (same runs, same docId order — property-pinned by
    * SegmentSpec's fused-≡-streamed case), but the per-posting `Posting`
    * object, the `(shard, field, term)` tuple key allocated per map lookup,
    * and the per-document output buffer are all gone: at bench scale that
    * was ~36M short-lived objects per build riding the allocation/memory
    * bandwidth the wide (4-core) scaling child is bounded by. Emits NO
    * dl-marker rows — callers use `reconstructMarkers` (both current
    * callers are the `docsPerShard <= Int.MaxValue` paths).
    *
    * Flush granularity: a mini-run window closes at a shard boundary (docs
    * arrive docId-ascending from [[DocIds.assign]], so shards are monotonic
    * per partition) or at [[SegmentStore.FlushPostings]] buffered runs —
    * the Lucene flush-by-RAM bound. Unordered input stays CORRECT (the
    * encode merge handles any mini-run split; RunBuf index-sorts the rare
    * unsorted run) but flushes more often.
    */
  def tokenizeMiniRuns(
      docs: DataFrame,
      docIdCol: String,
      fields: Seq[FieldDef],
      docsPerShard: Long): Dataset[SegmentStore.MiniRun] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val schema = docs.schema
    def isArraySource(f: FieldDef): Boolean =
      schema.fields.find(_.name == f.source).exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val arrayString: Set[Int] = fields.zipWithIndex.collect {
      case (f, i) if f.kind == StringField && isArraySource(f) => i
    }.toSet
    val cols = col(docIdCol).cast(LongType) +: fields.zipWithIndex.map { case (f, i) =>
      if (isArraySource(f)) {
        val arr = col(f.source).cast(org.apache.spark.sql.types.ArrayType(StringType))
        if (arrayString(i)) filter(arr, x => x.isNotNull && x =!= lit(""))
        else array_join(arr, " ")
      } else col(f.source).cast(StringType)
    }
    val nFields = fields.length
    val fieldNames = fields.map(_.indexField).toArray
    val analyzers: Array[graft.analysis.Analyzer] = fields.map {
      case FieldDef(_, _, TextField(a), _) => a
      case _ => null
    }.toArray
    docs.select(cols: _*).mapPartitions { rows =>
      val src = rows.buffered
      new Iterator[SegmentStore.MiniRun] {
        private val buf = new graft.analysis.TokenBuffer(256)
        private val bufs: Array[java.util.HashMap[String, SegmentStore.RunBuf]] =
          Array.fill(nFields)(new java.util.HashMap[String, SegmentStore.RunBuf]())
        private var curShard = -1
        private var nBuffered = 0
        private var out: Iterator[SegmentStore.MiniRun] = Iterator.empty

        private def bufOf(i: Int, term: String): SegmentStore.RunBuf = {
          val m = bufs(i)
          var b = m.get(term)
          if (b == null) { b = new SegmentStore.RunBuf(); m.put(term, b) }
          b
        }

        private def addDoc(row: org.apache.spark.sql.Row): Unit = {
          val docId = row.getLong(0)
          var i = 0
          while (i < nFields) {
            if (!row.isNullAt(i + 1)) {
              if (arrayString(i)) {
                val elems = row.getSeq[String](i + 1)
                val m = elems.length
                if (m > 0) {
                  val byTerm = elems.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1)
                  byTerm.foreach { case (term, occ) =>
                    bufOf(i, term).add(docId, occ.length, m, occ.map(_._2).toArray)
                    nBuffered += 1
                  }
                }
              } else analyzers(i) match {
                case null => // StringField scalar
                  val v = row.getString(i + 1)
                  if (!v.isEmpty) {
                    bufOf(i, v).add(docId, 1, 1, Array(0))
                    nBuffered += 1
                  }
                case analyzer =>
                  buf.clear()
                  analyzer.tokensInto(row.getString(i + 1), buf)
                  val dl = buf.len
                  if (dl > 0) {
                    buf.sort()
                    val terms = buf.terms
                    val poss = buf.poss
                    var s = 0
                    while (s < dl) {
                      var e = s + 1
                      while (e < dl && terms(e) == terms(s)) e += 1
                      bufOf(i, terms(s)).add(docId, e - s, dl,
                        java.util.Arrays.copyOfRange(poss, s, e))
                      nBuffered += 1
                      s = e
                    }
                  }
              }
            }
            i += 1
          }
        }

        private def drain(): Iterator[SegmentStore.MiniRun] = {
          val acc = new ArrayBuffer[SegmentStore.MiniRun](bufs.iterator.map(_.size).sum)
          var i = 0
          while (i < nFields) {
            val it = bufs(i).entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val (d, t, l, ps) = e.getValue.result()
              acc += ((curShard, fieldNames(i), e.getKey, d(0), d, t, l, ps))
            }
            bufs(i).clear()
            i += 1
          }
          nBuffered = 0
          acc.iterator
        }

        private def refill(): Unit = {
          curShard = (src.head.getLong(0) / docsPerShard).toInt
          while (src.hasNext && nBuffered < SegmentStore.FlushPostings &&
            (src.head.getLong(0) / docsPerShard).toInt == curShard) {
            addDoc(src.next())
          }
          out = drain()
        }

        def hasNext: Boolean = {
          while (!out.hasNext && src.hasNext) refill()
          out.hasNext
        }
        def next(): SegmentStore.MiniRun = out.next()
      }
    }
  }

  /** Field stats from the dl marker rows: partial agg collapses each
    * partition to #fields rows before the (trivial) shuffle.
    */
  def fieldStatsFromMarkers(withMarkers: Dataset[Posting]): DataFrame = {
    val spark = withMarkers.sparkSession
    import spark.implicits._
    withMarkers.filter(_.term == DlMarker).toDF()
      .groupBy($"field")
      .agg(count(lit(1)).as("docCount"), avg($"dl").as("avgdl"),
        sum($"dl").cast("long").as("sumDl"))
  }

  /** Salted two-phase term statistics: partial (term, salt) combine, then
    * final merge — no reducer ever sees a hot term's full stream.
    */
  def termStats(postings: Dataset[Posting], saltBuckets: Int = 16): Dataset[TermStats] = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings
      .groupBy($"field", $"term", pmod(hash($"docId"), lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("pdf"), sum($"tf").as("pcf"))
      .groupBy($"field", $"term")
      .agg(sum($"pdf").as("df"), sum($"pcf").as("cf"))
      .as[TermStats]
  }

  /** Build the full index over `docs`. `docs` must already carry a stable
    * Long doc id (use [[DocIds.assign]] when the source has none).
    *
    * One corpus scan: postings are tokenized once and persisted; term stats
    * and field stats both aggregate the cached postings.
    */
  def build(docs: DataFrame, docIdCol: String, fields: Seq[FieldDef]): TextIndex = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withMarkers = tokenizePostingsWithMarkers(docs, docIdCol, fields).persist()
    val postings = withMarkers.filter(_.term != DlMarker)
    TextIndex(postings, docs, termStats(postings),
      () => fieldStatsFromMarkers(withMarkers).as[FieldStats]
        .collect().map(f => f.field -> f).toMap,
      docIdCol, fields)
  }
}
