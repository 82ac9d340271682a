package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzers
import graft.index._
import graft.query._

/** Glue between the driver contract (SparkEntry) and the engine: builds and
  * caches one documents-table index per scale-factor dir, and shapes search
  * results into oracle-comparable frames (doc_id, score_r, rank).
  *
  * The `documents` corpus is pure lowercase letters + spaces (verified by
  * EngineSpec), so the Standard analyzer's token stream is exactly the
  * DuckDB oracle's `regexp_extract_all(lower(text), '[a-z0-9]+')` — which is
  * what makes full BM25 rank-identity checkable end-to-end in SQL.
  */
object Engine {

  /** documents.parquet index spec: text → `default` (TEXT, analyzed,
    * positions), lang/source → STRING (exact terms, the role:/tool: analog),
    * n_chars/doc_id → doc-values.
    */
  val DocFields: Seq[FieldDef] = Seq(
    FieldDef("default", "text", TextField(Analyzers.Standard)),
    FieldDef("lang", "lang", StringField),
    FieldDef("source", "source", StringField))

  private val cache = scala.collection.concurrent.TrieMap[String, TextIndex]()

  def documentsIndex(spark: SparkSession, sfDir: String): TextIndex =
    cache.getOrElseUpdate(sfDir, {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      IndexBuilder.build(docs, "doc_id", DocFields).cached()
    })

  /** Top-k search shaped for the DuckDB compare: doc_id, score rounded to 4
    * decimals (both engines compute the identical double expression; the
    * rounding absorbs ulp-level summation-order differences), rank 1-based.
    */
  def topk(spark: SparkSession, sfDir: String, q: String,
      k: Int = 10, skip: Int = 0, defaultAnd: Boolean = false): DataFrame = {
    val s = new Searcher(documentsIndex(spark, sfDir),
      SearchOptions(limit = k, skip = skip, defaultOperatorAnd = defaultAnd))
    s.search(q).select(
      col("docId").as("doc_id"),
      round(col("score"), 4).as("score_r"),
      col("rank").cast("long").as("rank"))
  }
}
