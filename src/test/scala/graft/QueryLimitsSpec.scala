package graft

import graft.analysis.Analyzers
import graft.index._
import graft.query._

/** maxClauseCount behavior on both executors: a multi-term expansion past
  * 1024 terms throws TooManyClauses instead of collecting an unbounded term
  * list to the driver (Lucene BooleanQuery.maxClauseCount semantics).
  */
class QueryLimitsSpec extends SparkSpec {

  private lazy val fields = Seq(FieldDef("default", "text", TextField(Analyzers.Whitespace)))

  // 1100 distinct terms sharing the prefix "zq" — over the 1024 cap; plus a
  // narrow family "yq0".."yq9" under the cap
  private lazy val index: TextIndex = {
    import spark.implicits._
    val wide = (0 until 1100).map(i => f"zq$i%04d").mkString(" ")
    val narrow = (0 until 10).map(i => s"yq$i").mkString(" ")
    val docs = Seq((0L, s"$wide $narrow"), (1L, "yq1 other words")).toDF("doc_id", "text")
    IndexBuilder.build(docs, "doc_id", fields)
  }

  test("DataFrame path: >1024-term prefix expansion throws TooManyClauses") {
    val s = new Searcher(index, SearchOptions(limit = 10))
    intercept[QueryLimits.TooManyClauses](s.search("zq*").collect())
    // under-cap expansion still works
    assert(s.search("yq*").collect().map(_.getAs[Long]("docId")).toSet == Set(0L, 1L))
  }

  test("segment path: >1024-term prefix expansion throws TooManyClauses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-limits").toString
    import spark.implicits._
    val wide = (0 until 1100).map(i => f"zq$i%04d").mkString(" ")
    val docs = Seq((0L, s"$wide yq1"), (1L, "yq1 other")).toDF("doc_id", "text")
    SegmentStore.build(docs, "doc_id", fields, dir, docsPerShard = 16)
    val ss = new SegmentSearcher(SegmentStore.open(spark, dir), SearchOptions(limit = 10))
    intercept[QueryLimits.TooManyClauses](ss.topK("zq*"))
    assert(ss.topK("yq*").map(_._1).toSet == Set(0L, 1L))
  }
}
