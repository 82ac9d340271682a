package graft

import org.apache.spark.sql.functions._

import graft.ops.{Chunking, TextAnalysis}

/** Behavior + plan-shape specs for the sequence-shaping (chunk/pack) and
  * boilerplate-analysis operators.
  */
class ChunkingSpec extends SparkSpec {

  // ---- chunk ---------------------------------------------------------------

  test("chunk windows cover every token with the stride overlap") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val out = Chunking.chunk(docsFixture((1L, text)), "doc_id", "text", chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).sortBy(_._1)
    // starts 0,3,6,9 → windows [1..4],[4..7],[7..10],[10]
    assert(out.toSeq == Seq(
      (0L, "w1 w2 w3 w4", 4L),
      (1L, "w4 w5 w6 w7", 4L),
      (2L, "w7 w8 w9 w10", 4L),
      (3L, "w10", 1L)))
  }

  test("chunk of a doc shorter than one window is the doc itself") {
    val out = Chunking.chunk(docsFixture((1L, "a b")), "doc_id", "text", chunkSize = 8, stride = 8)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, "a b", 2L)))
  }

  test("chunk is a narrow map: no exchange") {
    val plan = Chunking.chunk(docsFixture((1L, "a b c")), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  // ---- pack ----------------------------------------------------------------

  test("pack fills each bucket's packs to the budget in doc_id order") {
    // one bucket so the cumulative order is fully known
    val d = docsFixture((0L until 20L).map(i => (i, "tok " * 10)): _*) // 10 tokens each
    val out = Chunking.pack(d, "doc_id", "text", budget = 25L, numBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    // cum before doc i = 10*i → pack = floor(10*i/25): docs 0-2 pack0, 3-4 pack1, ...
    out.foreach { case (id, p) => assert(p == (10 * id) / 25, s"doc $id in pack $p") }
  }

  test("pack never splits a doc and packs exceed the budget by at most one doc") {
    val d = docsFixture((0L until 200L).map(i => (i, "x " * (1 + (i % 13).toInt))): _*)
    val rows = Chunking.pack(d, "doc_id", "text", budget = 30L, numBuckets = 4)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(2)))
    assert(rows.length == 200)
    val maxDoc = rows.map(_._3).max
    rows.groupBy(t => (t._1, t._2)).foreach { case ((b, p), g) =>
      val tot = g.map(_._3).sum
      assert(tot <= 30L + maxDoc, s"bucket $b pack $p holds $tot tokens")
    }
  }

  test("pack assignment is identical under different input partitioning") {
    val rows = (0L until 300L).map(i => (i, "t " * (1 + (i % 7).toInt)))
    def run(parts: Int) =
      Chunking.pack(docsFixture(rows: _*).repartition(parts), "doc_id", "text", budget = 40L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    assert(run(3) == run(17))
  }

  test("chunkPack bounds every pack by budget + chunkSize - 1 (oversize docs split first)") {
    // docs of up to 90 tokens against a 20-token budget: plain pack would
    // overflow a pack by a whole 90-token doc; chunkPack cannot
    val d = docsFixture((0L until 60L).map(i => (i, "w " * (5 + (i % 6) * 17).toInt)): _*)
    val rows = Chunking.chunkPack(d, "doc_id", "text", chunkSize = 10, stride = 10, budget = 20L)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(2)))
    rows.groupBy(t => (t._1, t._2)).foreach { case ((b, p), g) =>
      val tot = g.map(_._3).sum
      assert(tot <= 20L + 9L, s"bucket $b pack $p holds $tot tokens")
    }
    // every chunk is present exactly once
    assert(rows.map(_._3).sum == (0L until 60L).map(i => 5 + (i % 6) * 17).sum)
  }

  test("explicit numBuckets output is invariant under the session's shuffle setting; default derives from it") {
    val rows = (0L until 80L).map(i => (i, ("tok " * (1 + (i % 5).toInt)).trim))
    def packed() = Chunking.pack(docsFixture(rows: _*), "doc_id", "text",
      budget = 25L, numBuckets = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = packed()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(packed() == a, "explicit-bucket pack output moved with the session setting")
      // derived default scales with the session but never below 32
      val db = Chunking.pack(docsFixture(rows: _*), "doc_id", "text", budget = 25L)
        .select(max(col("bucket"))).collect()(0).getLong(0)
      assert(db < 32L, s"7-partition session must derive the 32-bucket floor, saw bucket $db")
      spark.conf.set("spark.sql.shuffle.partitions", "130")
      val db2 = Chunking.pack(docsFixture(rows: _*), "doc_id", "text", budget = 25L)
        .select(max(col("bucket"))).collect()(0).getLong(0)
      assert(db2 >= 32L, s"130-partition session should spread past 32 buckets, saw max bucket $db2")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("pack shuffles once, on the bucket key") {
    val d = docsFixture((0L until 10L).map(i => (i, "x y z")): _*)
    val plan = Chunking.pack(d, "doc_id", "text").queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(plan.contains("hashpartitioning(bucket"), plan.take(3000))
  }

  // ---- boilerplate -----------------------------------------------------------

  private val template = "this product is great buy now"
  private def corpusWithBoilerplate = docsFixture(
    (1L, s"review one $template"),
    (2L, s"review two $template"),
    (3L, s"review three $template"),
    (4L, "something else entirely different here"))

  test("boilerplate surfaces the shingles shared across the most documents") {
    val top = TextAnalysis.boilerplate(corpusWithBoilerplate, "doc_id", "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.forall(_._2 == 3L), top.mkString(", "))
    assert(top.map(_._1).toSet.subsetOf(Set(
      "this product is", "product is great", "is great buy", "great buy now")))
  }

  test("repetition scores looping documents; non-repeating docs score 0") {
    val out = TextAnalysis.repetition(docsFixture(
        (1L, "a b c a b c a b c"), // 7 shingles, 3 distinct -> 4/7
        (2L, "one two three four"), // 2 shingles, both distinct -> 0
        (3L, "a b")), // < w tokens -> absent
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(1L) - 0.571429) < 1e-9, out.toString)
    assert(out(2L) == 0.0)
  }

  test("repetition is a narrow map: no exchange") {
    val plan = TextAnalysis.repetition(docsFixture((1L, "a b c d")), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("tokenFrequency averages corpus df over token instances, broadcast vocab") {
    // df: a->2 docs, b->2, c->1, d->1
    val df = TextAnalysis.tokenFrequency(docsFixture((1L, "a b a"), (2L, "a b c d")), "doc_id", "text")
    val out = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 2.0)               // (2+2+2)/3
    assert(out(2L) == 1.5)               // (2+2+1+1)/4
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("boilerplateRatio flags template-dominated docs; broadcast join shape") {
    val df = TextAnalysis.boilerplateRatio(corpusWithBoilerplate, "doc_id", "text", k = 4)
    val out = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs 1-3: 6 distinct shingles each ("review one this", "one this product"
    // + the 4 template shingles) → 4/6; doc 4 has no top-k shingle → absent
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out.values.forall(v => math.abs(v - 0.666667) < 1e-9), out.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }
}
