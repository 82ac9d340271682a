package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextAnalysis}

/** The round-6 native text kernels must be BIT-IDENTICAL to the
  * higher-order-function column formulations they replaced — same values,
  * same null semantics — on adversarial inputs (unicode case pairs, digits,
  * empty strings, null tokens, < w tokens). Each test evaluates the OLD
  * expression (re-stated here verbatim) and the new operator output on the
  * same frame and compares collected rows exactly.
  */
class TextKernelSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("text-kernel-spec")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- the OLD formulations, verbatim from round 5 ----------------------

  private def oldTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  private def oldShingles(toks: Column, w: Int): Column = {
    val cnt = size(toks) - (w - 1)
    val shifted = (0 until w).map(j => slice(toks, lit(j + 1), cnt))
    when(size(toks) >= w,
      shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y))))
      .otherwise(array().cast("array<string>"))
  }

  private def oldHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def oldHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def oldMinhashMins(sh: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      array_min(transform(sh, s => oldHash64(concat(s, lit(s"#$i"))))))

  private def oldSimhashFold(hs: Column, bits: Int): Column =
    (0 until bits).map { j =>
      val bsum = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bsum > 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)

  private val stops = Seq("the", "a", "of", "and", "ü")

  private def oldCountIn(toks: Column): Column =
    size(filter(toks, t => t.isin(stops: _*)))

  private def oldSumLen(toks: Column): Column =
    aggregate(toks, lit(0.0), (acc, t) => acc + length(t).cast("double"))

  // ---- fixtures ---------------------------------------------------------

  private val nastyTexts: Seq[String] = Seq(
    "", " ", "abc", "ABC def GHI", "a1b2c3", "  leading and trailing  ",
    "tabs\tand\nnewlines\r\nmixed", "ÅNGSTRÖM straße İstanbul ΣΊΣΥΦΟΣ",
    "ß sharp s and ﬁ ligature", "emoji 😀 mixed 🎉 text", "ＡＢＣ１２３ fullwidth",
    "punct!@#$%^&*()-=_+[]{};':\",./<>?", "0 00 000 numbers 42 007",
    "the a of and the the", "ü Ü über ÜBER", "x" * 300,
    ("word " * 50).trim, "one-token", "mixed123separators456here",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z")

  private def textDf = {
    val s = spark
    import s.implicits._
    nastyTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  /** Token arrays including null elements and short arrays. */
  private def tokArrDf = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Seq[String]("a", "b", "c", "d")),
      (1L, Seq[String]("one")),
      (2L, Seq[String]()),
      (3L, Seq[String]("x", null, "z", "w")),
      (4L, Seq[String](null, null, null)),
      (5L, Seq[String]("the", "a", "ü", "Ü", "b", "the")),
      (6L, Seq[String]("", "empty", "")),
      (7L, (1 to 40).map(_.toString))
    ).toDF("id", "toks")
  }

  private def assertSame(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(ra === rb)
  }

  test("alnumRuns ≡ filter(split(lower))") {
    assertSame(
      textDf.select(col("id"), oldTokens(col("text")).as("t")).orderBy("id"),
      textDf.select(col("id"), Dedup.tokens(col("text")).as("t")).orderBy("id"))
  }

  test("shingles kernel ≡ zip_with slice chain, including null tokens and < w") {
    for (w <- Seq(2, 3, 5)) {
      assertSame(
        tokArrDf.select(col("id"), oldShingles(col("toks"), w).as("sh")).orderBy("id"),
        tokArrDf.select(col("id"), Dedup.shinglesOf(col("toks"), w).as("sh")).orderBy("id"))
    }
  }

  test("hashArray ≡ transform(conv(substring(md5)))) at both widths") {
    val withSh = textDf.select(col("id"), oldShingles(oldTokens(col("text")), 3).as("sh"))
    assertSame(
      withSh.select(col("id"), transform(col("sh"), s => oldHash64(s)).as("h")).orderBy("id"),
      withSh.select(col("id"), graft.ops.Kernels.hashArray(col("sh"), 15).as("h")).orderBy("id"))
    assertSame(
      withSh.select(col("id"), transform(col("sh"), s => oldHash32(s)).as("h")).orderBy("id"),
      withSh.select(col("id"), graft.ops.Kernels.hashArray(col("sh"), 8).as("h")).orderBy("id"))
    // null elements stay null
    assertSame(
      tokArrDf.select(col("id"), transform(col("toks"), s => oldHash64(s)).as("h")).orderBy("id"),
      tokArrDf.select(col("id"), graft.ops.Kernels.hashArray(col("toks"), 15).as("h")).orderBy("id"))
  }

  test("minhash kernel ≡ per-band array_min(transform(hash64(concat)))") {
    val withSh = textDf.select(col("id"), oldShingles(oldTokens(col("text")), 3).as("sh"))
      .unionByName(tokArrDf.select(col("id") + 100L as "id", col("toks").as("sh")))
    val n = 8
    val olds = withSh.select(col("id") +:
      oldMinhashMins(col("sh"), n).zipWithIndex.map { case (c, i) => c.as(s"h$i") }: _*)
    val news0 = withSh.select(col("id"), graft.ops.Kernels.minhash(col("sh"), n).as("mh"))
    val news = news0.select(col("id") +:
      (0 until n).map(i => element_at(col("mh"), i + 1).as(s"h$i")): _*)
    assertSame(olds.orderBy("id"), news.orderBy("id"))
  }

  test("simhash fold kernel ≡ per-bit aggregate sign sums") {
    val hs = textDf.select(col("id"),
      transform(array_distinct(oldTokens(col("text"))), t => oldHash32(t)).as("hs"))
    assertSame(
      hs.select(col("id"), oldSimhashFold(col("hs"), 32).as("fp")).orderBy("id"),
      hs.select(col("id"), graft.ops.Kernels.simhashFold(col("hs"), 32).as("fp")).orderBy("id"))
    // a null hash element degenerates the old fold to 0 — kernel reproduces
    val withNull = tokArrDf.select(col("id"),
      transform(col("toks"), t => when(t.isNotNull, oldHash32(t))).as("hs"))
    assertSame(
      withNull.select(col("id"), oldSimhashFold(col("hs"), 32).as("fp")).orderBy("id"),
      withNull.select(col("id"), graft.ops.Kernels.simhashFold(col("hs"), 32).as("fp")).orderBy("id"))
  }

  test("countIn ≡ size(filter(isin)), sumLen ≡ aggregate length fold") {
    assertSame(
      tokArrDf.select(col("id"), oldCountIn(col("toks")).as("c")).orderBy("id"),
      tokArrDf.select(col("id"), graft.ops.Kernels.countIn(col("toks"), stops).as("c")).orderBy("id"))
    assertSame(
      tokArrDf.select(col("id"), oldSumLen(col("toks")).as("s")).orderBy("id"),
      tokArrDf.select(col("id"), graft.ops.Kernels.sumLen(col("toks")).as("s")).orderBy("id"))
    val toksOfText = textDf.select(col("id"), oldTokens(col("text")).as("toks"))
    assertSame(
      toksOfText.select(col("id"), oldCountIn(col("toks")).as("c"), oldSumLen(col("toks")).as("s")).orderBy("id"),
      toksOfText.select(col("id"), graft.ops.Kernels.countIn(col("toks"), stops).as("c"),
        graft.ops.Kernels.sumLen(col("toks")).as("s")).orderBy("id"))
  }

  test("end-to-end operators agree with round-5 formulations on the nasty corpus") {
    // minhashSignatures / simhash / langId / quality run the full operator
    // over text that exercises unicode lowering + empty/short docs
    val df = textDf
    val sigs = Dedup.minhashSignatures(df, "id", "text").orderBy("doc_id").collect()
    val oldSigs = {
      val sh = df.select(col("id").cast("long").as("doc_id"), oldTokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), oldShingles(col("toks"), 3).as("sh"))
      sh.select(col("doc_id") +:
        oldMinhashMins(col("sh"), 8).zipWithIndex.map { case (c, i) => c.as(s"h$i") }: _*)
        .orderBy("doc_id").collect()
    }
    assert(sigs === oldSigs)
    val fps = Dedup.simhash(df, "id", "text").orderBy("doc_id").collect()
    val oldFps = {
      val hs = df.select(col("id").cast("long").as("doc_id"),
        transform(array_distinct(oldTokens(col("text"))), t => oldHash32(t)).as("hs"))
        .filter(size(col("hs")) > 0)
      hs.select(col("doc_id"), oldSimhashFold(col("hs"), 32).as("simhash"))
        .orderBy("doc_id").collect()
    }
    assert(fps === oldFps)
  }
}
