package graft.data

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One turn of a multi-turn conversation / agent transcript — the engine's
  * primary input row (BASELINE.json input_hint): an Iceberg-style table with
  * columns (conv_id, turn_idx, role, text, tool, ts).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable
    ts: Timestamp)

/** Deterministic seeded transcript synthesis (FIXTURES.md §1).
  *
  * Every turn is a pure function of (seed, conv index, turn index) — fully
  * independent of Spark partitioning or parallelism, so the same corpus is
  * generated bit-identically at local[8] and local[32]. Generation is
  * distributed: `spark.range(numConvs).flatMap(genConv)` — no driver-side
  * materialization, so the generator itself scales to arbitrarily large
  * corpora (10^12 turns = a bigger range, same code).
  *
  * Skew by construction: `role` has 4 values and `tool` 5 — at index time
  * those become hot terms that exercise the salted aggregation path
  * (north rule). Text is a Zipfian bag-of-words over a ~5000-word vocabulary
  * with occasional fixed phrases ("paxos made simple", "hello world"),
  * mixed-case sentence starts, punctuation, and emails to exercise the
  * UAX#29 tokenizer.
  */
object TranscriptGen {

  val Roles: Vector[String] = Vector("user", "assistant", "system", "tool")
  val Tools: Vector[String] = Vector("bash", "read", "write", "grep", "search")

  val VocabSize = 5000
  private val Syllables = Vector(
    "ba", "con", "de", "fa", "gi", "ho", "ju", "ka", "lo", "mi",
    "na", "per", "qui", "ra", "sen", "ta", "ul", "vo", "wa", "xe")
  private val CommonWords = Vector(
    "the", "a", "of", "to", "and", "in", "is", "it", "that", "for",
    "consensus", "paxos", "made", "simple", "hello", "world", "error",
    "timeout", "retry", "leader", "quorum", "replica", "commit", "log",
    "index", "search", "query", "token", "spark", "shuffle", "merge")

  /** vocab(i): the first words are real (so queries read naturally), the rest
    * deterministic syllable compounds — pure function of the index.
    */
  def vocab(i: Int): String =
    if (i < CommonWords.length) CommonWords(i)
    else {
      val j = i - CommonWords.length
      val s = new StringBuilder
      var x = j
      var k = 0
      while (k < 3) { s.append(Syllables(x % Syllables.length)); x /= Syllables.length; k += 1 }
      s.toString
    }

  /** SplitMix64 — tiny, high-quality, allocation-free PRNG (public domain
    * algorithm, Steele et al. 2014). Streams are keyed by (seed, conv, turn)
    * so any turn can be generated independently.
    */
  final class Rng(seed0: Long) {
    private var state = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = (((nextLong() >>> 1) % bound).toInt)
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private def mix(a: Long, b: Long): Long = {
    var z = a ^ (b * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^ (z >>> 31)
  }

  /** Zipf-ish rank draw: log-uniform over [0, VocabSize) approximates a
    * s≈1 Zipf distribution — a handful of very hot words, long tail.
    */
  private def zipfRank(rng: Rng): Int = {
    val u = rng.nextDouble()
    math.min(VocabSize - 1, math.exp(u * math.log(VocabSize.toDouble)).toInt - 1).max(0)
  }

  private val FixedPhrases = Vector("paxos made simple", "hello world", "quorum lost retry")

  /** Generate one turn's text: 5–60 Zipfian words, sentence casing,
    * punctuation, occasional fixed phrase or email.
    */
  def genText(rng: Rng): String = {
    val nWords = 5 + rng.nextInt(56)
    val sb = new StringBuilder
    var i = 0
    var sentenceStart = true
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      val r = rng.nextInt(100)
      if (r < 3) { // fixed phrase
        sb.append(FixedPhrases(rng.nextInt(FixedPhrases.length)))
        i += 3
      } else if (r < 5) { // email token — exercises UAX#29 '@' split
        sb.append("user").append(rng.nextInt(50)).append("@example.com")
        i += 1
      } else {
        var w = vocab(zipfRank(rng))
        if (sentenceStart) w = w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + w.substring(1)
        sb.append(w)
        i += 1
      }
      sentenceStart = false
      if (rng.nextInt(8) == 0 && i < nWords) { sb.append('.'); sentenceStart = true }
      else if (rng.nextInt(11) == 0 && i < nWords) sb.append(',')
    }
    sb.append('.')
    sb.toString
  }

  val BaseEpochMillis: Long = 1767225600000L // 2026-01-01T00:00:00Z

  def genTurn(seed: Long, conv: Long, turn: Int): Turn = {
    val rng = new Rng(mix(mix(seed, conv), turn.toLong + 1))
    val role = Roles(if (turn == 0) 0 else rng.nextInt(Roles.length))
    val tool =
      if (role == "tool") Tools(rng.nextInt(Tools.length))
      else if (rng.nextInt(4) == 0) Tools(rng.nextInt(Tools.length))
      else null
    val ts = new Timestamp(BaseEpochMillis + conv * 60000L + turn * 7000L)
    Turn(f"conv-$conv%08d", turn, role, genText(rng), tool, ts)
  }

  def turnsPerConv(seed: Long, conv: Long): Int =
    1 + new Rng(mix(seed, conv)).nextInt(40)

  /** The corpus as a typed Dataset, generated in parallel. */
  def transcripts(spark: SparkSession, numConvs: Long, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, numConvs).flatMap { conv =>
      val n = turnsPerConv(seed, conv)
      (0 until n).iterator.map(t => genTurn(seed, conv, t))
    }
  }
}
