package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzers, Token}

/** Golden-token tests in the style of the reference's
  * util/AnalyzersTest.java:139-152.
  */
class AnalyzerSpec extends AnyFunSuite {
  private def terms(a: graft.analysis.Analyzer, s: String): Seq[String] = a.tokens(s).map(_.term)

  test("standard: lowercase + stop removal + positions with gaps") {
    val toks = Analyzers.Standard.tokens("The Quick brown FOX")
    // "the" is a stop word: removed but its position is consumed
    assert(toks === Vector(Token("quick", 1), Token("brown", 2), Token("fox", 3)))
  }

  test("standard: email splits at @, keeps dotted host (reference AnalyzersTest.java:149-152)") {
    assert(terms(Analyzers.Standard, "foo@bar.com") === Seq("foo", "bar.com"))
  }

  test("classic: email/host one token (reference AnalyzersTest.java:149-152)") {
    assert(terms(Analyzers.Classic, "foo@bar.com") === Seq("foo@bar.com"))
    assert(terms(Analyzers.Classic, "mail me at xyz@example.co.uk today") ===
      Seq("mail", "me", "xyz@example.co.uk", "today"))
    assert(terms(Analyzers.Classic, "visit www.example.com now") ===
      Seq("visit", "www.example.com", "now"))
  }

  test("classic: company, acronym, possessive, numbers (ClassicTokenizer/ClassicFilter)") {
    assert(terms(Analyzers.Classic, "AT&T and Excite@Home") === Seq("at&t", "excite@home"))
    assert(terms(Analyzers.Classic, "made in U.S.A.") === Seq("made", "usa"))
    assert(terms(Analyzers.Classic, "O'Neil's car") === Seq("o'neil", "car"))
    assert(terms(Analyzers.Classic, "pi is 3.14") === Seq("pi", "3.14"))
  }

  test("classic: lowercase + stop removal + position gaps like standard") {
    val toks = Analyzers.Classic.tokens("The Quick brown FOX")
    assert(toks === Vector(Token("quick", 1), Token("brown", 2), Token("fox", 3)))
    assert(Analyzers.byName("classic") === Analyzers.Classic)
  }

  test("standard: numbers keep interior . and ,") {
    assert(terms(Analyzers.Standard, "pi is 3.14 and n is 1,024") === Seq("pi", "3.14", "n", "1,024"))
  }

  test("standard: apostrophes join letters") {
    assert(terms(Analyzers.Standard, "can't won't") === Seq("can't", "won't"))
  }

  test("standard: punctuation breaks tokens") {
    assert(terms(Analyzers.Standard, "hello, world! (batch/merge)") === Seq("hello", "world", "batch", "merge"))
  }

  test("standard: all-stop-word input yields nothing") {
    assert(terms(Analyzers.Standard, "the of and to") === Seq())
  }

  test("standard: max token length splits at 255") {
    val long = "a" * 600
    val ts = terms(Analyzers.Standard, long)
    assert(ts.map(_.length) === Seq(255, 255, 90))
  }

  test("whitespace: preserves case, splits on spaces only") {
    assert(terms(Analyzers.Whitespace, "Foo BAR baz.qux") === Seq("Foo", "BAR", "baz.qux"))
  }

  test("simple: letter runs only, lowercased, no stop removal") {
    assert(terms(Analyzers.Simple, "The 3 big-dogs") === Seq("the", "big", "dogs"))
  }

  test("keyword: whole input is one token") {
    assert(terms(Analyzers.Keyword, "Foo Bar") === Seq("Foo Bar"))
  }

  test("ngram default min=1 max=2 (reference AnalyzersTest.java:139-146)") {
    val ts = terms(Analyzers.NGram(Analyzers.Simple, 1, 2), "ab")
    assert(ts === Seq("a", "b", "ab"))
  }

  test("perfield dispatch") {
    val pf = Analyzers.PerField(Map("id" -> Analyzers.Keyword), Analyzers.Standard)
    assert(pf("id") === Analyzers.Keyword)
    assert(pf("text") === Analyzers.Standard)
  }

  test("TokenBuffer merge-sort path ≡ insertion-sort path on large documents") {
    // > MergeSortThreshold tokens forces the merge path; compare against a
    // reference sort of the same (term, pos) pairs
    val rnd = new scala.util.Random(7)
    val words = Vector("kafka", "spark", "merge", "batch", "zz", "aa", "m")
    val n = graft.analysis.TokenBuffer.MergeSortThreshold * 4 + 13
    val buf = new graft.analysis.TokenBuffer(16)
    val pairs = (0 until n).map(i => (words(rnd.nextInt(words.length)), i))
    pairs.foreach { case (t, p) => buf.add(t, p) }
    buf.sort()
    val got = (0 until buf.len).map(i => (buf.terms(i), buf.poss(i)))
    assert(got === pairs.sortBy(identity))
    // small case still exercises insertion sort
    val small = new graft.analysis.TokenBuffer(4)
    Seq(("b", 0), ("a", 1), ("b", 2), ("a", 3)).foreach { case (t, p) => small.add(t, p) }
    small.sort()
    assert((0 until small.len).map(i => (small.terms(i), small.poss(i))) ===
      Seq(("a", 1), ("a", 3), ("b", 0), ("b", 2)))
  }

  test("classic/ngram tokensInto ≡ tokens (zero-alloc overrides keep the goldens)") {
    val samples = Seq("foo@bar.com visits www.example.com", "AT&T and O'Neil's U.S.A. trip",
      "paxos made simple again", "The Quick brown FOX")
    Seq(Analyzers.Classic, Analyzers.NGram(), Analyzers.NGram(Analyzers.Simple, 1, 3)).foreach { a =>
      samples.foreach { s =>
        val buf = new graft.analysis.TokenBuffer(8)
        a.tokensInto(s, buf)
        val viaInto = (0 until buf.len).map(i => Token(buf.terms(i), buf.poss(i)))
        assert(viaInto === a.tokens(s), s"analyzer $a on '$s'")
      }
    }
  }

  test("analyzer names round-trip through the spec digest (incl. parameterized ngram)") {
    import graft.index.SegmentStore.analyzerName
    val all = Seq(Analyzers.Standard, Analyzers.Classic, Analyzers.Simple,
      Analyzers.Whitespace, Analyzers.Keyword, Analyzers.NGram(),
      Analyzers.NGram(Analyzers.Whitespace, 2, 3))
    all.foreach(a => assert(Analyzers.byName(analyzerName(a)) === a))
    // distinct analyzers must yield distinct digests (the ADVICE r3 bug:
    // NGram collapsed to "standard", hiding a spec change)
    assert(analyzerName(Analyzers.NGram()) !== analyzerName(Analyzers.Standard))
    // NESTED parameterized ngram: the name must parse from the right, or a
    // written spec fails at every later open/specChanged (ADVICE r4)
    val nested = Analyzers.NGram(Analyzers.NGram(Analyzers.Whitespace, 1, 2), 2, 3)
    assert(Analyzers.byName(analyzerName(nested)) === nested)
    intercept[IllegalArgumentException](Analyzers.byName("ngram:standard:1"))
    intercept[IllegalArgumentException](Analyzers.byName("ngram:standard:a:b"))
  }

  test("positions enable exact-phrase semantics across stop gaps") {
    // "made" at 1, "simple" at 2: "paxos made simple" is consecutive
    val toks = Analyzers.Standard.tokens("paxos made simple")
    assert(toks === Vector(Token("paxos", 0), Token("made", 1), Token("simple", 2)))
    // stop word inside: "state of the art" → state(0), art(3): NOT consecutive
    val toks2 = Analyzers.Standard.tokens("state of the art")
    assert(toks2 === Vector(Token("state", 0), Token("art", 3)))
  }
}
