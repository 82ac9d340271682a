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

  test("positions enable exact-phrase semantics across stop gaps") {
    // "made" at 1, "simple" at 2: "paxos made simple" is consecutive
    val toks = Analyzers.Standard.tokens("paxos made simple")
    assert(toks === Vector(Token("paxos", 0), Token("made", 1), Token("simple", 2)))
    // stop word inside: "state of the art" → state(0), art(3): NOT consecutive
    val toks2 = Analyzers.Standard.tokens("state of the art")
    assert(toks2 === Vector(Token("state", 0), Token("art", 3)))
  }
}
