package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query._

/** Parser shapes, mirroring the reference's CustomQueryParserTest.java:41-113. */
class QueryParserSpec extends AnyFunSuite {
  private def p(q: String, and: Boolean = false): Query = new QueryParser("default", and).parse(q)

  test("bare term targets the default field (reference util/Constants.java:31)") {
    assert(p("hello") === TermQ("default", "hello"))
  }

  test("field:term") {
    assert(p("role:assistant") === TermQ("role", "assistant"))
  }

  test("default operator OR → SHOULD clauses") {
    assert(p("hello world") === BoolQ(Seq(
      Clause(Occur.Should, TermQ("default", "hello")),
      Clause(Occur.Should, TermQ("default", "world")))))
  }

  test("AND upgrades both clauses to MUST (Lucene classic semantics)") {
    assert(p("hello AND world") === BoolQ(Seq(
      Clause(Occur.Must, TermQ("default", "hello")),
      Clause(Occur.Must, TermQ("default", "world")))))
  }

  test("default_operator=AND makes bare juxtaposition MUST") {
    assert(p("hello world", and = true) === BoolQ(Seq(
      Clause(Occur.Must, TermQ("default", "hello")),
      Clause(Occur.Must, TermQ("default", "world")))))
  }

  test("+ - NOT modifiers") {
    assert(p("+hello -world") === BoolQ(Seq(
      Clause(Occur.Must, TermQ("default", "hello")),
      Clause(Occur.MustNot, TermQ("default", "world")))))
    assert(p("hello NOT world") === BoolQ(Seq(
      Clause(Occur.Should, TermQ("default", "hello")),
      Clause(Occur.MustNot, TermQ("default", "world")))))
  }

  test("phrase with slop") {
    assert(p("\"paxos made simple\"") === PhraseQ("default", Seq("paxos", "made", "simple"), 0))
    assert(p("\"a b\"~2") === PhraseQ("default", Seq("a", "b"), 2))
    assert(p("text:\"hello world\"") === PhraseQ("text", Seq("hello", "world"), 0))
  }

  test("typed ranges → point ranges (reference CustomQueryParserTest.java:41-113)") {
    assert(p("age<long>:[12 TO 15]") === NumRangeQ("age", "long", Some(12.0), Some(15.0), true, true))
    assert(p("age<int>:{12 TO 15}") === NumRangeQ("age", "int", Some(12.0), Some(15.0), false, false))
    assert(p("price<double>:[1.5 TO *]") === NumRangeQ("price", "double", Some(1.5), None, true, true))
  }

  test("typed point query") {
    assert(p("age<long>:12") === NumTermQ("age", "long", 12.0))
  }

  test("date range parses the reference's patterns (FieldType.java:207-238)") {
    val q = p("ts<date>:[2026-01-01 TO 2026-02-01]").asInstanceOf[NumRangeQ]
    assert(q.lo === Some(1767225600000.0))
    assert(QueryParser.parseDateMillis("2026-01-01T00:00:00") === 1767225600000L)
    // 6th pattern: zoned date-only yyyy-MM-ddZ — midnight at the offset
    assert(QueryParser.parseDateMillis("2026-01-01+0000") === 1767225600000L)
    assert(QueryParser.parseDateMillis("2026-01-01+0100") === 1767225600000L - 3600000L)
    assert(QueryParser.parseDateMillis("2026-01-01-0500") === 1767225600000L + 5 * 3600000L)
  }

  test("untyped range is a lexicographic term range (FieldType.java:173-177)") {
    assert(p("source:[src1 TO src3]") === TermRangeQ("source", Some("src1"), Some("src3"), true, true))
  }

  test("prefix, wildcard, fuzzy, boost") {
    assert(p("lead*") === PrefixQ("default", "lead"))
    assert(p("qu?rum") === WildcardQ("default", "qu?rum"))
    assert(p("paxos~") === FuzzyQ("default", "paxos", 2))
    assert(p("paxos~1") === FuzzyQ("default", "paxos", 1))
    // Lucene FuzzyQuery.floatToEdits: legacy similarity floats and the
    // MAXIMUM_SUPPORTED_DISTANCE=2 cap (reference parser is Lucene classic;
    // float precision matters: (1D-0.8f)*5 = 0.99999994 -> 0 edits)
    assert(p("paxos~0.8") === FuzzyQ("default", "paxos", 0))
    assert(p("paxos~0.7") === FuzzyQ("default", "paxos", 1)) // (1D-0.7f)*5 = 1.5
    assert(p("paxos~0.4") === FuzzyQ("default", "paxos", 2)) // 3.0 -> cap 2
    assert(p("paxos~0") === FuzzyQ("default", "paxos", 0))
    assert(p("paxos~5") === FuzzyQ("default", "paxos", 2)) // integer cap
    // Lucene rejects fractional EDIT distances (handleBareFuzzy)
    intercept[IllegalArgumentException](p("paxos~1.5"))
    assert(p("merge^2.5") === BoostQ(TermQ("default", "merge"), 2.5))
  }

  test("leading wildcard gated (reference lucene.allowLeadingWildcard, ini:21-22)") {
    intercept[IllegalArgumentException](p("*ark"))
    assert(new QueryParser("default", false, true).parse("*ark") === WildcardQ("default", "*ark"))
  }

  test("grouping and field-scoped groups") {
    assert(p("(hello OR world) AND retry") === BoolQ(Seq(
      Clause(Occur.Must, BoolQ(Seq(
        Clause(Occur.Should, TermQ("default", "hello")),
        Clause(Occur.Should, TermQ("default", "world"))))),
      Clause(Occur.Must, TermQ("default", "retry")))))
    assert(p("role:(user assistant)") === BoolQ(Seq(
      Clause(Occur.Should, TermQ("role", "user")),
      Clause(Occur.Should, TermQ("role", "assistant")))))
  }

  test("quote-aware comma split (reference util/Utils.java:76-78)") {
    assert(QueryParser.splitOnCommas("a,\"b,c\",d") === Seq("a", "\"b,c\"", "d"))
  }

  test("sort spec (reference CustomQueryParser.java:41-68)") {
    assert(QueryParser.parseSort("/field<string>,\\other,_score") === Seq(
      SortField("field", Some("string"), true),
      SortField("other", None, false),
      SortField("_score", None, true)))
  }

  test("sloppyFreq == brute-force alignment oracle (incl. re-ordered matches)") {
    import graft.query.PhraseMatch
    // oracle: full product enumeration over adjusted positions — an anchor
    // matches iff ANY choice of one adj per term spans ≤ slop
    def brute(positions: Array[Array[Int]], slop: Int): Int = {
      val n = positions.length
      val adj = Array.tabulate(n)(i => positions(i).map(_ - i))
      def combos(i: Int): Seq[Seq[Int]] =
        if (i == n) Seq(Seq.empty)
        else for (v <- adj(i).toSeq; rest <- combos(i + 1)) yield v +: rest
      adj(0).count { p =>
        combos(1).exists { rest =>
          val all = p +: rest
          all.max - all.min <= slop
        }
      }
    }
    val rng = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val nTerms = 2 + rng.nextInt(3)
      val positions = Array.fill(nTerms)(
        Array.fill(1 + rng.nextInt(8))(rng.nextInt(30)).distinct.sorted)
      (1 to 6).foreach { s =>
        assert(PhraseMatch.sloppyFreq(positions, s) === brute(positions, s),
          s"slop=$s positions=${positions.map(_.mkString("[", ",", "]")).mkString(" ")}")
      }
    }
    // Lucene's documented example: "a b"~2 matches reversed "b a"; ~1 does not
    assert(PhraseMatch.freq(Array(Array(1), Array(0)), 2) === 1)
    assert(PhraseMatch.freq(Array(Array(1), Array(0)), 1) === 0)
    // 3-term reorder: "a c b" for phrase "a b c"
    assert(PhraseMatch.freq(Array(Array(0), Array(2), Array(1)), 2) === 1)
  }

  test("PhraseMatch properties: slop-monotone, exact==slop0, bounded by min df") {
    import graft.query.PhraseMatch
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val nTerms = 2 + rng.nextInt(3)
      val positions = Array.fill(nTerms)(
        Array.fill(1 + rng.nextInt(12))(rng.nextInt(60)).distinct.sorted)
      val freqs = (0 to 8).map(s => PhraseMatch.freq(positions, s))
      // monotone non-decreasing in slop
      freqs.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
      // exact == slop 0 kernel
      assert(freqs.head === PhraseMatch.exactFreq(positions))
      // can never exceed the first term's occurrence count
      assert(freqs.last <= positions.head.length)
    }
  }

  // ---- `\`-escapes (round 5): Lucene classic lets `\` escape ANY char;
  // the reference's own test queries a field name containing a space
  // (CustomQueryParserTest.java:96-100, fieldNameWithEscapedSpaces)

  test("escaped space makes a field name with a space") {
    assert(p("foo\\ bar:baz") === TermQ("foo bar", "baz"))
  }

  test("escaped colon stays inside the term") {
    assert(p("url\\:8080") === TermQ("default", "url:8080"))
  }

  test("escaped tilde / caret are literal term chars") {
    assert(p("a\\~b") === TermQ("default", "a~b"))
    assert(p("a\\^2") === TermQ("default", "a^2"))
  }

  test("escaping an ordinary char is a no-op") {
    assert(p("du\\p") === TermQ("default", "dup"))
  }

  test("escaped wildcard chars are NOT wildcards") {
    assert(p("sp\\*") === TermQ("default", "sp*"))
    assert(p("fi\\?le") === TermQ("default", "fi?le"))
    // unescaped trailing * still a prefix even with an escaped one inside
    assert(p("a\\?b*") === PrefixQ("default", "a?b"))
  }

  test("escaped wildcard mixed with a real one stays literal in the pattern") {
    // `fi\?le*x`: the '?' is literal, the '*' is a wildcard — the pattern
    // keeps `\?` so the shared regex compiler doesn't resurrect it
    assert(p("fi\\?le*x") === WildcardQ("default", "fi\\?le*x"))
    assert(p("a\\*b*c") === WildcardQ("default", "a\\*b*c"))
    val re = QueryBind.wildcardRegex("fi\\?le*x")
    assert(re === "^fi\\?le.*x$")
    assert("fi?leAAx".matches(re))
    assert(!"fiXleAAx".matches(re))
    val re2 = QueryBind.wildcardRegex("a\\*b*c")
    assert("a*bZZc".matches(re2) && !"aXbZZc".matches(re2))
  }

  test("literal backslashes survive into a wildcard pattern (re-escaped)") {
    // `file\\na?me`: raw term is `file\na?me` with a LITERAL backslash and a
    // real '?' wildcard — the pattern must re-escape the backslash or the
    // regex compiler pairs it with 'n' and drops it
    assert(p("file\\\\na?me") === WildcardQ("default", "file\\\\na?me"))
    val re = QueryBind.wildcardRegex("file\\\\na?me")
    assert("file\\naXme".matches(re), re)
    assert(!"filenaXme".matches(re), re)
    // `a\\\*b*c`: literal backslash THEN escaped '*' — the escaped wildcard
    // must stay literal (the bare re-insert used to be consumed by the
    // preceding literal backslash, re-activating the wildcard)
    assert(p("a\\\\\\*b*c") === WildcardQ("default", "a\\\\\\*b*c"))
    val re2 = QueryBind.wildcardRegex("a\\\\\\*b*c")
    assert("a\\*bZZc".matches(re2), re2)
    assert(!"a\\XbZZc".matches(re2), re2)
  }

  test("escaped angle brackets are NOT typed-field syntax") {
    assert(p("foo\\<int\\>:9") === TermQ("foo<int>", "9"))
    // the unescaped form still parses typed
    assert(p("foo<int>:9") === NumTermQ("foo", "int", 9.0))
  }

  test("escaped quote embeds in a phrase") {
    assert(p("\"say \\\"hi\\\" now\"") ===
      PhraseQ("default", Seq("say", "\"hi\"", "now"), 0))
  }

  test("escaped value after a field prefix") {
    assert(p("source:src\\ 3") === TermQ("source", "src 3"))
  }
}
