package graft.query

/** Logical query AST — the node set mirrors exactly what the reference
  * serves, enumerated by its own debug plan printer
  * (/root/reference/src/main/java/com/github/rnewson/couchdb/lucene/QueryPlan.java:83-106):
  * Term, Boolean, TermRange, Prefix, Wildcard, Fuzzy, Boost, Phrase, plus the
  * typed point/range queries built by its CustomQueryParser
  * (CustomQueryParser.java:113-128).
  */
sealed trait Query

object Occur extends Enumeration { val Must, Should, MustNot = Value }
final case class Clause(occur: Occur.Value, q: Query)

final case class TermQ(field: String, term: String) extends Query
final case class PhraseQ(field: String, terms: Seq[String], slop: Int = 0) extends Query
final case class BoolQ(clauses: Seq[Clause]) extends Query
final case class PrefixQ(field: String, prefix: String) extends Query
final case class WildcardQ(field: String, pattern: String) extends Query
final case class FuzzyQ(field: String, term: String, maxEdits: Int = 2) extends Query
/** Untyped lexicographic term range — reference FieldType.java:173-177. */
final case class TermRangeQ(field: String, lo: Option[String], hi: Option[String],
    incLo: Boolean, incHi: Boolean) extends Query
/** Typed numeric/date range over a doc-value column —
  * `field<type>:[a TO b]` (reference TypedField.java:29-48).
  */
final case class NumRangeQ(field: String, tpe: String, lo: Option[Double], hi: Option[Double],
    incLo: Boolean, incHi: Boolean) extends Query
/** Typed numeric/date point query — `field<long>:12`. */
final case class NumTermQ(field: String, tpe: String, value: Double) extends Query
final case class BoostQ(q: Query, boost: Double) extends Query
case object MatchAllQ extends Query
/** A clause the analyzer dropped entirely (e.g. a stop word) — Lucene's
  * parser returns null and the enclosing BooleanQuery skips it.
  */
case object EmptyQ extends Query

/** Lucene `BooleanQuery.maxClauseCount` analog (default 1024): multi-term
  * expansions (prefix/wildcard/fuzzy/term-range) are capped on BOTH
  * executors. The reference surfaces Lucene's TooManyClauses as a client
  * error rather than attempting an unbounded rewrite; more importantly at
  * our scale, the cap bounds the driver-side expansion collect.
  */
object QueryLimits {
  val MaxClauseCount: Int = 1024
  final class TooManyClauses(field: String, cap: Int) extends RuntimeException(
    s"multi-term query on field '$field' expands to more than $cap terms (maxClauseCount)")
}

/** Sort key per the reference's `?sort=` syntax: `/field<type>` asc,
  * `\field` desc, specials `_score`, `_doc`
  * (CustomQueryParser.java:41-68).
  */
final case class SortField(field: String, tpe: Option[String], ascending: Boolean)

final case class SearchOptions(
    limit: Int = 25, // reference default, couchdb-lucene.ini:18
    skip: Int = 0,
    sort: Seq[SortField] = Nil,
    defaultField: String = "default",
    defaultOperatorAnd: Boolean = false, // ?default_operator, DatabaseIndexer.java:478-479
    includeDocs: Boolean = false,
    includeFields: Seq[String] = Nil,
    allowLeadingWildcard: Boolean = false, // lucene.allowLeadingWildcard default
    highlights: Int = 0, // ?highlights=n fragments (DatabaseIndexer.java:469)
    highlightLength: Int = 100, // ?highlight_length, min 18 in the reference
    /** `?analyzer=` — overrides the query-TIME analyzer for TEXT fields
      * (index-time analysis is fixed by the spec), by registry name —
      * reference DatabaseIndexer.java:477, util/Analyzers.java:283-299.
      */
    analyzer: Option[String] = None)
