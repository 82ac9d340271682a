package graft

import graft.analysis.Analyzers

/** Generates the DuckDB oracle SQL that recomputes each full-text query —
  * tokenization, BM25 (k1=1.2, b=0.75), boolean combination, top-k — from
  * the raw `documents` parquet. The SQL mirrors the engine's arithmetic
  * expression-for-expression (literals written as `(1.2 + 1.0)` etc. so both
  * sides evaluate the same double operations); `round(s, 4)` absorbs
  * ulp-level summation-order differences.
  *
  * Tokenizer equivalence: the documents corpus is lowercase letters+spaces
  * only, where the Standard analyzer's stream equals
  * `regexp_extract_all(lower(text), '[a-z0-9]+')` minus the English stop set
  * (EngineSpec asserts this corpus property).
  */
object FtOracle {

  private val stopList = Analyzers.EnglishStopWords.toSeq.sorted.map(w => s"'$w'").mkString(", ")

  /** Shared CTEs: token stream with pre-stop positions, post-stop doc
    * lengths, field stats, tf, df — the SQL rendering of SURVEY.md §2.5.
    */
  val baseCtes: String =
    s"""tok AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
       |         unnest(generate_series(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS pos
       |  FROM documents
       |),
       |ftok AS (SELECT * FROM tok WHERE term NOT IN ($stopList)),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ftok GROUP BY doc_id),
       |fstat AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ftok GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)""".stripMargin

  private def idfExpr(dfExpr: String, nExpr: String): String =
    s"ln(1.0 + ($nExpr - $dfExpr + 0.5) / ($dfExpr + 0.5))"

  private def termIdf(term: String): String =
    s"(SELECT ${idfExpr("df.df", "(SELECT n FROM fstat)")} FROM df WHERE term = '$term')"

  private val tfNormDenom =
    "(1.2 * ((1.0 - 0.75) + (0.75 / (SELECT avgdl FROM fstat)) * dl.dl))"

  /** One boolean clause rendered as `SELECT doc_id, s`. */
  sealed trait OClause { def sql: String }

  /** Analyzed term on the default (text) field. `boost` = index-time
    * per-field boost folded into the weight (FieldDef.boost).
    */
  final case class OTerm(term: String, boost: Double = 1.0) extends OClause {
    private def w: String = {
      val idf = idfExpr("df.df", "(SELECT n FROM fstat)")
      if (boost == 1.0) idf else s"($idf * $boost)"
    }
    def sql: String =
      s"""SELECT tf.doc_id AS doc_id,
         |  $w
         |    * tf.tf * (1.2 + 1.0)
         |    / (tf.tf + $tfNormDenom) AS s
         |FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
         |WHERE tf.term = '$term'""".stripMargin
  }

  /** Untokenized STRING field term (lang:, source:) — tf=1, dl=1, avgdl=1;
    * per-field stats over docs where the column is non-null.
    */
  final case class OStringTerm(column: String, value: String, boost: Double = 1.0) extends OClause {
    private val nF = s"(SELECT count(*)::DOUBLE FROM documents WHERE $column IS NOT NULL)"
    private val dfF = s"(SELECT count(*)::DOUBLE FROM documents WHERE $column = '$value')"
    private def w: String =
      if (boost == 1.0) idfExpr(dfF, nF) else s"(${idfExpr(dfF, nF)} * $boost)"
    def sql: String =
      s"""SELECT doc_id,
         |  $w
         |    * 1.0 * (1.2 + 1.0)
         |    / (1.0 + 1.2 * ((1.0 - 0.75) + (0.75 / 1.0) * 1.0)) AS s
         |FROM documents WHERE $column = '$value'""".stripMargin
  }

  /** Phrase on the text field: positional self-join, tf = match count,
    * idf = sum of the terms' idfs (Lucene PhraseQuery semantics).
    *
    * slop > 0 (2-term only): PhraseMatch's anchored window semantics — an
    * anchor position pa of term 0 matches iff its minimal matchLength
    * min|pb − pa − 1| ≤ slop (covers re-ordered "b a" at slop ≥ 2), and pf
    * sums the Lucene sloppy weights 1/(1+matchLength) over anchors.
    */
  final case class OPhrase(terms: Seq[String], slop: Int = 0) extends OClause {
    def sql: String = {
      val sumIdf = terms.map(termIdf).mkString("(", " + ", ")")
      val body =
        if (slop <= 0) {
          val joins = terms.zipWithIndex.map { case (t, i) =>
            s"(SELECT doc_id, pos FROM tok WHERE term = '$t') p$i"
          }
          val conds = (1 until terms.length)
            .map(i => s"p$i.doc_id = p0.doc_id AND p$i.pos = p0.pos + $i")
          s"""SELECT p0.doc_id AS doc_id, count(*)::DOUBLE AS pf
             |  FROM ${joins.mkString(", ")}
             |  WHERE ${if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")}
             |  GROUP BY p0.doc_id""".stripMargin
        } else {
          // Lucene sloppy weighting: each anchor contributes
          // 1/(1+matchLength) at its minimal window (PhraseMatch.weightedFreq:
          // min over one ADJUSTED position adj_i = p_i − i per term, term 0
          // pinned, of max(adj) − min(adj)) — rendered directly as a min
          // over the cross product of the doc's positions, any n
          val joins = (1 until terms.length).map { i =>
            s"JOIN (SELECT doc_id, pos FROM tok WHERE term = '${terms(i)}') p$i ON p$i.doc_id = p0.doc_id"
          }
          val adj = terms.indices.map(i => if (i == 0) "p0.pos" else s"p$i.pos - $i")
          val span = s"greatest(${adj.mkString(", ")}) - least(${adj.mkString(", ")})"
          s"""SELECT a.doc_id AS doc_id, sum(1.0 / (1.0 + a.ml))::DOUBLE AS pf
             |  FROM (
             |    SELECT p0.doc_id AS doc_id, p0.pos AS pos, min($span) AS ml
             |    FROM (SELECT doc_id, pos FROM tok WHERE term = '${terms(0)}') p0
             |    ${joins.mkString("\n    ")}
             |    GROUP BY p0.doc_id, p0.pos
             |  ) a WHERE a.ml <= $slop
             |  GROUP BY a.doc_id""".stripMargin
        }
      s"""SELECT m.doc_id AS doc_id,
         |  $sumIdf * m.pf * (1.2 + 1.0) / (m.pf + $tfNormDenom) AS s
         |FROM (
         |  $body
         |) m JOIN dl ON m.doc_id = dl.doc_id""".stripMargin
    }
  }

  /** Constant-score multi-term (prefix/wildcard/fuzzy/term-range): docs whose
    * text contains any matching term — Lucene CONSTANT_SCORE rewrite, 1.0.
    * `pred` is a predicate over `term`.
    */
  final case class OTermPred(pred: String) extends OClause {
    def sql: String = s"SELECT DISTINCT doc_id, 1.0 AS s FROM tf WHERE $pred"
  }

  /** Constant-score STRING-field term range: predicate over the column. */
  final case class ODocPred(pred: String) extends OClause {
    def sql: String = s"SELECT doc_id, 1.0 AS s FROM documents WHERE $pred"
  }

  final case class OBoost(inner: OClause, factor: Double) extends OClause {
    def sql: String = s"SELECT doc_id, s * $factor AS s FROM (${inner.sql})"
  }

  /** Boolean combine + top-k envelope: union positive clauses, sum scores,
    * require all MUSTs, anti-join MUST_NOTs, rank by (s desc, doc_id asc).
    */
  def topk(
      musts: Seq[OClause] = Nil,
      shoulds: Seq[OClause] = Nil,
      nots: Seq[OClause] = Nil,
      k: Int = 10,
      skip: Int = 0): String = topkWith(baseCtes, musts, shoulds, nots, k, skip)

  /** Same envelope over a different tokenization (whitespace / ngram
    * analyzer gates supply their own tok/ftok/dl/fstat/tf/df CTE chain).
    */
  def topkWith(
      ctes: String,
      musts: Seq[OClause] = Nil,
      shoulds: Seq[OClause] = Nil,
      nots: Seq[OClause] = Nil,
      k: Int = 10,
      skip: Int = 0): String = {
    val body = rankedBody(musts, shoulds, nots)
    s"""WITH $ctes
       |SELECT doc_id, round(s, 4) AS score_r, rank
       |FROM ($body)
       |WHERE rank > $skip AND rank <= ${skip + k}
       |ORDER BY rank""".stripMargin
  }

  /** Whitespace-analyzer CTEs: split on \s+, NO stop removal, case kept
    * (the corpus is lowercase, so tokens differ from `standard` exactly by
    * stop retention — dl/avgdl/df all shift, a real differentiated check).
    */
  val wsCtes: String =
    """tok AS (
      |  SELECT doc_id,
      |         unnest(regexp_extract_all(text, '\S+')) AS term,
      |         unnest(generate_series(1, len(regexp_extract_all(text, '\S+')))) AS pos
      |  FROM documents WHERE doc_id < 200
      |),
      |ftok AS (SELECT * FROM tok),
      |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ftok GROUP BY doc_id),
      |fstat AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ftok GROUP BY doc_id, term),
      |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)""".stripMargin

  /** NGram(min=1,max=2 over standard tokens) CTEs: every 1- and 2-gram of
    * each post-stop token, inheriting the token's position.
    */
  val ngramCtes: String =
    s"""tok0 AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
       |         unnest(generate_series(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS pos
       |  FROM documents WHERE doc_id < 200
       |),
       |stok AS (SELECT * FROM tok0 WHERE term NOT IN ($stopList)),
       |gl AS (SELECT doc_id, term, pos, unnest(generate_series(1, 2)) AS g FROM stok),
       |gs AS (SELECT doc_id, term, pos, g,
       |              unnest(generate_series(1, greatest(length(term) - g + 1, 0))) AS st
       |       FROM gl),
       |tok AS (SELECT doc_id, substr(term, st, g) AS term, pos FROM gs),
       |ftok AS (SELECT * FROM tok),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ftok GROUP BY doc_id),
       |fstat AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ftok GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)""".stripMargin

  /** Multi-valued STRING field CTEs: each array element is one exact term
    * (tf = equal-element count, dl = element count). The gate derives the
    * array as `split(text, ' ')`, so the SQL splits the same way.
    */
  val wordCtes: String =
    """tok AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS term,
      |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      |  FROM documents WHERE doc_id < 200
      |),
      |ftok AS (SELECT * FROM tok),
      |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ftok GROUP BY doc_id),
      |fstat AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ftok GROUP BY doc_id, term),
      |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)""".stripMargin

  /** Multi-valued TEXT field CTEs: values analyzed as one stream with
    * continuing positions (Lucene position-increment gap 0) ≡ tokenizing
    * the space-joined values. Gate array = [source, text].
    */
  val comboCtes: String =
    s"""tok AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(source || ' ' || text), '[a-z0-9]+')) AS term,
       |         unnest(generate_series(1, len(regexp_extract_all(lower(source || ' ' || text), '[a-z0-9]+')))) AS pos
       |  FROM documents WHERE doc_id < 200
       |),
       |ftok AS (SELECT * FROM tok WHERE term NOT IN ($stopList)),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ftok GROUP BY doc_id),
       |fstat AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ftok GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)""".stripMargin

  /** Full highlight oracle (flips ft_highlight from rows-only to a hash
    * gate): reproduces [[graft.query.Highlighter.fragments]] for n = 2
    * fragments over the single-space-canonical corpus (EngineSpec asserts
    * canonicality, so word offsets are exact cumulative sums). Fragment 1
    * anchors at the first term hit, fragment 2 at the first hit past
    * fragment 1's end; every in-fragment whole-word occurrence is
    * <em>-wrapped; fragments join with " … " (the gate's concat_ws).
    */
  def highlight(shoulds: Seq[OClause], terms: Seq[String], k: Int, fragLen: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val termAlt = terms.mkString("|")
    s"""WITH $baseCtes,
       |ranked AS (${rankedBody(Nil, shoulds, Nil)}),
       |top AS (SELECT r.doc_id, r.s, r.rank, d.text
       |        FROM ranked r JOIN documents d USING (doc_id) WHERE r.rank <= $k),
       |words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |         unnest(generate_series(1, len(string_split(text, ' ')))) AS wpos
       |  FROM top
       |),
       |offs AS (
       |  SELECT doc_id, w, wpos,
       |         coalesce(sum(length(w) + 1) OVER (PARTITION BY doc_id ORDER BY wpos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
       |  FROM words
       |),
       |hits AS (SELECT doc_id, off, length(w)::BIGINT AS tlen FROM offs WHERE w IN ($termList)),
       |f1 AS (
       |  SELECT h.doc_id,
       |         greatest(0, arg_min(h.off, h.off) - ($fragLen - arg_min(h.tlen, h.off)) // 2) AS s1
       |  FROM hits h GROUP BY h.doc_id
       |),
       |f1e AS (SELECT f1.doc_id, f1.s1, least(length(t.text), f1.s1 + $fragLen) AS e1
       |        FROM f1 JOIN top t USING (doc_id)),
       |f2 AS (
       |  SELECT h.doc_id,
       |         greatest(0, arg_min(h.off, h.off) - ($fragLen - arg_min(h.tlen, h.off)) // 2) AS s2
       |  FROM hits h JOIN f1e ON h.doc_id = f1e.doc_id AND h.off >= f1e.e1
       |  GROUP BY h.doc_id
       |),
       |frags AS (
       |  SELECT t.doc_id, t.s, t.rank,
       |    regexp_replace(substr(t.text, f1e.s1 + 1, f1e.e1 - f1e.s1),
       |      '\\b($termAlt)\\b', '<em>\\1</em>', 'g') AS frag1,
       |    CASE WHEN f2.s2 IS NULL THEN NULL ELSE
       |      regexp_replace(substr(t.text, f2.s2 + 1, least(length(t.text), f2.s2 + $fragLen) - f2.s2),
       |        '\\b($termAlt)\\b', '<em>\\1</em>', 'g')
       |    END AS frag2
       |  FROM top t JOIN f1e ON t.doc_id = f1e.doc_id LEFT JOIN f2 ON t.doc_id = f2.doc_id
       |)
       |SELECT doc_id, round(s, 4) AS score_r,
       |       frag1 || CASE WHEN frag2 IS NULL THEN '' ELSE ' … ' || frag2 END AS highlights
       |FROM frags ORDER BY rank""".stripMargin
  }

  /** comb CTE body with rank column. */
  private def rankedBody(musts: Seq[OClause], shoulds: Seq[OClause], nots: Seq[OClause]): String = {
    val tagged =
      musts.map(c => s"SELECT doc_id, s, 1 AS m FROM (${c.sql})") ++
        shoulds.map(c => s"SELECT doc_id, s, 0 AS m FROM (${c.sql})")
    val union = tagged.mkString("\nUNION ALL\n")
    val having = if (musts.nonEmpty) s"HAVING sum(m) = ${musts.size}" else ""
    val notSimple =
      if (nots.isEmpty) ""
      else s"WHERE doc_id NOT IN (${nots.map(c => s"SELECT doc_id FROM (${c.sql})").mkString(" UNION ALL ")})"
    s"""SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
       |FROM (
       |  SELECT doc_id, sum(s) AS s FROM (
       |$union
       |  ) GROUP BY doc_id $having
       |) $notSimple""".stripMargin
  }

  /** Field-sorted variant: join a sort column, order by it (asc) then doc_id. */
  def sortedBy(clause: OClause, sortCol: String, k: Int): String =
    s"""WITH $baseCtes
       |SELECT doc_id, round(s, 4) AS score_r, $sortCol, rank FROM (
       |  SELECT c.doc_id AS doc_id, c.s AS s, d.$sortCol AS $sortCol,
       |         row_number() OVER (ORDER BY d.$sortCol ASC, c.doc_id ASC) AS rank
       |  FROM (${clause.sql}) c JOIN documents d ON c.doc_id = d.doc_id
       |) WHERE rank <= $k ORDER BY rank""".stripMargin

  /** Typed descending sort (`?sort=\col<int>`): order by the column's
    * numeric value desc, doc_id asc, with the per-row `sort_order` value
    * rendered as the engine does (long → string).
    */
  def sortedTypedDesc(clause: OClause, sortCol: String, k: Int): String =
    s"""WITH $baseCtes
       |SELECT doc_id, round(s, 4) AS score_r, sort_order, rank FROM (
       |  SELECT c.doc_id AS doc_id, c.s AS s,
       |         CAST(CAST(d.$sortCol AS BIGINT) AS VARCHAR) AS sort_order,
       |         row_number() OVER (ORDER BY d.$sortCol DESC, c.doc_id ASC) AS rank
       |  FROM (${clause.sql}) c JOIN documents d ON c.doc_id = d.doc_id
       |) WHERE rank <= $k ORDER BY rank""".stripMargin

  /** `?sort=/_doc`: the first k MATCHES by docId ascending — a
    * score-pruned base would return the wrong set (VERDICT r4 wrong #1).
    */
  def sortedByDoc(clause: OClause, k: Int): String =
    s"""WITH $baseCtes
       |SELECT doc_id, round(s, 4) AS score_r, rank FROM (
       |  SELECT doc_id, s, row_number() OVER (ORDER BY doc_id ASC) AS rank FROM (${clause.sql})
       |) WHERE rank <= $k ORDER BY rank""".stripMargin

  /** include_docs variant: top-k joined back to the stored text. */
  def withDocs(clause: OClause, k: Int): String =
    s"""WITH $baseCtes
       |SELECT r.doc_id AS doc_id, round(r.s, 4) AS score_r, r.rank AS rank, d.text AS text FROM (
       |  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank FROM (${clause.sql})
       |) r JOIN documents d ON r.doc_id = d.doc_id
       |WHERE r.rank <= $k ORDER BY r.rank""".stripMargin

  /** total_rows analog: hit count. */
  def total(musts: Seq[OClause] = Nil, shoulds: Seq[OClause] = Nil): String = {
    val tagged =
      musts.map(c => s"SELECT doc_id, s, 1 AS m FROM (${c.sql})") ++
        shoulds.map(c => s"SELECT doc_id, s, 0 AS m FROM (${c.sql})")
    val having = if (musts.nonEmpty) s"HAVING sum(m) = ${musts.size}" else ""
    s"""WITH $baseCtes
       |SELECT count(*)::BIGINT AS total_rows FROM (
       |  SELECT doc_id FROM (${tagged.mkString("\nUNION ALL\n")}) GROUP BY doc_id $having
       |)""".stripMargin
  }

  /** ?rewrite=true analog: per-term docFreq. */
  def docFreqs(terms: Seq[String]): String =
    s"""WITH $baseCtes
       |SELECT term, count(*)::BIGINT AS df
       |FROM (SELECT DISTINCT doc_id, term FROM ftok)
       |WHERE term IN (${terms.map(t => s"'$t'").mkString(", ")})
       |GROUP BY term""".stripMargin

  /** Multi-query batch: union of two ranked envelopes tagged by qid. */
  def multi(queries: Seq[(Seq[OClause], Seq[OClause], Int)]): String = {
    val parts = queries.zipWithIndex.map { case ((musts, shoulds, k), qid) =>
      s"""SELECT doc_id, round(s, 4) AS score_r, rank, $qid::INT AS qid
         |FROM (${rankedBody(musts, shoulds, Nil)}) WHERE rank <= $k""".stripMargin
    }
    s"WITH $baseCtes\n${parts.mkString("\nUNION ALL\n")}"
  }
}
