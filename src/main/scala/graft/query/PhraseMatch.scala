package graft.query

/** Phrase-frequency kernels shared by every execution path (DataFrame
  * executor, segment scorer, test oracle) — one source of truth so the
  * paths can't drift.
  *
  * Exact (slop 0): terms at consecutive positions.
  *
  * Sloppy (slop s > 0): Lucene SloppyPhraseQuery match semantics over
  * ADJUSTED positions adj_i = p_i − i (each term's position minus its
  * phrase offset): an occurrence anchored at a position p of term 0 exists
  * iff one adjusted position per remaining term can be chosen with
  * max(adj) − min(adj) ≤ slop. This window formulation is what makes
  * `"a b"~2` match the reversed text "b a" (adj span 2) — the reference
  * serves quoted queries through Lucene's sloppy scorer with exactly this
  * match set (CustomQueryParser.java:120-128 quoted path). Scoring uses
  * [[weightedFreq]]: Lucene's 1/(1+matchLength) per-match weight evaluated
  * at each anchor's minimal window ([[sloppyFreq]] is the unweighted match
  * count, kept for match-set reasoning and tests).
  */
object PhraseMatch {

  /** positions(i) = sorted positions of phrase term i. */
  def freq(positions: Array[Array[Int]], slop: Int): Int =
    if (slop <= 0) exactFreq(positions) else sloppyFreq(positions, slop)

  def exactFreq(positions: Array[Array[Int]]): Int = {
    val first = positions(0)
    var f = 0
    var i = 0
    while (i < first.length) {
      val p = first(i)
      var ok = true
      var j = 1
      while (ok && j < positions.length) {
        ok = java.util.Arrays.binarySearch(positions(j), p + j) >= 0
        j += 1
      }
      if (ok) f += 1
      i += 1
    }
    f
  }

  /** Lucene-shaped sloppy phrase frequency: each matching anchor
    * contributes weight 1/(1+matchLength) where matchLength is the
    * anchor's MINIMAL adjusted-position window span (Lucene
    * SloppyPhraseScorer weights each match by sloppyWeight(matchLength) =
    * 1/(1+matchLength); we evaluate it at the per-anchor optimum). At
    * slop 0 every match has length 0 and weight 1 — identical to
    * [[exactFreq]], so the exact path and the sloppy path agree on the
    * boundary.
    */
  def weightedFreq(positions: Array[Array[Int]], slop: Int): Double = {
    if (slop <= 0) return exactFreq(positions).toDouble
    val n = positions.length
    val adj: Array[Array[Int]] = Array.tabulate(n)(i => positions(i).map(_ - i))
    val first = adj(0)
    var f = 0.0
    var i = 0
    while (i < first.length) {
      val span = minSpanAnchored(adj, first(i))
      if (span <= slop) f += 1.0 / (1.0 + span)
      i += 1
    }
    f
  }

  /** Number of term-0 positions whose minimal containing adjusted-position
    * window is ≤ slop (re-ordered alignments allowed — reordering shows up
    * as a negative adjusted offset, paid for by window width).
    */
  def sloppyFreq(positions: Array[Array[Int]], slop: Int): Int = {
    val n = positions.length
    val adj: Array[Array[Int]] = Array.tabulate(n)(i => positions(i).map(_ - i))
    val first = adj(0)
    var f = 0
    var i = 0
    while (i < first.length) {
      if (minSpanAnchored(adj, first(i)) <= slop) f += 1
      i += 1
    }
    f
  }

  /** Minimum window span over choices of one adjusted position per term,
    * with term 0 pinned at `p`. Exact: in any optimal window each chosen
    * value can be moved to its nearest neighbor toward `p` on the same side
    * without growing the window, so only the nearest-below-or-equal /
    * nearest-above candidates matter — 2^(n−1) side combinations, n = the
    * (tiny) phrase length.
    */
  private def minSpanAnchored(adj: Array[Array[Int]], p: Int): Int = {
    val n = adj.length
    val below = new Array[Long](n)
    val above = new Array[Long](n)
    var i = 1
    while (i < n) {
      val arr = adj(i)
      var k = java.util.Arrays.binarySearch(arr, p)
      if (k >= 0) { below(i) = p.toLong; above(i) = p.toLong }
      else {
        k = -k - 1
        below(i) = if (k > 0) arr(k - 1).toLong else Long.MinValue
        above(i) = if (k < arr.length) arr(k).toLong else Long.MaxValue
      }
      i += 1
    }
    var best = Int.MaxValue
    val combos = 1 << (n - 1)
    var c = 0
    while (c < combos) {
      var lo = p.toLong
      var hi = p.toLong
      var ok = true
      var j = 1
      while (ok && j < n) {
        val v = if (((c >> (j - 1)) & 1) == 0) below(j) else above(j)
        if (v == Long.MinValue || v == Long.MaxValue) ok = false
        else { if (v < lo) lo = v; if (v > hi) hi = v }
        j += 1
      }
      if (ok && hi - lo < best) best = (hi - lo).toInt
      c += 1
    }
    best
  }
}
