package graft.query

/** Phrase-frequency kernels shared by every execution path (DataFrame
  * executor, segment scorer, test oracle) — one source of truth so the
  * paths can't drift.
  *
  * Exact: terms at consecutive positions. Sloppy (slop s > 0): ordered
  * near-phrase — an occurrence is a strictly-increasing alignment
  * p_0 < p_1 < … < p_{n-1} whose span exceeds the exact span by at most s
  * (p_{n-1} - p_0 - (n-1) ≤ s), counted greedily left-to-right.
  * NOTE: Lucene's SloppyPhraseQuery additionally permits re-ordering at a
  * slop cost; this engine implements the ordered subset and documents the
  * divergence (COVERAGE.md) — the reference query workload uses slop 0,
  * where the two definitions coincide.
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

  def sloppyFreq(positions: Array[Array[Int]], slop: Int): Int = {
    val n = positions.length
    val first = positions(0)
    var f = 0
    var i = 0
    while (i < first.length) {
      val p0 = first(i)
      // greedy: smallest position of term j strictly after the previous
      var prev = p0
      var ok = true
      var j = 1
      while (ok && j < n) {
        val arr = positions(j)
        var k = java.util.Arrays.binarySearch(arr, prev + 1)
        if (k < 0) k = -k - 1
        if (k >= arr.length) ok = false
        else prev = arr(k)
        j += 1
      }
      if (ok && prev - p0 - (n - 1) <= slop) f += 1
      i += 1
    }
    f
  }
}
