package graft.core

/** Longest-verbatim-overlap detection between two documents — the
  * structural-similarity analog of the reference's SSIM pass (SURVEY §2.8
  * V4): SSIM catches pairs whose pHash differs but whose pixel structure
  * matches; this catches pairs whose shingle-set Jaccard is low but that
  * share a long verbatim block (e.g. 30% of doc A pasted into an unrelated
  * doc B).
  *
  * Implementation: a suffix automaton (Blumer et al.'s DAWG — the textbook
  * linear longest-common-substring algorithm) built over the SHORTER string,
  * then one linear traversal of the longer string tracking the longest
  * matched suffix. Exact — same value as the generalized-suffix-array
  * construction it replaced ([[suffixArray]]/[[kasai]] kept below for
  * spec-level cross-checks), but one allocation-light linear pass instead of
  * O(n log n) counting-sort doubling rounds. Runs per candidate pair inside
  * a partition — never on the driver.
  */
object SuffixOverlap {

  /** Length (in chars) of the longest common substring of a and b.
    * NUL chars in the input are mapped to \\u0001 (parity with the previous
    * separator-based construction, which conflated the two). */
  def longestCommonSubstring(a0: String, b0: String): Int = {
    if (a0 == null || b0 == null || a0.isEmpty || b0.isEmpty) return 0
    val x0 = a0.replace('\u0000', '\u0001')
    val y0 = b0.replace('\u0000', '\u0001')
    // automaton over the shorter string: state/transition arrays scale with
    // the automaton string, the traversal is a linear scan either way
    val (a, b) = if (x0.length <= y0.length) (x0, y0) else (y0, x0)

    // dense alphabet of `a` — transitions are a flat states x alphabet array;
    // a char of `b` outside it resets the current match
    val ca = a.toCharArray
    val sortedA = ca.clone()
    java.util.Arrays.sort(sortedA)
    val alpha = new Array[Char](sortedA.length)
    var nAlpha = 0
    var i = 0
    while (i < sortedA.length) {
      if (nAlpha == 0 || sortedA(i) != alpha(nAlpha - 1)) {
        alpha(nAlpha) = sortedA(i); nAlpha += 1
      }
      i += 1
    }

    val maxStates = 2 * ca.length + 2
    val next = new Array[Int](maxStates * nAlpha)
    java.util.Arrays.fill(next, -1)
    val link = new Array[Int](maxStates)
    val len = new Array[Int](maxStates)
    link(0) = -1
    var size = 1
    var last = 0
    i = 0
    while (i < ca.length) {
      val c = java.util.Arrays.binarySearch(alpha, 0, nAlpha, ca(i))
      val cur = size; size += 1
      len(cur) = len(last) + 1
      link(cur) = 0
      var p = last
      while (p != -1 && next(p * nAlpha + c) == -1) {
        next(p * nAlpha + c) = cur
        p = link(p)
      }
      if (p != -1) {
        val q = next(p * nAlpha + c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          System.arraycopy(next, q * nAlpha, next, clone * nAlpha, nAlpha)
          while (p != -1 && next(p * nAlpha + c) == q) {
            next(p * nAlpha + c) = clone
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }

    // walk b through the automaton, tracking the longest suffix of b[0..j]
    // that occurs in a (standard suffix-link fallback traversal)
    var best = 0
    var v = 0
    var l = 0
    var j = 0
    val nb = b.length
    while (j < nb) {
      val c = java.util.Arrays.binarySearch(alpha, 0, nAlpha, b.charAt(j))
      if (c < 0) { v = 0; l = 0 }
      else {
        while (v != 0 && next(v * nAlpha + c) == -1) {
          v = link(v)
          l = len(v)
        }
        val t = next(v * nAlpha + c)
        if (t != -1) { v = t; l += 1 }
        else l = 0
        if (l > best) best = l
      }
      j += 1
    }
    best
  }

  /** Suffix array via prefix doubling with LSD radix (counting) sort per
    * round — O(n log n), fully primitive arrays (the round-3 boxed
    * Integer[]/comparator sort re-boxed every doubling round; this is the
    * same textbook construction with the sort replaced by two stable
    * counting-sort passes over int keys). */
  def suffixArray(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.emptyIntArray
    // alphabet compaction: map chars to dense ranks via a sorted copy, so the
    // counting passes scan O(n) buckets instead of a fixed 65536-bucket char
    // keyspace — this kernel runs once per candidate pair, and for short
    // strings the flat 256 KB zero-fill + full-keyspace scan dominated
    // (round-4 ADVICE #2)
    val chars = s.toCharArray
    val sorted = chars.clone()
    java.util.Arrays.sort(sorted)
    val uniq = new Array[Char](n)
    var distinct = 0
    var i = 0
    while (i < n) {
      if (distinct == 0 || sorted(i) != uniq(distinct - 1)) {
        uniq(distinct) = sorted(i); distinct += 1
      }
      i += 1
    }
    var sa = Array.tabulate(n)(identity)
    var tmp = new Array[Int](n)
    var rank = new Array[Int](n)
    i = 0
    while (i < n) {
      rank(i) = java.util.Arrays.binarySearch(uniq, 0, distinct, chars(i))
      i += 1
    }
    var rank2 = new Array[Int](n)
    // bucket array sized for the rank keyspace (dense char ranks and all
    // doubling-round ranks are < n); +2 for the shifted "out of range" key 0
    val cnt = new Array[Int](n + 2)

    /** Stable counting sort of `src` into `dst` by key rank(i+k)+1 (0 when
      * i+k is out of range); maxKey bounds the occupied key range. */
    def pass(src: Array[Int], dst: Array[Int], k: Int, maxKey: Int): Unit = {
      java.util.Arrays.fill(cnt, 0, maxKey + 2, 0)
      var i = 0
      while (i < n) {
        val p = src(i) + k
        val key = if (p < n) rank(p) + 1 else 0
        cnt(key) += 1
        i += 1
      }
      var sum = 0
      i = 0
      while (i <= maxKey + 1) { val c = cnt(i); cnt(i) = sum; sum += c; i += 1 }
      i = 0
      while (i < n) {
        val p = src(i) + k
        val key = if (p < n) rank(p) + 1 else 0
        dst(cnt(key)) = src(i)
        cnt(key) += 1
        i += 1
      }
    }

    // initial order: sort by first char (k=0 pass); ranks are already dense
    // from the alphabet compaction, so no re-rank is needed
    var maxRank = distinct - 1
    pass(sa, tmp, 0, maxRank)
    var t = sa; sa = tmp; tmp = t

    var k = 1
    while (k < n && maxRank < n - 1) {
      pass(sa, tmp, k, maxRank) // by second key rank(i+k)
      pass(tmp, sa, 0, maxRank) // stable by first key rank(i)
      // re-rank by the (rank, rank+k) pair
      rank2(sa(0)) = 0
      i = 1
      while (i < n) {
        val a = sa(i - 1); val b = sa(i)
        val a2 = if (a + k < n) rank(a + k) else -1
        val b2 = if (b + k < n) rank(b + k) else -1
        rank2(b) = rank2(a) + (if (rank(a) != rank(b) || a2 != b2) 1 else 0)
        i += 1
      }
      t = rank; rank = rank2; rank2 = t
      maxRank = rank(sa(n - 1))
      k <<= 1
    }
    sa
  }

  /** Kasai LCP array: lcp(i) = LCP(suffix sa(i-1), suffix sa(i)); lcp(0)=0. */
  def kasai(s: String, sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s.charAt(i + h) == s.charAt(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }
}
