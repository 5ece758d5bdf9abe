package graft.core

import java.util

/** k-shingling over canonical tokens — the sampling front-end (the analog of
  * the reference's fixed-position frame capture + montage, video.cpp:122-195,
  * thumbnail.h:19-26: deterministic, position-proportional sampling).
  *
  * Definition: each token is hashed once with XXH64(seed) over its UTF-8
  * bytes; a k-shingle's hash is XXH64(seed) over the k token-hashes'
  * little-endian bytes. Hashing token-hashes instead of re-encoding joined
  * strings makes the window loop allocation-free and lets head/tail/full
  * spans share one token-hash pass (measured ~5x on the fingerprint stage).
  * Shingle sets are returned distinct and sorted (signed order — consistency
  * is all that matters) so exact Jaccard can run as a linear merge.
  */
final class Shingler(k: Int, seed: Long) {
  require(k >= 1)

  /** Per-token hashes — compute once per document, reuse across spans. */
  def tokenHashes(tokens: Array[String]): Array[Long] = {
    val out = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) { out(i) = XXH64.hashString(tokens(i), seed); i += 1 }
    out
  }

  /** Hash of the window tokenHashes[from, from+len) — delegates to the
    * single LE-pack kernel in [[XXH64.hashLongsLE]]. */
  private def windowHash(th: Array[Long], from: Int, len: Int, buf: Array[Byte]): Long =
    XXH64.hashLongsLE(th, from, len, seed, buf)

  /** Distinct sorted shingle hashes over tokenHashes[from, until).
    * If the span is shorter than k but non-empty, the whole span is one
    * shingle (so short docs still fingerprint, like the reference still
    * hashes a short video's few frames). */
  def hashesOf(th: Array[Long], from: Int, until: Int): Array[Long] = {
    val n = until - from
    if (n <= 0) return Array.emptyLongArray
    val buf = new Array[Byte](k << 3)
    val out =
      if (n < k) Array(windowHash(th, from, n, buf))
      else {
        val a = new Array[Long](n - k + 1)
        var i = 0
        while (i <= n - k) { a(i) = windowHash(th, from + i, k, buf); i += 1 }
        a
      }
    util.Arrays.sort(out)
    // de-dup in place
    var w = 0
    var i = 0
    while (i < out.length) {
      if (w == 0 || out(w - 1) != out(i)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else util.Arrays.copyOf(out, w)
  }

  def hashes(tokens: Array[String], from: Int, until: Int): Array[Long] =
    hashesOf(tokenHashes(tokens), from, until)

  def hashes(tokens: Array[String]): Array[Long] = hashes(tokens, 0, tokens.length)
}

/** SimHash64 over a shingle-hash set — the pHash analog (reference:
  * video.cpp:197-228 computes a global statistic (DCT-coefficient mean) and a
  * sign bit per component; SimHash has exactly that shape: a per-bit
  * vote sum and its sign).
  *
  * Invalid/low-entropy inputs return 0L — the reference's in-band sentinel
  * (video.cpp:210-211 returns 0 for near-monochrome captures). Callers map
  * 0L to a NULL column; similarity keeps the both-zero guard
  * (comparison.cpp:157-158).
  */
object SimHash64 {

  /** 0L means "invalid / low entropy" (the monochrome sentinel). */
  def of(shingleHashes: Array[Long], minDistinct: Int): Long = {
    if (shingleHashes == null || shingleHashes.length < minDistinct) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < shingleHashes.length) {
      val h = shingleHashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      // strict > mirrors the reference's "larger than avg = 1" (video.cpp:224-226)
      if (votes(b) > 0) hash |= (1L << b)
      b += 1
    }
    // In the astronomically unlikely case the vote pattern yields exactly 0,
    // flip bit 0 so 0 stays a reserved sentinel.
    if (hash == 0L && shingleHashes.length >= minDistinct) 1L else hash
  }
}

/** MinHash signature over a shingle-hash set (A5 in SURVEY §2.4).
  * Permutation i is the 64-bit bijection x -> a_i * x + b_i (a_i odd), with
  * (a_i, b_i) drawn from SplitMix64(seed). Minima compare UNSIGNED.
  */
final class MinHasher(numPerm: Int, seed: Long) {
  private val as = new Array[Long](numPerm)
  private val bs = new Array[Long](numPerm)
  locally {
    var s = seed
    def next(): Long = { // SplitMix64 (public domain, Steele et al.)
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var i = 0
    while (i < numPerm) { as(i) = next() | 1L; bs(i) = next(); i += 1 }
  }

  /** Signature, or null if the set is empty. */
  def signature(shingleHashes: Array[Long]): Array[Long] = {
    if (shingleHashes == null || shingleHashes.isEmpty) return null
    val sig = new Array[Long](numPerm)
    var p = 0
    while (p < numPerm) {
      val a = as(p); val b = bs(p)
      var min = a * shingleHashes(0) + b
      var i = 1
      while (i < shingleHashes.length) {
        val v = a * shingleHashes(i) + b
        if (java.lang.Long.compareUnsigned(v, min) < 0) min = v
        i += 1
      }
      sig(p) = min
      p += 1
    }
    sig
  }

  /** Estimated Jaccard from two signatures. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    var same = 0
    var i = 0
    while (i < numPerm) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / numPerm
  }
}

/** The comparison kernel — an exact transplant of the reference's similarity
  * math with duration -> text length (chars).
  */
object Similarity {

  /** 64 - popcount(a ^ b) (reference: comparison.cpp:160-166, Kernighan loop). */
  @inline def hammingSim(a: Long, b: Long): Int =
    64 - java.lang.Long.bitCount(a ^ b)

  /** Length modifier (reference: comparison.cpp:168-174): within tolerance ->
    * +sameLenBonus, else -diffLenPenalty. */
  @inline def lenModifier(lenA: Long, lenB: Long, cfg: GraftConfig): Int =
    if (math.abs(lenA - lenB) <= cfg.lenTolChars) cfg.sameLenBonus
    else -cfg.diffLenPenalty

  /** Per-slot fingerprint similarity (reference: comparison.cpp:153-174):
    * both-zero guard, Hamming similarity, length modifier, clamp at 64.
    * Hashes use 0L as the invalid sentinel, exactly like the reference. */
  def slotSimilarity(hA: Long, hB: Long, lenA: Long, lenB: Long, cfg: GraftConfig): Int = {
    if (hA == 0L && hB == 0L) return 0 // comparison.cpp:157-158 — no modifier applied
    val d = hammingSim(hA, hB) + lenModifier(lenA, lenB, cfg)
    if (d > 64) 64 else d
  }

  /** Best-of-two similarity (reference: comparison.cpp:133-136 — cutEnds mode
    * takes the max over head/tail slots). Returns the max slot similarity. */
  def pairSimilarity(
      headA: Long, tailA: Long, headB: Long, tailB: Long,
      lenA: Long, lenB: Long, cfg: GraftConfig): Int = {
    val s0 = slotSimilarity(headA, headB, lenA, lenB, cfg)
    if (!cfg.cutEnds) s0
    else math.max(s0, slotSimilarity(tailA, tailB, lenA, lenB, cfg))
  }

  /** Fingerprint-mode match predicate (reference: comparison.cpp:137-140). */
  def matchesSimhash(simBits: Int, cfg: GraftConfig): Boolean =
    simBits >= cfg.simBitsThreshold

  /** Exact Jaccard over two distinct-sorted long arrays (linear merge) —
    * the SSIM analog (reference: ssim.cpp:39-64). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a == null || b == null || (a.isEmpty && b.isEmpty)) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Intersection/union SIZES behind `jaccard`, exposed as integers so a SQL
    * oracle can re-derive the match decision bit-for-bit (jaccard ==
    * inter / union as an IEEE double division of the same two integers).
    * Null/empty handling mirrors `jaccard`: (0, 0) means jaccard 0.0. */
  def jaccardCounts(a: Array[Long], b: Array[Long]): (Int, Int) = {
    if (a == null || b == null || (a.isEmpty && b.isEmpty)) return (0, 0)
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    (inter, a.length + b.length - inter)
  }

  /** Exact-verify match predicate (reference: comparison.cpp:143-147):
    * jaccard + modifier/64 > jaccardThreshold, gated by the caller at
    * simBits >= exactVerifyGate (comparison.cpp:141-142). */
  def matchesExact(jac: Double, lenA: Long, lenB: Long, cfg: GraftConfig): Boolean =
    jac + lenModifier(lenA, lenB, cfg) / 64.0 > cfg.jaccardThreshold
}
