package graft.core

/** One document's full fingerprint record — the analog of the reference's
  * per-video state after `Video::run` (video.cpp:17-45): two 64-bit hashes
  * (head/tail in cutEnds mode, video.cpp:171,181-182), the exact-verify
  * inputs (grayThumb -> shingle sets), and the length that drives the
  * duration modifier.
  *
  * `simhashHead`/`simhashTail` use 0L as the invalid/low-entropy sentinel
  * internally (like the reference); the Spark layer maps 0L <-> NULL.
  */
final case class DocSignature(
    textLen: Long,
    sizeBytes: Long,
    simhashHead: Long,
    simhashTail: Long,
    shinglesHead: Array[Long],
    shinglesTail: Array[Long],
    minhash: Array[Long] // null when doc has no shingles
) {
  /** Reference rejects a video when every hash slot is 0 (video.cpp:40-42). */
  def isRejected: Boolean = simhashHead == 0L && simhashTail == 0L
}

object DocSignatures {

  /** Compute the full signature of a canonical text. Pure; shared verbatim by
    * the oracle layer and the Spark expression (so parity is by construction).
    *
    * cutEnds split: first half / last half of the token stream — the montage
    * half-split generalized (reference: video.cpp:181-182 copies
    * `hash*width/2, width/2` i.e. disjoint equal halves).
    */
  def of(text: String, cfg: GraftConfig, minHasher: MinHasher): DocSignature = {
    val toks = Extract.tokens(text)
    val sh = new Shingler(cfg.k, cfg.seed)
    val th = sh.tokenHashes(toks)
    val n = toks.length
    // X12 analog: store at most a bottom-k sketch of each slot's shingles
    // (arrays are sorted, so take() IS the bottom-k); fingerprints below are
    // computed on the FULL sets before capping.
    def cap(a: Array[Long]): Array[Long] =
      if (a.length <= cfg.maxStoredShinglesPerSlot) a
      else java.util.Arrays.copyOf(a, cfg.maxStoredShinglesPerSlot)
    if (cfg.cutEnds && n >= 2) {
      val mid = n / 2
      val head = sh.hashesOf(th, 0, mid)
      val tail = sh.hashesOf(th, mid, n)
      val full = sh.hashesOf(th, 0, n)
      DocSignature(
        textLen = text.length.toLong,
        sizeBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
        simhashHead = SimHash64.of(head, cfg.minDistinctShingles),
        simhashTail = SimHash64.of(tail, cfg.minDistinctShingles),
        shinglesHead = cap(head),
        shinglesTail = cap(tail),
        minhash = minHasher.signature(full)
      )
    } else {
      val full = sh.hashesOf(th, 0, n)
      DocSignature(
        textLen = text.length.toLong,
        sizeBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
        simhashHead = SimHash64.of(full, cfg.minDistinctShingles),
        simhashTail = 0L,
        shinglesHead = cap(full),
        shinglesTail = Array.emptyLongArray,
        minhash = minHasher.signature(full)
      )
    }
  }
}

/** Local union-find with path compression — the small-scale oracle for the
  * distributed connected-components operator (SURVEY §2.9 C1). The reference
  * never materializes clusters (the human walks matching pairs transitively,
  * comparison.cpp:101-126); the north rule makes the transitive closure
  * explicit, and this is its sequential ground truth.
  */
final class UnionFind[T] {
  private val parent = scala.collection.mutable.HashMap.empty[T, T]

  def find(x: T): T = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
    // path compression
    var c = x
    while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
    r
  }

  def union(a: T, b: T)(implicit ord: Ordering[T]): Unit = {
    val ra = find(a); val rb = find(b)
    if (ra != rb) {
      // canonical root = min (cluster_id = min(url), SURVEY §2.9 C2)
      if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
    }
  }

  /** Map every seen element to its canonical (minimum) representative. */
  def components(all: IterableOnce[T])(implicit ord: Ordering[T]): Map[T, T] = {
    val res = scala.collection.mutable.HashMap.empty[T, T]
    for (x <- all.iterator) res(x) = find(x)
    res.toMap
  }
}
