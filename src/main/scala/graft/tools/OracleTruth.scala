package graft.tools

import graft.core._
import graft.data.Corpus

/** Sequential ground truth for the synthetic corpus at small scale: the
  * reference's exact semantics (case-url distinct -> fingerprint -> validity
  * reject -> upper-triangle all-pairs match -> transitive closure), computed
  * with the same core functions the Spark pipeline uses. The Spark pipeline
  * is graded against this (recall gate, cluster equivalence — SURVEY §5.3).
  */
object OracleTruth {

  final case class Truth(
      validUrls: Vector[String],
      rejectedUrls: Vector[String],
      matchedPairs: Set[(String, String)], // url_a < url_b
      clusters: Map[String, String] // url -> cluster_id (component min)
  )

  def compute(n: Long, cfg: GraftConfig): Truth = {
    val mh = new MinHasher(cfg.numPerm, cfg.seed)

    // F1: case-insensitive url distinct, keep earliest (warc_ts == index order)
    val keptIdx = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for (i <- 0L until n) {
      // Locale.ROOT: Spark's lower() is locale-independent — a default-locale
      // toLowerCase would diverge on e.g. tr-TR JVMs ('I' -> dotless 'ı')
      val lower = Corpus.urlOf(i).toLowerCase(java.util.Locale.ROOT)
      if (!keptIdx.contains(lower)) keptIdx(lower) = i
    }

    val sigs = keptIdx.values.toVector.map { i =>
      val text = Corpus.textOf(i, cfg.seed)
      (Corpus.urlOf(i), DocSignatures.of(text, cfg, mh))
    }
    val (valid, rejected) = sigs.partition(!_._2.isRejected)
    val validNonEmpty = valid.filter(_._2.textLen > 0)
    val rejectedAll = rejected.map(_._1) ++ valid.filter(_._2.textLen == 0).map(_._1)

    // Utf8Ordering everywhere a min/orientation is decided: the ground
    // truth must rank urls exactly like the Spark paths (UTF8 binary),
    // which diverges from Java compareTo on supplementary-plane urls
    implicit val ord: Ordering[String] = graft.core.Utf8Ordering
    val uf = new UnionFind[String]
    val pairs = scala.collection.mutable.Set.empty[(String, String)]
    val arr = validNonEmpty.toArray
    for (a <- arr.indices; b <- (a + 1) until arr.length) {
      val (ua, sa) = arr(a); val (ub, sb) = arr(b)
      val sim = Similarity.pairSimilarity(
        sa.simhashHead, sa.simhashTail, sb.simhashHead, sb.simhashTail,
        sa.textLen, sb.textLen, cfg)
      if (Similarity.matchesSimhash(sim, cfg)) {
        val p = if (ord.lt(ua, ub)) (ua, ub) else (ub, ua)
        pairs += p
        uf.union(ua, ub)
      }
    }
    Truth(
      validNonEmpty.map(_._1),
      rejectedAll,
      pairs.toSet,
      uf.components(validNonEmpty.map(_._1))
    )
  }
}
