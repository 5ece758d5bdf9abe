package graft.tools

import graft.core._
import graft.data.{Corpus, Render}

/** CLI surface for the Spark-free oracle layer: synthesizes `n` pages,
  * extracts text from the rendered HTML (asserting byte-identity), computes
  * fingerprints, brute-forces the reference similarity over all pairs, and
  * prints match/cluster statistics. This is the sequential ground truth the
  * Spark pipeline is tested against (SURVEY.md §5.3).
  *
  * Usage: sbt "runMain graft.tools.OracleDemo [nDocs]"
  */
object OracleDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    require(n >= 0, s"nDocs must be >= 0, got $n")
    val cfg = GraftConfig()
    val mh = new MinHasher(cfg.numPerm, cfg.seed)
    println(s"config: threshold=${cfg.threshold} -> simBits>=${cfg.simBitsThreshold}, " +
      s"jaccard>${cfg.jaccardThreshold}, k=${cfg.k}, cutEnds=${cfg.cutEnds}, configFp=${cfg.configFp}")

    val t0 = System.nanoTime()
    var extractMismatch = 0
    val sigs = (0L until n.toLong).map { i =>
      val page = Corpus.page(i, cfg.seed)
      val extracted = Extract.text(page.html)
      if (extracted != page.text) extractMismatch += 1
      (page.url, DocSignatures.of(extracted, cfg, mh))
    }
    val tFp = (System.nanoTime() - t0) / 1e9

    val valid = sigs.filterNot(_._2.isRejected)
    val rejected = sigs.size - valid.size

    // reference loop shape: upper-triangle all pairs (comparison.cpp:34-42)
    val t1 = System.nanoTime()
    implicit val ord: Ordering[String] = graft.core.Utf8Ordering
    val uf = new UnionFind[String]
    var pairs = 0
    for (a <- valid.indices; b <- (a + 1) until valid.size) {
      val (ua, sa) = valid(a); val (ub, sb) = valid(b)
      val sim = Similarity.pairSimilarity(
        sa.simhashHead, sa.simhashTail, sb.simhashHead, sb.simhashTail,
        sa.textLen, sb.textLen, cfg)
      if (Similarity.matchesSimhash(sim, cfg)) { pairs += 1; uf.union(ua, ub) }
    }
    val tCmp = (System.nanoTime() - t1) / 1e9

    val comp = uf.components(valid.map(_._1))
    val clusters = comp.groupBy(_._2).filter(_._2.size > 1)
    val top = clusters.toSeq.sortBy(-_._2.size).take(5)

    println(f"docs=$n rejected=$rejected extract_mismatches=$extractMismatch")
    println(f"fingerprint: $tFp%.2fs (${n / math.max(tFp, 1e-9)}%.0f docs/s)  compare: $tCmp%.2fs")
    println(s"matched_pairs=$pairs dup_clusters=${clusters.size} docs_in_clusters=${clusters.map(_._2.size).sum}")
    top.foreach { case (cid, members) => println(s"  cluster $cid size=${members.size}") }
    if (extractMismatch > 0) { println("EXTRACTION BYTE-IDENTITY VIOLATED"); sys.exit(1) }
  }
}
