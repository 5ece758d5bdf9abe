package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.spark.SparkTest

/** Round-2 gates for the training-data operator family: embedding near-dup
  * without an explicit block (no constant-key join), the big-block guard in
  * ngramJaccard, the integer-exact overlap ops, ANN LSH recall, and the
  * multimodal fold-hash pin. */
class OpsRound2Spec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  /** Deterministic embedding fixture: 200 random 32-dim vectors plus 20
    * colinear near-dups (ids 1000..1019 are scaled copies of 0..19 —
    * cosine exactly 1). */
  private def embFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 200).map(_ => Array.fill(32)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (0 until 20).map(i => ((i + 1000).toLong, base(i).map(x => x * 1.5f)))
    rows.toDF("vec_id", "embedding")
  }

  test("embeddingCosineDup with no block column: sketch-bucketed, finds all " +
      "planted colinear pairs, emits nothing below threshold") {
    import spark.implicits._
    val got = DedupOps.embeddingCosineDup(embFixture, threshold = 0.999, blockCol = None)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 20).map(i => (i.toLong, (i + 1000).toLong)).toSet
    assert(planted.subsetOf(got), s"missed ${planted -- got}")
    assert(got === planted, s"false positives: ${got -- planted}")
  }

  test("ANN LSH recall vs brute force on the planted fixture") {
    val r = AnnOps.lshRecall(embFixture, k = 1, nQueries = 20)
    // every query 0..19 has a colinear neighbor — identical sketch, same
    // bucket — so top-1 recall must be exact
    assert(r === 1.0, s"top-1 recall $r")
  }

  test("ngramJaccard big-block guard: banded path equals all-pairs at J>=0.5") {
    import spark.implicits._
    val docs = ((0 until 28).map(i => (i.toLong, s"uniq $i word salad entry number $i end")) ++
      Seq((100L, "the quick brown fox jumps over the lazy dog"),
          (101L, "the quick brown fox jumps over the lazy dog")))
      .map { case (id, t) => (id, "blk", t) }.toDF("doc_id", "src", "text")
    def pairs(cap: Long) =
      DedupOps.ngramJaccard(docs, "src", n = 3, minJaccard = 0.5, cfg, maxBlockRows = cap)
        .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val small = pairs(1000L) // all-pairs path
    val big = pairs(10L) // block of 30 > 10 -> banded path
    assert(small.contains((100L, 101L)))
    assert(big === small)
  }

  test("minhashLshExact proposes candidates in the VERIFIER'S similarity " +
      "space: no silent misses on tabs/newlines/space runs (round-2 ADVICE)") {
    import spark.implicits._
    // split(' ')-space near-identical pairs whose Extract.tokens rendering
    // diverges hard: tabs and newlines glue tokens, double spaces inject
    // empty tokens — the old Extract.tokens-based signatures measured a
    // different n-gram space here
    val weird = Seq(
      (0L, "alpha\tbeta gamma  delta epsilon\nzeta eta theta iota kappa"),
      (1L, "alpha\tbeta gamma  delta epsilon\nzeta eta theta iota lambda"),
      (2L, "one\n\ntwo  three\tfour five six seven eight nine ten"),
      (3L, "one\n\ntwo  three\tfour five six seven eight nine eleven"),
      (4L, "completely unrelated filler text with nothing shared at all"))
    val docs = weird.toDF("doc_id", "text")
    val got = DedupOps.minhashLshExact(docs, jacNum = 1, jacDen = 2, k = 3, cfg)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    // independent ground truth: brute-force split(' ') trigram jaccard
    def ngrams(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      val upto = math.max(toks.length - 2, 1)
      (0 until upto).map(i => toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")).toSet
    }
    val truth = (for {
      (ia, ta) <- weird; (ib, tb) <- weird if ia < ib
      sa = ngrams(ta); sb = ngrams(tb)
      inter = (sa & sb).size; union = (sa | sb).size
      if inter * 2 >= union
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty, "fixture must contain split-space near-dups")
    assert(got === truth, s"missed ${truth -- got}, extra ${got -- truth}")
  }

  test("ngramOverlapExact: hand-computed trigram intersection/union") {
    import spark.implicits._
    val d = Seq((1L, "s", "a b c d"), (2L, "s", "a b c e")).toDF("doc_id", "src", "text")
    // trigram sets {a b c, b c d} vs {a b c, b c e}: inter 1, union 3
    val r = DedupOps.ngramOverlapExact(d, "src", n = 3, jacNum = 1, jacDen = 4)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq === Seq(("s", 1L, 2L, 1L, 3L)))
    // below the rational threshold: 1/3 < 1/2 -> filtered
    assert(DedupOps.ngramOverlapExact(d, "src", 3, 1, 2).count() === 0)
  }

  test("minhashLshExact agrees with exact all-pairs overlap on a dup fixture") {
    import spark.implicits._
    val docs = ((0 until 40).map(i => (i.toLong, s"noise $i page about topic $i only")) ++
      Seq((200L, "shared body of text repeated across mirrors exactly"),
          (201L, "shared body of text repeated across mirrors exactly"),
          (202L, "shared body of text repeated across mirrors almost exactly")))
      .toDF("doc_id", "text")
    val got = DedupOps.minhashLshExact(docs, jacNum = 1, jacDen = 2, k = 3, cfg)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((200L, 201L)))
    // 202 differs by one token: trigram overlap still >= 1/2
    assert(got.contains((200L, 202L)) && got.contains((201L, 202L)))
    assert(got.forall { case (a, b) => a >= 200L && b >= 200L })
  }

  test("multimodal fold-hash is pinned (formatting/semantics drift detector)") {
    import spark.implicits._
    val media = Seq((1L, "pinned-payload".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.frameHashes(media, dim = 4)
      .orderBy("frame_idx")
      .select("frame_hash").as[Long].collect().toSeq
    assert(got === ExpectedFrameHashes.pinned, s"got $got")
  }
}

/** Literal expected values for the fold-hash pin — regenerate ONLY on a
  * deliberate fingerprint-semantics change (and bump the store config_fp
  * story if these ever feed persisted identities). */
object ExpectedFrameHashes {
  val pinned: Seq[Long] = Seq(-2173324085139105050L, -4465484521979585939L)
}
