package graft.spark

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.data.{CorpusSpark, PageRow, Render}

/** §3.3 slider BELOW the original run threshold in exact mode: reverify must
  * reproduce exactly what a fresh pipeline run at the lower slider value
  * computes — while re-running only the Jaccard join for the never-gated
  * stratum (comparison.cpp:478-491 + the max(thr, 44) gate at
  * comparison.cpp:141-142; round-3 "what's missing" #1). */
class ReverifySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def matchedSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] = {
    import spark.implicits._
    df.filter(col("matched")).select("url_a", "url_b")
      .as[(String, String)].collect().toSet
  }

  test("reverify(v=70) over an 89-run == fresh exact-mode run at threshold 70") {
    val hi = GraftConfig(exactVerify = true) // v = 89, gate 57
    val pages = CorpusSpark.pages(spark, 800L, parts = 4, seed = hi.seed)
    val resHi = Pipeline.run(pages, hi)
    val sigs = resHi.signatures.filter(col("reject_reason").isNull)

    val rev = Pairs.reverify(resHi.pairs, sigs, hi, newThreshold = 70)
    val resLo = Pipeline.run(pages, hi.copy(threshold = 70)) // gate max(45,44)=45

    assert(matchedSet(rev) === matchedSet(resLo.pairs))
    // the lower gate admits the [45, 57) stratum: every admitted row now
    // carries computed (inter, union) measures — no null-jaccard holes left
    assert(rev.filter(col("sim_bits") >= 45 && col("jaccard").isNull).count() === 0)
    // and the stratum is real at this corpus: rows the original gate never
    // verified (jaccard was null in the 89-run) got verified now
    val freshlyVerified = resHi.pairs.filter(col("jaccard").isNull && col("sim_bits") >= 45)
    assert(freshlyVerified.count() > 0, "fixture must exercise the re-verify stratum")
  }

  test("reverify at the run's own threshold reproduces the run's matched set") {
    val cfg = GraftConfig(exactVerify = true)
    val pages = CorpusSpark.pages(spark, 600L, parts = 4, seed = cfg.seed)
    val res = Pipeline.run(pages, cfg)
    val sigs = res.signatures.filter(col("reject_reason").isNull)
    val rev = Pairs.reverify(res.pairs, sigs, cfg, newThreshold = cfg.threshold)
    assert(matchedSet(rev) === matchedSet(res.pairs))
  }
}

/** SURVEY §5.7 determinism contract for the PAIRS table (not just clusters):
  * heavy-key detection samples by CONTENT hash, so the candidate/pair tables
  * must be byte-identical across input partitionings — round 3 measured
  * matched_pairs 281,830 @ 4 cores vs 281,440 @ 16 cores from the old
  * per-partition row sample (round-3 verdict #2). */
class CandidateDeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("sampled heavy-key detection yields identical pairs across partitionings") {
    import spark.implicits._
    // aggressive sampling + a low cap puts many keys on the heavy/light
    // boundary — exactly the regime where a partition-dependent sample
    // classified different sets
    val cfg = GraftConfig(heavyBandKeyCap = 8, heavyDetectSampleFrac = 0.5)
    val pages = CorpusSpark.pages(spark, 1000L, parts = 4, seed = cfg.seed)
    val sigs = Fingerprints.fromPages(pages, cfg)
      .filter(col("reject_reason").isNull)
      .persist()
    sigs.count()
    def pairsOf(parts: Int): Set[(String, String)] =
      Candidates.candidatePairs(sigs.repartition(parts), cfg)
        .select("url_a", "url_b").as[(String, String)].collect().toSet
    val p2 = pairsOf(2)
    val p16 = pairsOf(16)
    assert(p2 === p16, s"pairs differ: only-in-2=${(p2 -- p16).take(3)} " +
      s"only-in-16=${(p16 -- p2).take(3)}")
    assert(p2.nonEmpty)
    sigs.unpersist()
  }
}

/** Substring-pass band keys are sampled from the FULL pre-cap shingle stream
  * (ss_keys, emitted by the fingerprint kernel): a verbatim block inside a
  * document whose shingle count exceeds the stored bottom-k cap must still
  * surface as a candidate and match via='substring' (round-3 verdict #5 /
  * "what's missing" #4 — the old sample was drawn from the capped arrays). */
class PrecapSubstringSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def word(prefix: String, i: Int): String = f"$prefix$i%05d"

  test("verbatim block in giant capped docs still pairs via substring") {
    import spark.implicits._
    // two documents of ~2700 distinct tokens each (~1300 shingles per cutEnds
    // slot >> cap of 256), sharing one 320-token verbatim block mid-document;
    // everything else is disjoint, so Jaccard/Hamming sit far below threshold
    val shared = (0 until 320).map(word("shared", _))
    def doc(prefix: String): String = {
      val left = (0 until 1200).map(word(prefix + "l", _))
      val right = (0 until 1200).map(word(prefix + "r", _))
      (left ++ shared ++ right).mkString(" ")
    }
    val ta = doc("aaa")
    val tb = doc("bbb")
    val rows = Seq(
      PageRow("http://big-a.example/x", new Timestamp(1700000000000L),
        Render.html(ta, 0L), ta, "en"),
      PageRow("http://big-b.example/y", new Timestamp(1700000100000L),
        Render.html(tb, 1L), tb, "en"))
    val pages = spark.createDataset(rows).toDF()

    val cfg = GraftConfig(substringPass = true, maxStoredShinglesPerSlot = 256)
    val res = Pipeline.run(pages, cfg)

    // the stored arrays really are capped, and ss_keys reaches the
    // capped-away region (keys above the stored bottom-k maximum)
    val sig = res.signatures.filter(col("url") === "http://big-a.example/x")
      .select("shingles_head", "shingles_tail", "ss_keys")
      .as[(Array[Long], Array[Long], Array[Long])].head()
    assert(sig._1.length === 256 && sig._2.length === 256, "cap must bind")
    val storedMax = math.max(sig._1.max, sig._2.max)
    assert(sig._3.exists(_ > storedMax),
      "ss_keys must sample beyond the stored bottom-k sketch")

    // end-to-end: the pair exists and matched via the suffix-array pass
    val pair = res.pairs
      .filter(col("url_a") === "http://big-a.example/x" &&
        col("url_b") === "http://big-b.example/y")
      .select("matched", "via", "overlap_len")
      .as[(Boolean, String, Option[Int])].collect()
    assert(pair.length === 1, "the shared-block pair must be a candidate")
    assert(pair.head._1, "pair must match")
    assert(pair.head._2 === "substring")
    assert(pair.head._3.exists(_ >= cfg.minSubstringOverlap))
  }
}
