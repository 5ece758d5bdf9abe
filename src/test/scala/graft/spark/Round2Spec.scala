package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.store.IcebergShaped

/** Round-2 regression gates: store read/delete round-trip, re-crawl
  * supersedence in the live view, empty-input robustness, the §3.3
  * re-threshold operator, substring-pass row retention, move/swap action
  * sinks, and S4 root validation. */
class StoreRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  private def tmpStore(): IcebergShaped.Table =
    IcebergShaped.table(Files.createTempDirectory("graft-store").toString)

  test("read retains part_id; delete() round-trips on a committed table") {
    val store = tmpStore()
    val pages = CorpusSpark.pages(spark, 200L, 4, cfg.seed)
    Resume.incrementalFingerprints(pages, store, cfg)

    val before = store.read(spark)
    assert(before.columns.contains("part_id"),
      "partition discovery must retain part_id (basePath per snapshot dir)")
    val total = before.count()
    val victim = before.select("content_id").orderBy("content_id").head().getString(0)

    store.delete(spark, col("content_id") === victim)
    val after = store.read(spark)
    assert(after.count() === total - 1)
    assert(after.filter(col("content_id") === victim).count() === 0)
    assert(after.columns.contains("part_id"))
    // delete is a snapshot, not a mutation: rollback restores the row
    store.rollback(store.currentVersion.get - 1)
    assert(store.read(spark).filter(col("content_id") === victim).count() === 1)
  }

  test("re-crawled url supersedes: live view is one row per url, newest wins") {
    val store = tmpStore()
    val pages = CorpusSpark.pages(spark, 100L, 4, cfg.seed)
    val r1 = Resume.incrementalFingerprints(pages, store, cfg)
    val liveUrls = r1.signatures.count()

    // same urls, one day later (new content_id per identity rule)
    val recrawl = pages.withColumn("warc_ts",
      timestamp_millis(unix_millis(col("warc_ts")) + 86400000L))
    val r2 = Resume.incrementalFingerprints(recrawl, store, cfg)
    assert(r2.newlyFingerprinted === liveUrls, "every re-crawl row recomputes")

    val live = r2.signatures
    assert(live.count() === liveUrls, "live view must not contain phantom url dups")
    assert(live.groupBy("url").count().filter(col("count") > 1).count() === 0)
    // and the surviving row is the NEW capture
    val oldMax = pages.agg(max(unix_millis(col("warc_ts")))).head().getLong(0)
    assert(live.filter(unix_millis(col("warc_ts")) <= oldMax).count() === 0)
  }
}

class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  test("empty page set: zero metrics, no NPE (first incremental batch shape)") {
    val pages = CorpusSpark.pages(spark, 50L, 2, cfg.seed).limit(0)
    val res = Pipeline.run(pages, cfg)
    val m = res.metrics.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("signatures") === 0L)
    assert(m("candidate_pairs") === 0L)
    assert(m("matched_pairs") === 0L)
    assert(m("dup_clusters") === 0L)
    assert(res.clusters.count() === 0L)
  }

  test("duplicate-free input: zero matched pairs, all singleton clusters") {
    import spark.implicits._
    // independent Base rows from non-skew groups (g=1,3: g%37 != 0, r in 1..5
    // — never a variant row, never the shared-boilerplate skew family); each
    // is an independently seeded random token stream, so the set is
    // genuinely duplicate-free. (Indices 0..2 would all be SkewBase rows
    // sharing a 400-token boilerplate prefix — near-duplicates.)
    val seed = cfg.seed // local copy: the closure must not capture the suite
    val pages = Seq(17L, 18L, 19L, 49L, 51L).toDS()
      .map(i => graft.data.Corpus.page(i, seed)).toDF()
    val res = Pipeline.run(pages, cfg)
    val m = res.metrics.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("signatures") === 5L)
    assert(m("matched_pairs") === 0L)
    assert(m("dup_clusters") === 0L)
    assert(m("docs_in_dup_clusters") === 0L)
    // every document is its own singleton cluster and its own keeper
    val clusters = res.clusters.select("url", "cluster_id", "is_keeper", "size")
      .collect()
    assert(clusters.length === 5)
    assert(clusters.map(_.getString(1)).distinct.length === 5, "non-singleton cluster")
    assert(clusters.forall(_.getBoolean(2)), "a singleton must be its own keeper")
  }
}

class RethresholdSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig() // threshold 89

  test("§3.3: lowering 89 -> 80 re-derives matches from persisted measures " +
      "and equals a fresh pipeline run at 80 — without re-fingerprinting") {
    import spark.implicits._
    val pages = CorpusSpark.pages(spark, 1600L, 8, cfg.seed)
    val res89 = Pipeline.run(pages, cfg)
    val pairs89 = res89.pairs

    val m89 = pairs89.filter(col("matched")).count()
    val re80 = Pairs.rethreshold(pairs89, 80)
    val m80 = re80.filter(col("matched")).count()
    assert(m80 > m89, "corpus must contain pairs in sim_bits [51,57)")

    // identity at the original threshold
    assert(Pairs.rethreshold(pairs89, 89)
      .filter(col("matched") =!=
        (col("sim_bits") >= cfg.simBitsThreshold)).count() === 0)

    // equivalence with a fresh run at 80 (candidates don't depend on the
    // threshold, so the matched PAIR SET must be identical)
    val res80 = Pipeline.run(pages, cfg.copy(threshold = 80))
    def matchedSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      df.filter(col("matched")).select("url_a", "url_b")
        .as[(String, String)].collect().toSet
    assert(matchedSet(re80) === matchedSet(res80.pairs))
  }
}

class ProgressSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("W2 progress position: canonical enumeration rank without a global sort") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"))
      .toDF("url_a", "url_b")
    assert(Pairs.progressOf(pairs, "a", "b") === ((1L, 4L, 0.25)))
    assert(Pairs.progressOf(pairs, "b", "c") === ((3L, 4L, 0.75)))
    assert(Pairs.progressOf(pairs, "b", "d") === ((4L, 4L, 1.0)))
    assert(Pairs.progressOf(pairs.limit(0), "a", "b") === ((0L, 0L, 0.0)))
  }
}

class SubstringRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("pairs whose text is missing from `pages` are retained, unmatched") {
    import spark.implicits._
    val cfg = GraftConfig(substringPass = true, minSubstringOverlap = 200)
    val block = "z" * 300
    val scored = Seq(
      ("a", "b", true, false, "simhash"),
      ("a", "c", true, false, "simhash") // c's text absent from pages
    ).toDF("url_a", "url_b", "from_ss", "matched", "via")
    val pages = Seq(("a", "x " + block), ("b", block + " y")).toDF("url", "text")

    val out = Pairs.substringPass(scored, pages, cfg)
    assert(out.count() === 2, "missing text must not drop the scored pair")
    val ab = out.filter(col("url_a") === "a" && col("url_b") === "b").head()
    assert(ab.getAs[Boolean]("matched"))
    assert(ab.getAs[String]("via") === "substring")
    val ac = out.filter(col("url_a") === "a" && col("url_b") === "c").head()
    assert(!ac.getAs[Boolean]("matched"))
    assert(ac.isNullAt(ac.fieldIndex("overlap_len")))
  }
}

class ActionSinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def clustersFixture = {
    import spark.implicits._
    Seq(
      ("u1", "c1", true, 100L, 10L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      ("u2", "c1", false, 90L, 9L, java.sql.Timestamp.valueOf("2026-01-02 00:00:00")),
      ("u3", "c1", false, 80L, 8L, java.sql.Timestamp.valueOf("2026-01-03 00:00:00")),
      ("u4", "c4", true, 50L, 5L, java.sql.Timestamp.valueOf("2026-01-04 00:00:00"))
    ).toDF("url", "cluster_id", "is_keeper", "size", "text_len", "warc_ts")
  }

  test("fromClusters: keep/drop with null target; ranks and reclaim bytes") {
    val a = Actions.fromClusters(clustersFixture).collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[String]("action"), Option(r.getAs[String]("target")),
          r.getAs[Long]("rank_in_cluster"), r.getAs[Long]("reclaim_bytes"))).toMap
    assert(a("u1") === ("keep", None, 1L, 0L))
    assert(a("u2") === ("drop", None, 2L, 90L))
    assert(a("u3") === ("drop", None, 3L, 80L))
    assert(a("u4") === ("keep", None, 1L, 0L))
  }

  test("S12 move sink: drops become move actions with a target path") {
    val m = Actions.moveDrops(clustersFixture, "/dups/")
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[String]("action"), Option(r.getAs[String]("target")))).toMap
    assert(m("u1") === ("keep", None))
    assert(m("u2") === ("move", Some("/dups/u2")))
    assert(m("u3") === ("move", Some("/dups/u3")))
  }

  test("S13 swap sink: each pair yields two swap rows with exchanged targets") {
    import spark.implicits._
    val pairs = Seq(("a", "b")).toDF("url_a", "url_b")
    val s = Actions.swapPairs(pairs).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("action"), r.getAs[String]("target")))
      .toSet
    assert(s === Set(("a", "swap", "b"), ("b", "swap", "a")))
  }
}

class RootValidationSpec extends AnyFunSuite {
  private val conf = new org.apache.hadoop.conf.Configuration()

  test("S4: missing roots are reported and skipped, existing ones kept") {
    val dir = Files.createTempDirectory("graft-root").toString
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val ok = graft.Main.validRoots(s"$dir;/definitely/not/here,$dir", conf, logged += _)
    assert(ok === Seq(dir, dir))
    assert(logged.size === 1)
    assert(logged.head.contains("/definitely/not/here"))
  }

  test("S4: a root whose scheme has no instantiable filesystem is KEPT " +
      "(the scan surfaces the real error, not a fake 'not found')") {
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val ok = graft.Main.validRoots(
      "nosuchscheme://bucket/prefix", conf, logged += _)
    assert(ok === Seq("nosuchscheme://bucket/prefix"))
    assert(logged.isEmpty)
  }

  test("CLI parse: a boolean flag never swallows the following command") {
    // the old parser read '--substring-pass bench' as substring-pass=bench
    // with NO command, silently running the default dedup job instead
    val m = graft.Main.parseArgs(Array("--substring-pass", "bench"))
    assert(m.get("command") === Some("bench"))
    assert(m.get("substring-pass") === Some("true"))
    val m2 = graft.Main.parseArgs(
      Array("dedup", "--exact-verify", "--langs", "en,de", "--threshold", "80"))
    assert(m2("command") === "dedup" && m2("exact-verify") === "true")
    assert(m2("langs") === "en,de" && m2("threshold") === "80")
  }
}
