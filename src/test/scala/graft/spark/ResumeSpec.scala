package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.store.IcebergShaped

/** Resume / idempotence gates (SURVEY §5.5): half-then-full == one-shot;
  * unchanged rerun does zero fingerprint work; config change invalidates. */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  private def tmpStore(): IcebergShaped.Table =
    IcebergShaped.table(Files.createTempDirectory("graft-store").toString)

  test("half-then-full equals one-shot; second half skips first half's work") {
    val store = tmpStore()
    val half = CorpusSpark.pages(spark, 400L, 4, cfg.seed)
    val full = CorpusSpark.pages(spark, 800L, 4, cfg.seed)

    // the commit path applies rule 1 only (per-url newest); case-variant
    // twins ARE fingerprinted and committed — the live view elects among
    // them across increments (batch-split invariance) — so the counts cover
    // every distinct url, twins included
    val r1 = Resume.incrementalFingerprints(half, store, cfg)
    assert(r1.newlyFingerprinted === 400L)
    assert(r1.skipped === 0L)

    val r2 = Resume.incrementalFingerprints(full, store, cfg)
    assert(r2.skipped === r1.newlyFingerprinted)
    assert(r2.newlyFingerprinted + r2.skipped === 800L)

    // equivalence with one-shot fingerprints
    val oneShot = Fingerprints.fromPages(full, cfg).toDF()
    val a = r2.signatures.select("url", "content_id", "simhash_head", "text_md5")
      .orderBy("url").collect().toSeq
    val b = oneShot.select("url", "content_id", "simhash_head", "text_md5")
      .orderBy("url").collect().toSeq
    assert(a === b)
  }

  test("unchanged rerun fingerprints nothing (cache hit across the board)") {
    val store = tmpStore()
    val pages = CorpusSpark.pages(spark, 300L, 4, cfg.seed)
    Resume.incrementalFingerprints(pages, store, cfg)
    val again = Resume.incrementalFingerprints(pages, store, cfg)
    assert(again.newlyFingerprinted === 0L)
    assert(again.skipped > 0L)
  }

  test("config change invalidates: full recompute under the new fingerprint") {
    val store = tmpStore()
    val pages = CorpusSpark.pages(spark, 200L, 4, cfg.seed)
    Resume.incrementalFingerprints(pages, store, cfg)
    val cfg2 = cfg.copy(k = 5)
    val r = Resume.incrementalFingerprints(pages, store, cfg2)
    assert(r.skipped === 0L)
    assert(r.newlyFingerprinted > 0L)
    assert(r.signatures.filter(col("config_fp") =!= cfg2.configFp).count() === 0)
  }

  test("store: snapshot chain, lineage, atomic pointer, rollback") {
    val store = tmpStore()
    val pages = CorpusSpark.pages(spark, 200L, 4, cfg.seed)
    Resume.incrementalFingerprints(pages, store, cfg)
    val v0 = store.currentVersion.get
    val snap0 = store.currentSnapshot.get
    assert(snap0.operation === "overwrite")
    assert(snap0.totalRows === snap0.addedRows)

    val more = CorpusSpark.pages(spark, 400L, 4, cfg.seed)
    Resume.incrementalFingerprints(more, store, cfg)
    val snap1 = store.currentSnapshot.get
    assert(snap1.parentId.contains(snap0.snapshotId))
    assert(snap1.totalRows === snap0.totalRows + snap1.addedRows)

    // per-partition lineage rows sum to the total
    val lineageRows = store.lineage(spark)
      .agg(sum("rows")).head().getLong(0)
    assert(lineageRows === snap1.totalRows)

    // rollback is metadata-only time travel
    store.rollback(v0)
    assert(store.currentSnapshot.get.snapshotId === snap0.snapshotId)
    assert(store.read(spark).count() === snap0.totalRows)
  }

  test("expression content_id matches the Scala contentId") {
    import spark.implicits._
    val pages = CorpusSpark.pages(spark, 50L, 2, cfg.seed)
    val viaExpr = pages.withColumn("cid", Resume.contentIdCol)
      .select("url", "cid").as[(String, String)].collect().toMap
    val viaScala = pages.select("url", "warc_ts")
      .as[(String, java.sql.Timestamp)].collect()
      .map { case (u, ts) => u -> Fingerprints.contentId(u, ts) }.toMap
    assert(viaExpr === viaScala)
  }

  test("mode switch on a shared store: pruned rows never satisfy a " +
    "full-payload resume, and the mixed-schema store stays readable") {
    val store = tmpStore()
    val pages = CorpusSpark.pages(spark, 200L, 4, cfg.seed)
    // default mode commits PRUNED rows (no shingles_head/tail/ss_keys)
    Resume.incrementalFingerprints(pages, store, cfg)
    assert(!store.read(spark).columns.contains("shingles_head"))
    // exact mode must NOT reuse them (payload marker splits the config_fp):
    // a reuse here would hand Pairs.verifyJoin rows with no shingle columns
    val cfgX = cfg.copy(exactVerify = true)
    val r = Resume.incrementalFingerprints(pages, store, cfgX)
    assert(r.skipped === 0L)
    assert(r.newlyFingerprinted > 0L)
    // the store now holds snapshots of BOTH schemas; the live read must
    // still work and the exact-config rows must carry their shingle payload
    val live = r.signatures.filter(col("config_fp") === cfgX.configFp)
    assert(live.columns.contains("shingles_head"))
    assert(live.filter(col("reject_reason").isNull)
      .filter(col("shingles_head").isNull).count() === 0L)
  }

  test("case-variant twin arriving in a LATER increment does not stay " +
    "live alongside its earlier parent (one-shot F1 rule across batches)") {
    import spark.implicits._
    import java.sql.Timestamp
    def batch(url: String, ts: String) = Seq(
      (url, Timestamp.valueOf(ts),
       "<p>same text body for both case variants of this page</p>".getBytes("UTF-8"),
       "same text body for both case variants of this page", "en")
    ).toDF("url", "warc_ts", "html", "text", "lang")
    val store = tmpStore()
    Resume.incrementalFingerprints(batch("https://ex.org/Page", "2026-01-01 00:00:00"), store, cfg)
    val r2 = Resume.incrementalFingerprints(batch("HTTPS://EX.ORG/PAGE", "2026-01-02 00:00:00"), store, cfg)
    val liveUrls = r2.signatures.select("url").collect().map(_.getString(0)).toSeq
    assert(liveUrls === Seq("https://ex.org/Page"),
      "the earlier parent wins per lower(url); the late twin must not be live")
  }

  test("live view honors langFilter: store rows of excluded languages are " +
    "not clustered by an incremental run") {
    import spark.implicits._
    import java.sql.Timestamp
    val rows = Seq(
      ("https://l/en", Timestamp.valueOf("2026-01-01 00:00:00"), "english text here", "en"),
      ("https://l/de", Timestamp.valueOf("2026-01-01 00:00:00"), "deutscher text hier", "de"))
      .map { case (u, t, x, l) => (u, t, ("<p>" + x + "</p>").getBytes("UTF-8"), x, l) }
      .toDF("url", "warc_ts", "html", "text", "lang")
    val store = tmpStore()
    Resume.incrementalFingerprints(rows, store, cfg) // unfiltered commit
    val cfgDe = cfg.copy(langFilter = Some(Set("de")))
    val r = Resume.incrementalFingerprints(rows.filter(col("lang") === "de"), store, cfgDe)
    val live = r.signatures.select("url").collect().map(_.getString(0)).toSeq
    assert(live === Seq("https://l/de"), "en store row must not be live under --langs de")
  }

}
