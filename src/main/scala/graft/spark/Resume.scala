package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftConfig
import graft.store.IcebergShaped

/** Checkpointed resume: fingerprint only rows not already in the signatures
  * store — the Spark rendering of the reference's read-before-compute cache
  * protocol (video.cpp:26-30, 133-137: probe SQLite by id, skip work on hit;
  * ">10x faster loading once cached", readme.md:37).
  *
  * Identity is content-versioned: content_id = md5(url + "_" + epochMillis)
  * (db.cpp:22-30 analog) — moving/refetching a page with a new warc_ts
  * invalidates, a byte-identical re-crawl row does not. Signatures computed
  * under a different GraftConfig are ignored AND superseded (config_fp
  * mismatch => recompute; db.cpp:46-47 version-stamp analog).
  */
object Resume {

  /** content_id as a Catalyst expression — the single definition lives in
    * [[Fingerprints.contentIdCol]] (matching the typed contentId, tested). */
  def contentIdCol: org.apache.spark.sql.Column = Fingerprints.contentIdCol

  final case class IncrementalResult(
      signatures: DataFrame, // full live table after the commit
      newlyFingerprinted: Long, // rows actually computed this run
      skipped: Long // rows served from the store
  )

  /** Fingerprint pages incrementally against `store`; append only new rows.
    * The anti-join runs on (content_id, config_fp) BEFORE the expensive
    * fingerprint map, so cached rows cost one hash + one join probe.
    * Driver-job budget: one count of the (cheap, pre-fingerprint) input, one
    * emptiness probe on re-runs, and the commit itself — `skipped` is derived
    * from the commit's own materialized row count, not a second count job. */
  def incrementalFingerprints(
      pages: DataFrame,
      store: IcebergShaped.Table,
      cfg: GraftConfig): IncrementalResult = {
    val spark = pages.sparkSession

    // Rule 1 ONLY before the commit (per-url newest + duplicate-record
    // collapse): case-variant (rule 2) losers MUST be fingerprinted and
    // committed, because a later batch can add an OLDER variant that
    // changes the cross-increment case election — dropping them here made
    // the surviving variant depend on batch boundaries (round-5 review).
    // The live view below applies the case rule across everything committed.
    val withId = Fingerprints.dropRecrawlDuplicateUrlsEager(pages)
      .withColumn("content_id", contentIdCol)
    val total = Pipeline.labeled(spark, "graft: incr input count") { withId.count() }
    val firstRun = store.isEmpty

    val todo =
      if (firstRun) withId
      else {
        val existing = store.read(spark)
          .filter(col("config_fp") === cfg.configFp)
          .select(col("content_id"))
        withId.join(existing, Seq("content_id"), "left_anti")
      }

    // default-mode commits drop the dead-weight shingle/sample arrays —
    // config_fp keys the store, so each config's snapshots stay schema-stable.
    // PreDeduped entry: withId already ran the rule-1 recrawl dedup (and the
    // case rule must NOT run pre-commit); the plain fromPages would apply
    // the full two-rule window inside the commit job.
    val newSigs = Fingerprints.pruneForMode(
      Fingerprints.fromPagesPreDeduped(todo.drop("content_id"), cfg).toDF(), cfg)
    val newCount = Pipeline.labeled(spark, "graft: incr sig commit") {
      if (firstRun) store.commit(newSigs, cfg.configFp, "overwrite").addedRows
      else if (!todo.isEmpty) store.commit(newSigs, cfg.configFp, "append").addedRows
      else 0L
    }

    // stale-config rows remain as history in older snapshots but are not live
    // for matching: the live view is config-fingerprint-filtered AND deduped
    // per url (newest warc_ts wins) — a re-crawled url gets a fresh
    // content_id and is appended, so without the dedup the old capture would
    // stay live alongside it and clustering would elect keepers among
    // phantom duplicates of the same url. The case rule (F1: earliest
    // warc_ts, then url, per lower(url)) runs HERE and ONLY here for the
    // incremental path — across every committed variant, whatever batch it
    // arrived in. Running it per batch before the commit would permanently
    // discard a variant a later batch's OLDER twin needs to lose against,
    // making the elected variant batch-boundary-dependent.
    // The live view also honors cfg.langFilter (S2): the scan filter applies
    // to the batch before fingerprinting, and rows committed by an
    // unfiltered earlier config are config-compatible (langFilter is not
    // fingerprint-affecting), so the store side must filter too or an
    // incremental run clusters languages a one-shot run excludes.
    val live =
      if (store.isEmpty) newSigs.limit(0)
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("url"))
          .orderBy(col("warc_ts").desc, col("content_id").desc)
        val wCase = org.apache.spark.sql.expressions.Window
          .partitionBy(lower(col("url")))
          .orderBy(col("warc_ts"), col("url"))
        val base = store.read(spark)
          .filter(col("config_fp") === cfg.configFp)
        val filtered = cfg.langFilter match {
          case Some(ls) => base.filter(col("lang").isin(ls.toSeq: _*))
          case None => base
        }
        filtered
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
          .withColumn("_rc", row_number().over(wCase))
          .filter(col("_rc") === 1).drop("_rc")
      }
    IncrementalResult(live, newCount, skipped = total - newCount)
  }
}
