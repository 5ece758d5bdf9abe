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

  /** content_id as a Catalyst expression — MUST match
    * Fingerprints.contentId (tested). */
  def contentIdCol: org.apache.spark.sql.Column =
    md5(to_binary(
      concat(col("url"), lit("_"), unix_millis(col("warc_ts")).cast("string")),
      lit("utf-8")))

  final case class IncrementalResult(
      signatures: DataFrame, // full live table after the commit
      newlyFingerprinted: Long, // rows actually computed this run
      skipped: Long // rows served from the store
  )

  /** Fingerprint pages incrementally against `store`; append only new rows.
    * The anti-join runs on (content_id, config_fp) BEFORE the expensive
    * fingerprint map, so cached rows cost one hash + one join probe. */
  def incrementalFingerprints(
      pages: DataFrame,
      store: IcebergShaped.Table,
      cfg: GraftConfig): IncrementalResult = {
    val spark = pages.sparkSession

    val withId = Fingerprints.dropCaseDuplicateUrls(pages)
      .withColumn("content_id", contentIdCol)

    val (todo, skipped) =
      if (store.isEmpty) (withId, 0L)
      else {
        val existing = store.read(spark)
          .filter(col("config_fp") === cfg.configFp)
          .select(col("content_id"))
        val fresh = withId.join(existing, Seq("content_id"), "left_anti")
        val freshCount = fresh.count()
        (fresh, withId.count() - freshCount)
      }

    val newSigs = Fingerprints.fromPages(todo.drop("content_id"), cfg).toDF()
    val newCount =
      if (store.isEmpty && skipped == 0L) { // first run: commit everything
        store.commit(newSigs, cfg.configFp, "overwrite")
        store.snapshotAt(store.currentVersion.get).addedRows
      } else if (!todo.isEmpty) {
        store.commit(newSigs, cfg.configFp, "append").addedRows
      } else 0L

    // stale-config rows remain as history in older snapshots but are not live
    // for matching: the live view is config-fingerprint-filtered
    val live = store.read(spark).filter(col("config_fp") === cfg.configFp)
    IncrementalResult(live, newCount, skipped)
  }
}
