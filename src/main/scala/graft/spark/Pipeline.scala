package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.GraftConfig

/** End-to-end dedup pipeline — the Spark rendering of the reference's
  * find-duplicates flow (mainwindow.cpp:133-204; SURVEY §3.1). One lazy DAG:
  *
  *   pages -> [case-url dedup] -> fingerprint (narrow map)
  *         -> exact-dup pre-group (identical text collapses to one
  *            representative BEFORE LSH — on web corpora exact dups dominate,
  *            and this both removes the worst band-key skew and shrinks the
  *            candidate join quadratically)
  *         -> LSH band self-join (salted heavy keys) -> pair scoring
  *         -> [optional exact verify / substring pass]
  *         -> union-find -> member expansion -> keeper election
  *
  * Shuffle boundaries: case-dedup window; exact-group agg; band join;
  * pair dedup; union-find rounds; keeper window. Everything else is narrow.
  */
object Pipeline {

  final case class Result(
      signatures: DataFrame, // all fingerprint rows (incl. rejected)
      rejects: DataFrame, // (url, reason) — the _rejectedVideos analog
      pairs: DataFrame, // representative-level scored pairs w/ raw measures
      clusters: DataFrame, // (url, cluster_id, is_keeper, size, text_len, warc_ts)
      metrics: DataFrame // (metric, value) — the status-report analog (S14)
  )

  def run(pages: DataFrame, cfg: GraftConfig = GraftConfig(),
          persistLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK): Result = {
    val spark = pages.sparkSession
    import spark.implicits._

    var tMark = System.nanoTime()
    def phaseMs(): Long = {
      val now = System.nanoTime()
      val ms = (now - tMark) / 1000000L
      tMark = now
      ms
    }

    // S2 analog (extension filter): lang predicate on the scan — pushed to
    // the source by Catalyst (row-group skip on Parquet)
    val scanned = cfg.langFilter match {
      case Some(ls) => pages.filter(col("lang").isin(ls.toSeq: _*))
      case None => pages
    }
    val sigs = Fingerprints.fromPages(scanned, cfg).toDF().persist(persistLevel)
    val nSigs = sigs.count() // materialize: everything upstream is the fingerprint phase
    val tFingerprint = phaseMs()
    downstream(sigs, nSigs, tFingerprint, pages, cfg, persistLevel)
  }

  /** Incremental entry: fingerprints come from / go to the Iceberg-shaped
    * store (anti-join resume, Resume.scala); clustering always runs over the
    * full live signature set — new rows can join existing clusters. */
  def runIncremental(pages: DataFrame, store: graft.store.IcebergShaped.Table,
                     cfg: GraftConfig = GraftConfig(),
                     persistLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (Result, Resume.IncrementalResult) = {
    val t0 = System.nanoTime()
    val inc = Resume.incrementalFingerprints(pages, store, cfg)
    val sigs = inc.signatures.persist(persistLevel)
    val nSigs = sigs.count()
    val tFingerprint = (System.nanoTime() - t0) / 1000000L
    (downstream(sigs, nSigs, tFingerprint, pages, cfg, persistLevel), inc)
  }

  private def downstream(sigs: DataFrame, nSigs: Long, tFingerprint: Long,
                         pages: DataFrame, cfg: GraftConfig,
                         persistLevel: StorageLevel): Result = {
    val spark = sigs.sparkSession
    import spark.implicits._

    var tMark = System.nanoTime()
    def phaseMs(): Long = {
      val now = System.nanoTime()
      val ms = (now - tMark) / 1000000L
      tMark = now
      ms
    }

    val rejects = sigs.filter(col("reject_reason").isNotNull)
      .select(col("url"), col("reject_reason").as("reason"))
    val valid = sigs.filter(col("reject_reason").isNull)

    // exact-duplicate pre-grouping: one representative (min url) per distinct text
    val groups = valid.groupBy("text_md5").agg(min("url").as("rep_url"))
    val members = valid.select(col("url"), col("text_md5"))
      .join(groups, "text_md5")
      .select(col("url"), col("rep_url"))
      .persist(persistLevel)
    val reps = valid.join(
      groups.select(col("rep_url").as("url")), Seq("url"), "left_semi")
      .persist(persistLevel)
    val repCount = reps.count()
    val tExactGroup = phaseMs()

    // candidates + scoring (representative level)
    val cand = Candidates.candidatePairs(reps, cfg)
    val scoredBase = Pairs.score(cand, cfg)
    val scoredVerified =
      if (cfg.exactVerify) Pairs.exactVerify(scoredBase, reps, cfg) else scoredBase
    val scored =
      if (cfg.substringPass) Pairs.substringPass(scoredVerified, pages, cfg)
      else scoredVerified
    val pairs = scored.persist(persistLevel)
    val pairAgg = pairs.agg(
      count(lit(1)),
      sum(when(col("matched"), 1L).otherwise(0L))).head()
    val tCandidates = phaseMs()
    val matched = pairs.filter(col("matched"))

    // clusters at rep level, expanded to members, keepers elected
    val repClusters = Clusters.assign(reps.select("url"), matched)
    val memberClusters = members
      .join(repClusters.withColumnRenamed("url", "rep_url"), "rep_url")
      .select(col("url"), col("cluster_id"))
    val clustered = memberClusters
      .join(valid.select(col("url"), col("size"), col("text_len"), col("warc_ts")), "url")
    val clusters = Clusters.electKeepers(clustered).persist(persistLevel)

    val cluAgg = clusters.groupBy("cluster_id").count()
      .agg(
        sum(when(col("count") > 1, 1L).otherwise(0L)),
        sum(when(col("count") > 1, col("count")).otherwise(0L))).head()
    val tClustering = phaseMs()

    val sigAgg = sigs.agg(
      sum(when(col("reject_reason").isNotNull, 1L).otherwise(0L)),
      sum(when(!col("extract_ok"), 1L).otherwise(0L))).head()

    val metrics = Seq(
      ("signatures", nSigs),
      ("rejected", sigAgg.getLong(0)),
      ("extract_mismatches", sigAgg.getLong(1)),
      ("exact_groups", repCount),
      ("candidate_pairs", pairAgg.getLong(0)),
      ("matched_pairs", pairAgg.getLong(1)),
      ("dup_clusters", cluAgg.getLong(0)),
      ("docs_in_dup_clusters", cluAgg.getLong(1)),
      ("phase_fingerprint_ms", tFingerprint),
      ("phase_exact_group_ms", tExactGroup),
      ("phase_candidates_ms", tCandidates),
      ("phase_clustering_ms", tClustering)
    ).toDF("metric", "value")

    Result(sigs, rejects, pairs, clusters, metrics)
  }
}
