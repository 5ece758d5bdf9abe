package graft.spark

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** One signature row — the engine's persisted fingerprint record (the analog
  * of the reference's SQLite cache row, db.cpp:38-47, plus the in-memory
  * Video fields that matching needs, video.h:13-66).
  *
  * `simhash_head`/`simhash_tail` are nullable (None) where the reference used
  * the in-band 0 sentinel (video.cpp:210-211); `reject_reason` is set when
  * the row must not participate in matching (the analog of
  * `_rejectedVideos` routing, mainwindow.cpp:307-315).
  */
final case class SignatureRow(
    url: String,
    content_id: String,
    part_id: Int,
    warc_ts: Timestamp,
    lang: String,
    text_len: Long,
    size: Long,
    text_md5: String,
    simhash_head: Option[Long],
    simhash_tail: Option[Long],
    minhash: Array[Long],
    mh_bands_head: Array[Long],
    mh_bands_tail: Array[Long],
    mh_rescue_head: Array[Long],
    mh_rescue_tail: Array[Long],
    shingles_head: Array[Long],
    shingles_tail: Array[Long],
    ss_keys: Array[Long],
    extract_ok: Boolean,
    config_fp: String,
    reject_reason: Option[String]
)

/** pages -> signatures: the per-row fingerprint stage (the Spark rendering of
  * `Video::run`, video.cpp:17-45 — a single narrow map, no shuffle, no
  * per-row I/O; SURVEY §3.2).
  */
object Fingerprints {

  /** Frames persisted internally by [[urlDedup]] (the slim (url, warc_ts)
    * key aggregate). Same ownership contract as Candidates.persistedFrames:
    * the pipeline releases them via [[cleanupCaches]] once its results are
    * lineage-truncated; until then they back every dedup decision branch.
    * Re-materialization after release is correct (just recomputes). */
  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  def cleanupCaches(): Unit = {
    var df = persistedFrames.poll()
    while (df != null) { df.unpersist(false); df = persistedFrames.poll() }
  }

  /** content identity = md5(url + "_" + epochMillis(warc_ts)) — the analog of
    * the reference's md5(filename + "_" + mtime) cache key (db.cpp:22-30):
    * url-stable, content-version-sensitive. */
  def contentId(url: String, ts: Timestamp): String =
    md5hex(url + "_" + ts.getTime.toString)

  /** [[contentId]] as a Catalyst expression — the ONE column-level
    * definition (fromPages and Resume's anti-join both use it; a drift
    * between copies would silently invalidate the store's resume). */
  def contentIdCol: org.apache.spark.sql.Column =
    md5(to_binary(
      concat(col("url"), lit("_"), unix_millis(col("warc_ts")).cast("string")),
      lit("utf-8")))

  // the one md5hex definition lives with the expression kernel
  private def md5hex(s: String): String =
    graft.functions.FingerprintKernel.md5hex(s)

  /** Compute one signature row. Pure; used by both the Spark map and tests. */
  def signatureOf(url: String, ts: Timestamp, html: Array[Byte], text: String,
                  lang: String, cfg: GraftConfig, mh: MinHasher): SignatureRow = {
    val extracted = Extract.text(html)
    val extractOk = extracted == (if (text == null) "" else text)
    val sig = DocSignatures.of(extracted, cfg, mh)
    val reject: Option[String] =
      if (extracted.isEmpty) Some("empty_text") // F2/F3 validity (video.cpp:19-35)
      else if (html != null && extracted.length > html.length)
        Some("extract_anomaly") // F5: output larger than input => corrupt (video.cpp:157-158)
      else if (sig.isRejected) Some("low_entropy") // F4 monochrome (video.cpp:40-42)
      else None
    // slot-wise minhash band keys via the ONE kernel definition
    // (graft.functions.FingerprintKernel — the expression path's): the typed
    // path is the expression path's parity oracle, and both commit rows
    // under the same config_fp, so the banding/rescue byte-packing must be
    // bit-identical by CONSTRUCTION, not by two copies kept in sync. Banding
    // is SLOT-WISE (head vs head, tail vs tail) because matching is
    // slot-wise (comparison.cpp:133-136); 64-bit hashed band keys keep
    // join-key entropy high — see Candidates. Rescue keys: dense r=2 bands
    // for short slots only (noisy SimHash there; r=2 x 64 bands catch slot
    // Jaccard >~0.25 w.p. >=0.98) — they collide only for similar docs.
    val kern = new graft.functions.FingerprintKernel(cfg)
    def bandKeys(sigArr: Array[Long]): Array[Long] = kern.bandKeys(sigArr)
    def rescueKeys(sigArr: Array[Long], nShingles: Int): Array[Long] =
      kern.rescueKeys(sigArr, nShingles)
    val mhHead = sig.mhHead // precomputed over the stored arrays (DocSignatures.of)
    val mhTail = sig.mhTail
    SignatureRow(
      url = url,
      content_id = contentId(url, ts),
      // seed fixed at 42 to match the builtin xxhash64 used on the
      // expression path (partitioner only — independent of cfg.seed)
      part_id = ((XXH64.hashString(url, 42L) % cfg.storeParts).toInt + cfg.storeParts) % cfg.storeParts,
      warc_ts = ts,
      lang = lang,
      text_len = sig.textLen,
      size = sig.sizeBytes,
      text_md5 = md5hex(extracted),
      simhash_head = if (sig.simhashHead == 0L) None else Some(sig.simhashHead),
      simhash_tail = if (sig.simhashTail == 0L) None else Some(sig.simhashTail),
      minhash = if (sig.minhash == null) Array.emptyLongArray else sig.minhash,
      mh_bands_head = bandKeys(mhHead),
      mh_bands_tail = bandKeys(mhTail),
      mh_rescue_head = rescueKeys(mhHead, sig.shinglesHead.length),
      mh_rescue_tail = rescueKeys(mhTail, sig.shinglesTail.length),
      shingles_head = sig.shinglesHead,
      shingles_tail = sig.shinglesTail,
      ss_keys = sig.ssKeys,
      extract_ok = extractOk,
      config_fp = cfg.configFp,
      reject_reason = reject
    )
  }

  /** Rule 1 of the url dedup — re-crawl supersedence: per EXACT url, the
    * newest warc_ts wins (a later capture of the same page replaces the
    * earlier one). Identical (url, warc_ts) duplicate crawl records (WARC
    * revisit records, a retried ingest unioned twice) collapse to ONE row,
    * elected deterministically by content hash — a naive ranking window
    * over raw rows would put the surviving copy's own (url, warc_ts) key in
    * the loser set and the anti-join would drop the document entirely.
    *
    * This is the dedup the INCREMENTAL commit path applies ([[Resume]]):
    * rule 2 (the case rule) must NOT run before a commit, because a later
    * batch can add an older case-variant that changes the cross-increment
    * case election — rule-2 losers are committed and the live view elects
    * among all of them (batch-split invariance).
    *
    * Shuffle discipline: ranking runs over a SLIM aggregate of (url,
    * warc_ts) keys; only the rare losers flow into an anti-join against the
    * unshuffled pages, and only rows of the (rarer still) duplicated keys
    * pass through a payload collapse aggregate. The whole plan is LAZY
    * (no driver action at construction — pairStage's no-job contract): when
    * no key is duplicated, dupKeys resolves empty at execution and the
    * collapse branch is a no-op.
    *
    * Ingest contract: copies that share (url, warc_ts) but differ in content
    * are ill-formed input (one crawl key names one capture). They still
    * collapse deterministically — the election hashes EVERY non-key column,
    * so any column difference (lang, text, html) yields a total order and
    * the same winner under every partitioning; only byte-identical rows tie,
    * and those are interchangeable. Across batches, however, the first
    * committed copy wins (content_id keys on (url, warc_ts) only), so the
    * surviving CONTENT of an ill-formed same-key pair split across batches
    * is arrival-ordered — the one dedup decision that cannot be batch-split
    * invariant without re-reading committed payloads. */
  def dropRecrawlDuplicateUrls(pages: DataFrame): DataFrame =
    urlDedup(pages, caseRule = false, eagerKeys = false)

  /** [[dropRecrawlDuplicateUrls]] with the shared key aggregate materialized
    * NOW (one job): for eager call sites (Resume's commit path) where the
    * first downstream action fans out into concurrent AQE stage jobs that
    * would otherwise race the unpopulated keys cache. The public entry
    * points stay lazy (plan-construction contract, Round5ReviewSpec). */
  private[graft] def dropRecrawlDuplicateUrlsEager(pages: DataFrame): DataFrame =
    urlDedup(pages, caseRule = false, eagerKeys = true)

  /** Shared body of the two url-dedup entry points. Plan discipline (the
    * round-5 perf regression root cause, see BENCH/BASELINE.md): EVERY
    * election decision — recency rank, case rank, duplicate-key detection —
    * is computed once in a slim (url, warc_ts) key space; the full-payload
    * `pages` relation is consumed by exactly two single-pass branches (the
    * chained anti-joins and the rare-key collapse aggregate), never by a
    * payload window and never re-derived per consumer. A previous cut let
    * rule 2 re-consume the rule-1 output twice, tripling full-payload cache
    * reads of a ~10 KB/row relation on a bandwidth-bound box. */
  private def urlDedup(pages: DataFrame, caseRule: Boolean,
                       eagerKeys: Boolean): DataFrame = {
    val dataCols = pages.columns.toSeq.filter(c => c != "url" && c != "warc_ts")
    // The slim key aggregate feeds EVERY decision branch (recrawl ranking,
    // case ranking, duplicate-key detection), and each branch is referenced
    // from both payload passes below — as a logical TREE that is ~6 copies
    // of this subtree, and the broadcast builds materialize them as ~6
    // concurrent jobs that each re-scan `pages` (measured: a 6-job ladder of
    // 256-task stages owning the sigs-build wall at 60k docs). Persist +
    // eager-materialize once; every branch then reads 60k slim cached rows.
    // Released by the pipeline via cleanupCaches (Candidates discipline).
    // eagerKeys=false keeps plan construction side-effect-free (the
    // Round5ReviewSpec contract): persist() alone already optimizes the
    // cached plan, which EVALUATES LocalRelation projections — so the lazy
    // entry points skip the persist too and keep the exact pre-round-6 plan.
    val keys0 = pages.groupBy(col("url"), col("warc_ts"))
      .agg(count(lit(1)).as("__copies"))
    val keys =
      if (!eagerKeys) keys0
      else {
        val k = keys0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persistedFrames.add(k)
        Pipeline.labeled(pages.sparkSession, "graft: url-dedup keys") { k.count() }
        k
      }
    val wUrl = Window.partitionBy(col("url")).orderBy(col("warc_ts").desc)
    val ranked = keys.withColumn("__rn", row_number().over(wUrl))
    val winners = ranked.filter(col("__rn") === 1)
    val recrawlLosers = ranked.filter(col("__rn") > 1).select("url", "warc_ts")
    // rule 2 runs among the per-url winner KEYS — after rule-1 collapse every
    // url holds exactly the (url, max warc_ts) key, so the slim winner set IS
    // the rule-1 output's key set and the case election never needs to touch
    // (or re-derive) the payload relation
    val losers0 =
      if (!caseRule) recrawlLosers
      else {
        val wCase = Window.partitionBy(lower(col("url")))
          .orderBy(col("warc_ts"), col("url"))
        val caseLosers = winners.withColumn("__rc", row_number().over(wCase))
          .filter(col("__rc") > 1).select("url", "warc_ts")
        recrawlLosers.union(caseLosers)
      }
    val dupKeys0 = winners.filter(col("__copies") > 1).select("url", "warc_ts")
    // eager mode also pins the two (tiny) decision outputs in ONE job: each
    // is broadcast from BOTH payload branches, and the broadcast builds
    // re-ran the ranking windows per referencing copy otherwise
    val (losers, dupKeys) =
      if (!eagerKeys) (losers0, dupKeys0)
      else {
        val pinned = losers0.withColumn("__t", lit(0))
          .unionByName(dupKeys0.withColumn("__t", lit(1)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persistedFrames.add(pinned)
        Pipeline.labeled(pages.sparkSession, "graft: url-dedup decisions") { pinned.count() }
        (pinned.filter(col("__t") === 0).select("url", "warc_ts"),
          pinned.filter(col("__t") === 1).select("url", "warc_ts"))
      }

    // payload pass 1: both anti-joins chain inside one scan stage. The
    // broadcast hints are LOAD-BEARING (round-6 measurement): this dedup is
    // the child of the persisted signatures frame, and AQE does not re-plan
    // join strategies inside a cached-plan build — without the hints the
    // planner kept SortMergeJoin and the full ~10 KB/row payload relation
    // was exchanged + sorted per join branch (5 payload exchanges, 7
    // concurrent 256-task stages, ~60% of a 60k-doc pipeline's wall). Loser
    // and dup-key sets are keys of re-crawled/case-variant urls — rare by
    // the ingest contract; a pathological batch fails loudly at the 8 GB
    // broadcast cap rather than silently reintroducing the payload shuffle.
    val clean = pages.join(broadcast(losers), Seq("url", "warc_ts"), "left_anti")
      .join(broadcast(dupKeys), Seq("url", "warc_ts"), "left_anti")
    // payload pass 2 (empty in well-formed input): collapse identical-key
    // copies to ONE row via an aggregate — the winner is the lexicographic
    // minimum over (xxhash64 of every non-key column, then the columns
    // themselves), so the survivor is a pure function of the data under any
    // partitioning, hash-collision ties included; byte-identical copies
    // compare equal and min() keeps exactly one
    val packedFields = {
      val fs = dataCols.zipWithIndex.map { case (c, i) => xxhash64(col(c)).as(s"__h$i") } ++
        dataCols.map(c => col(c).as(c))
      if (fs.isEmpty) Seq(lit(0L).as("__h0")) else fs
    }
    val packed = struct(packedFields: _*)
    val collapsed = pages.join(broadcast(losers), Seq("url", "warc_ts"), "left_anti")
      .join(broadcast(dupKeys), Seq("url", "warc_ts"), "left_semi")
      .groupBy(col("url"), col("warc_ts"))
      .agg(min(packed).as("__w"))
      .select(col("url") +: col("warc_ts") +:
        dataCols.map(c => col("__w").getField(c).as(c)): _*)
    clean.unionByName(collapsed.select(pages.columns.map(col): _*))
  }

  /** Full url recency/case dedup — rule 1 ([[dropRecrawlDuplicateUrls]])
    * then rule 2, in the SAME order as the cross-increment live view in
    * [[Resume.incrementalFingerprints]] so the surviving row per url is
    * independent of how a crawl is split into batches (batch-split
    * invariance, pinned in KernelHardeningSpec):
    *
    *  2. the reference's case-insensitive distinct — the O(n^2) scan over
    *     `_everyVideo` (mainwindow.cpp:217-225): among the per-url winners,
    *     keep the earliest row per lower(url) (discovery order ->
    *     warc_ts, url). */
  def dropCaseDuplicateUrls(pages: DataFrame): DataFrame =
    urlDedup(pages, caseRule = true, eagerKeys = false)

  /** Eager-keys variant of [[dropCaseDuplicateUrls]] — see
    * [[dropRecrawlDuplicateUrlsEager]]; used by the pipeline fingerprint
    * stage, whose first downstream action fans out concurrently. */
  private[graft] def dropCaseDuplicateUrlsEager(pages: DataFrame): DataFrame =
    urlDedup(pages, caseRule = true, eagerKeys = true)

  /** The fingerprint stage — one narrow select over the native
    * [[graft.functions.PageFingerprint]] expression (whole-stage codegen, no
    * Encoder round-trip); identity/partition columns are built-in
    * expressions. Column set identical to [[SignatureRow]] (pinned by
    * FingerprintExprSpec against the typed path). */
  def fromPages(pages: DataFrame, cfg: GraftConfig): DataFrame =
    fromPagesPreDeduped(dropCaseDuplicateUrlsEager(pages), cfg)

  /** [[fromPages]] minus the case-dedup window, for callers whose input is
    * ALREADY deduped (Resume runs dropCaseDuplicateUrls before its cheap
    * anti-join — re-running the window inside the commit job would add a
    * redundant full-input shuffle). */
  private[graft] def fromPagesPreDeduped(pages: DataFrame, cfg: GraftConfig): DataFrame =
    pages
      .select(col("url"), col("warc_ts"), col("lang"),
        graft.functions.PageFingerprint(col("html"), col("text"), cfg).as("fp"))
      .select(
        col("url"),
        contentIdCol.as("content_id"),
        pmod(xxhash64(col("url")), lit(cfg.storeParts)).cast("int").as("part_id"),
        col("warc_ts"), col("lang"),
        col("fp.text_len"), col("fp.size"), col("fp.text_md5"),
        col("fp.simhash_head"), col("fp.simhash_tail"),
        col("fp.minhash"), col("fp.mh_bands_head"), col("fp.mh_bands_tail"),
        col("fp.mh_rescue_head"), col("fp.mh_rescue_tail"),
        col("fp.shingles_head"), col("fp.shingles_tail"), col("fp.ss_keys"),
        col("fp.extract_ok"),
        lit(cfg.configFp).as("config_fp"),
        col("fp.reject_reason"))

  /** Persist/store projection per mode: in default (fingerprint-only) mode
    * nothing downstream reads the shingle sketches or the substring sample
    * keys — shingles_head/tail feed only the exact-verify Jaccard join
    * (Pairs.verifyJoin) and ss_keys only the sampled-shingle band family
    * (Candidates.bands) — so dropping them from the persisted/committed rows
    * removes the dominant payload bytes (2x cap + sample longs per row) from
    * the cache and the store write path of a bandwidth-bound workload.
    * configFp carries a payload=full/pruned marker for exactly this schema
    * split, so a pruned store can never satisfy a resume that needs the
    * shingle columns, and every store holds a single schema. */
  def pruneForMode(sigs: DataFrame, cfg: GraftConfig): DataFrame =
    if (cfg.exactVerify || cfg.substringPass) sigs
    else sigs.drop("shingles_head", "shingles_tail", "ss_keys")

  /** The typed-map variant of the fingerprint stage — the parity oracle for
    * the expression path (and a fallback if an environment rejects the
    * custom expression). */
  def fromPagesTyped(pages: DataFrame, cfg: GraftConfig): Dataset[SignatureRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    dropCaseDuplicateUrls(pages)
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[(String, Timestamp, Array[Byte], String, String)]
      .mapPartitions { it =>
        val mh = new MinHasher(cfg.numPerm, cfg.seed)
        it.map { case (url, ts, html, text, lang) =>
          signatureOf(url, ts, html, text, lang, cfg, mh)
        }
      }
  }
}
