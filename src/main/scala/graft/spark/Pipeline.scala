package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Driver-job budget (scaling-efficiency relevant — every driver job is a
  * fixed-latency serialization point that does not shrink with more cores):
  * by default ALL run metrics are computed in ONE union-aggregate job over
  * the persisted intermediates; the per-phase wall-time breakdown (which
  * needs a materializing action per phase) is behind `profile = true`.
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
          persistLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
          profile: Boolean = false): Result = {
    val scanned = scan(pages, cfg)
    if (profile) {
      var t0 = System.nanoTime()
      val sigs = Fingerprints.pruneForMode(
        Fingerprints.fromPages(scanned, cfg).toDF(), cfg).persist(persistLevel)
      val nSigs = sigs.count() // materialize: everything upstream is the fingerprint phase
      val tFingerprint = (System.nanoTime() - t0) / 1000000L
      downstreamProfiled(sigs, nSigs, tFingerprint, pages, cfg, persistLevel)
    } else {
      // Partitioning diet for the persisted signature frame: callers hand in
      // page sources at straggler-smoothing granularity (the bench uses
      // 8 x cores for the skewed synthesis map), but every downstream
      // consumer of the CACHED signatures re-pays that task count per scan —
      // at 60k docs that is 256 tasks of ~230 rows each, several times, and
      // cached scans get no AQE coalescing. Cap at 2 x defaultParallelism
      // (scale-adaptive: derived from the session, never a constant), only
      // ever shrinking. coalesce is narrow — the fingerprint map fuses into
      // the coalesced tasks, each reading several cached page partitions.
      val spark1 = pages.sparkSession
      val targetParts = 2 * spark1.sparkContext.defaultParallelism
      val scanned2 =
        if (scanned.rdd.getNumPartitions > targetParts) scanned.coalesce(targetParts)
        else scanned
      val sigs = Fingerprints.pruneForMode(
        Fingerprints.fromPages(scanned2, cfg).toDF(), cfg).persist(persistLevel)
      // Materialize the signature cache ONCE before the downstream fan-out
      // (guide §2.4 / the bnds.count() discipline in Candidates): the first
      // action below it (the dictionary sort) fans out into ~8 concurrent
      // AQE stage jobs — dedup-key aggregate, anti-join/collapse branches,
      // exact-group aggregate, member/rep joins — and concurrent first touch
      // of an UNPOPULATED cache races: each stage job re-ran the full
      // fingerprint expression over the corpus (measured as an 8-job ladder
      // owning 20.1 s of a 39 s 60k-doc run; one populate pass costs ~2 s).
      labeled(sigs.sparkSession, "graft: fingerprint materialize") { sigs.count() }
      downstream(sigs, pages, cfg, persistLevel)
    }
  }

  /** Incremental entry: fingerprints come from / go to the Iceberg-shaped
    * store (anti-join resume, Resume.scala); clustering always runs over the
    * full live signature set — new rows can join existing clusters.
    *
    * substringPass caller contract (same as [[runIncrementalScoped]]):
    * `pages` must span BOTH sides of possible pairs — the live page source,
    * not just the increment batch. The store holds fingerprints, not text,
    * so a substring candidate whose old-side text is absent from `pages`
    * stays unmatched (the left join retains it with a null overlap) — a
    * verbatim-overlap match a one-shot run over the full corpus would find.
    * A warning is emitted when this shape is detectable. */
  def runIncremental(pages: DataFrame, store: graft.store.IcebergShaped.Table,
                     cfg: GraftConfig = GraftConfig(),
                     persistLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (Result, Resume.IncrementalResult) = {
    val inc = Resume.incrementalFingerprints(scan(pages, cfg), store, cfg)
    val sigs = inc.signatures.persist(persistLevel)
    warnIfSubstringTextMissing(sigs, inc, cfg)
    (downstream(sigs, pages, cfg, persistLevel), inc)
  }

  /** The substringPass incremental hazard is live store rows whose TEXT is
    * absent from `pages` — those candidates are retained unmatched. Every
    * input row lands in the live view (committed or already resident), so
    * the hazard is detectable exactly as live rows exceeding input rows.
    * (A previous cut warned on `skipped > 0`, which fires on the CORRECT
    * usage — full live corpus passed, store satisfies most of it — and
    * stays silent on the hazardous batch-only shape.) Costs one count on
    * the already-persisted live view, which downstream materializes anyway. */
  private def warnIfSubstringTextMissing(liveSigs: DataFrame,
                                         inc: Resume.IncrementalResult,
                                         cfg: GraftConfig): Unit =
    if (cfg.substringPass) {
      val inputRows = inc.newlyFingerprinted + inc.skipped
      if (liveSigs.count() > inputRows)
        System.err.println(
          "[graft] substringPass on an incremental run: `pages` must be the " +
            "LIVE page source (both sides of every possible pair), not just " +
            "the new batch — store-resident candidates whose text is missing " +
            "from `pages` cannot substring-match (they are kept, unmatched)")
    }

  /** Carry-over state for [[runIncrementalScoped]]: the previous run's rep
    * set (with content_id, for stale detection), its scored pairs table
    * (WITHOUT the per-run dictionary ids — those are not stable across
    * generations), and its rep-level cluster assignment.
    *
    * State frames are localCheckpoint'ed at hand-off: an increment chain
    * otherwise stacks every previous generation's lineage into the current
    * plan — plan size (and plan-STRING size in listener events) grows per
    * increment until analysis itself becomes the bottleneck. Checkpointing
    * makes each increment's plans O(this increment). On a real cluster the
    * durable version of this hand-off is the store itself (write
    * pairs/assign as tables, read them back next increment).
    *
    * `retained` carries the generation's still-persisted frames (the live
    * sigs view + reps — the Result references them lazily, so they cannot
    * be released at return); the NEXT scoped call unpersists them on entry,
    * keeping a k-increment chain's cache footprint O(one increment) instead
    * of k persisted corpus-sized frame pairs. Consequence: a previous
    * increment's lazy Result frames (signatures, metrics) recompute from
    * lineage if consumed after the next increment starts. */
  final case class IncState(reps: DataFrame, pairs: DataFrame, repAssign: DataFrame,
                            retained: Seq[DataFrame] = Nil)

  /** Incremental entry SCOPED to the increment (SURVEY §2.10 "re-cluster
    * affected components"; reference analog mainwindow.cpp:153-154 — skip
    * unaffected work on re-runs). Unlike [[runIncremental]], which re-runs
    * banding + scoring + union-find over the FULL live set every increment,
    * this path:
    *
    *   - generates candidates only for pairs with >= 1 NEW/CHANGED endpoint
    *     (Candidates.candidatePairs delta mode — a broadcastable new-side x
    *     all-side band join, no full-corpus shuffle);
    *   - keeps the previous pairs table verbatim for unchanged rep pairs
    *     (candidate generation is a pure function of the rep set);
    *   - re-runs the union-find ONLY over affected components + delta edges
    *     (Clusters.spliceAssign) — at 10^12 docs with small daily appends the
    *     re-cluster cost tracks the increment, not the corpus.
    *
    * Parity with a fresh one-shot run: EXACT (pairs table and assignment)
    * under salted-triangle heavy routing (heavyKeyStar = false) — see
    * spliceAssign's correctness note and candidatePairs' delta note. Under
    * the default star routing, an increment that touches a heavy band key
    * additionally KEEPS the previous run's old-old star/path links; the
    * edge set is a superset of the one-shot topology's, so clusters can
    * only coarsen, and only when a kept old edge is matched while every
    * one-shot path between its endpoints has an unmatched link — an
    * adversarial length-modifier asymmetry inside a near-identical
    * boilerplate group, not a shape this corpus produces.
    * substringPass callers must pass `pages` spanning BOTH sides of possible
    * pairs (the live page source), not just the increment batch.
    *
    * First call (prev = None) falls back to the full downstream and just
    * builds the state. Returns (result, resume stats, state-for-next-call).
    * Metrics gain recluster_edges / affected_clusters / untouched_clusters —
    * the scale evidence that the union-find input is bounded by affected
    * components. */
  def runIncrementalScoped(pages: DataFrame, store: graft.store.IcebergShaped.Table,
                           prev: Option[IncState],
                           cfg: GraftConfig = GraftConfig(),
                           persistLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (Result, Resume.IncrementalResult, IncState) = {
    val inc = Resume.incrementalFingerprints(scan(pages, cfg), store, cfg)
    val sigs = inc.signatures.persist(persistLevel)
    warnIfSubstringTextMissing(sigs, inc, cfg)

    // ONE exact-group derivation shared with pairStage (the grouping rule —
    // min-url election per text_md5 — must never diverge between the scoped
    // and one-shot paths), passed down so downstream() does not rebuild and
    // re-persist identical members/reps frames.
    val eg = exactGroups(sigs, persistLevel)
    val members = eg.members
    val reps = eg.reps
    val valid = eg.valid
    val rejects = eg.rejects

    // Band-relation persistence between increments (round-6; r5 VERDICT #1,
    // the reference's read-before-compute cache protocol applied to the
    // candidate layer, db.cpp:50-69 analog): each generation commits the
    // band rows of its rep set to a sibling store table; the NEXT increment
    // reads them back, drops stale reps' rows, and only explodes the NEW
    // reps' bands — candidate generation no longer re-derives the full
    // band relation from the full signature payload every increment.
    val bandsTable = graft.store.IcebergShaped.table(store.root + "/bands")
    def bandRowsOf(repFrame: DataFrame): DataFrame =
      Candidates.bandKeysByUrl(repFrame, cfg)
        .withColumn("part_id",
          pmod(xxhash64(col("url")), lit(cfg.storeParts)).cast("int"))
        .withColumn("config_fp", lit(cfg.configFp))
        // cluster by the partition column before the partitionBy write so
        // each part_id lands as ONE file instead of one per write task
        // (guide §6 output sizing — the explode otherwise fans 32 dirs x
        // n-task small files)
        .repartition(col("part_id"))

    prev match {
      case None =>
        val res = downstream(sigs, pages, cfg, persistLevel, Some(eg))
        val repsCk0 = reps.localCheckpoint()
        // first-generation band commit: reps are persisted+materialized by
        // downstream() at this point, so this is one slim explode + write
        labeled(sigs.sparkSession, "graft: band store commit") {
          bandsTable.commit(bandRowsOf(repsCk0), cfg.configFp, "overwrite")
        }
        val state = IncState(repsCk0,
          res.pairs.drop("id_a", "id_b").localCheckpoint(),
          res.clusters.join(reps.select("url"), Seq("url"), "left_semi")
            .select(col("url"), col("cluster_id")).localCheckpoint(),
          retained = Seq(sigs, reps))
        (res, inc, state)

      case Some(st) =>
        // release the PREVIOUS generation's persisted corpus-sized frames
        // (live sigs + reps): the state hand-off is all checkpoint leaves,
        // so nothing in this increment reads them — see IncState.retained
        st.retained.foreach(_.unpersist(false))
        // Lineage truncation at branch ENTRY, not just at hand-off: this
        // branch runs ~a dozen eager actions (excepts, isEmpty, delta
        // persists, splice rounds, metric aggregates) and each one would
        // re-ANALYZE the full reps lineage (sigs = store-read ∪ fingerprint
        // expression over the page source) — measured as the wall time of a
        // 2k-doc increment being ~3x driver-side planning, ~1/4 execution.
        // The one-shot path pays that analysis once (downstream truncates at
        // the pairs boundary); here the same truncation happens up front.
        // No extra storage vs before — the state hand-off already
        // checkpointed reps at exit; this is the same checkpoint, earlier,
        // reused for both the increment's work and the outgoing state.
        val repsCk = labeled(sigs.sparkSession, "graft: incr reps checkpoint") {
          reps.localCheckpoint()
        }
        // new/changed vs stale reps by (url, content_id): a re-crawled url
        // (new warc_ts -> new content_id) is BOTH stale (old pairs invalid)
        // and new (delta candidates regenerate them); a demoted rep (its
        // text group gained a smaller url) is stale only.
        val repIdent = repsCk.select(col("url"), col("content_id"))
        val prevIdent = st.reps.select(col("url"), col("content_id"))
        val newUrls = repIdent.except(prevIdent).select("url").persist(persistLevel)
        val staleUrls = prevIdent.except(repIdent).select("url").persist(persistLevel)

        // Current-generation band relation, store-backed: the previous
        // generation's committed rows minus stale reps, plus a fresh explode
        // of the NEW reps only — row-identical to a full re-explode (bands
        // are a pure function of the rep row; unchanged (url, content_id)
        // means an unchanged row). Falls back to the full explode if the
        // band table is missing (state built by an older generation of this
        // code or a wiped sibling dir).
        val storedBandsFull =
          if (bandsTable.isEmpty) None
          else Some(bandsTable.read(sigs.sparkSession))
        val storedBands = storedBandsFull.map(
          _.filter(col("config_fp") === cfg.configFp)
            .select(col("url"), col("band_id"), col("key")))
        val (hasNew, hasStale) =
          labeled(sigs.sparkSession, "graft: incr new/stale detect") {
            (!newUrls.isEmpty, !staleUrls.isEmpty)
          }
        val newBandRows =
          if (hasNew) bandRowsOf(repsCk.join(newUrls, Seq("url"), "left_semi"))
            .persist(persistLevel)
          else null
        val bndsAll = storedBands.map { sb =>
          val live = sb.join(staleUrls, Seq("url"), "left_anti")
          if (hasNew) live.unionByName(newBandRows.select("url", "band_id", "key"))
          else live
        }

        // stale-key expansion (round-5 review): keptPrev below drops EVERY
        // previous pair with a stale endpoint, but under star routing those
        // pairs can BE a heavy group's connective topology (its hub links, a
        // chain position) — and a stale rep's keys are invisible to the
        // delta's touched-key detection, which only sees NEW reps' keys. A
        // re-crawled hub therefore fragmented its cluster vs one-shot. Seed
        // the delta new-side with the CURRENT members of every key a stale
        // rep used to emit — read from the committed band rows (no re-explode
        // of the previous generation's reps), with the full-explode fallback
        // when the band table is absent. Runs only on increments that
        // actually contain stale reps.
        val seedUrls =
          if (!hasStale) newUrls
          else {
            val staleKeys = storedBands
              .map(_.join(staleUrls, Seq("url"), "left_semi"))
              .getOrElse(Candidates.bandKeysByUrl(
                st.reps.join(staleUrls, Seq("url"), "left_semi"), cfg))
              .select("band_id", "key").distinct()
            val coMembers = bndsAll
              .getOrElse(Candidates.bandKeysByUrl(repsCk, cfg))
              .join(staleKeys, Seq("band_id", "key"), "left_semi")
              .select("url").distinct()
            newUrls.unionByName(coMembers).distinct().persist(persistLevel)
          }

        val cand = Candidates.candidatePairs(repsCk, cfg, Some(seedUrls), bndsAll)
        val scoredBase = Pairs.score(cand, cfg)
        val scoredVerified =
          if (cfg.exactVerify) Pairs.exactVerify(scoredBase, repsCk, cfg) else scoredBase
        val delta =
          (if (cfg.substringPass) Pairs.substringPass(scoredVerified, pages, cfg)
           else scoredVerified).drop("id_a", "id_b").persist(persistLevel)

        // diagnosis-only volume probe (extra jobs — keep off outside profiling)
        if (sys.env.contains("GRAFT_INCR_DEBUG")) {
          System.err.println(s"[incrdbg] new=${newUrls.count()} " +
            s"stale=${staleUrls.count()} seed=${seedUrls.count()} " +
            s"delta=${delta.count()} deltaMatched=${delta.filter(col("matched")).count()}")
          java.nio.file.Files.write(
            java.nio.file.Paths.get("/tmp/incr_delta_plan.txt"),
            delta.queryExecution.executedPlan.toString().getBytes)
        }

        val keptPrev = st.pairs
          .join(staleUrls.select(col("url").as("url_a")), Seq("url_a"), "left_anti")
          .join(staleUrls.select(col("url").as("url_b")), Seq("url_b"), "left_anti")
        // the stale-key expansion re-emits topology for affected groups, so
        // delta can recompute pairs keptPrev already holds; dedup keeps the
        // PREVIOUS generation's row. Both endpoints of a keptPrev pair are
        // unchanged reps, so the decision columns are a pure function of the
        // same two signatures — identical when delta is fully informed — but
        // the OLD row is the better-informed one when this increment's
        // `pages` batch lacks an old url's text (the warned batch-only
        // shape): a delta recompute there would downgrade a previously
        // substring-matched pair to overlap_len=null / matched=false.
        val deltaNew = delta.select(keptPrev.columns.map(col): _*)
          .join(keptPrev.select("url_a", "url_b"), Seq("url_a", "url_b"), "left_anti")
        val pairs = labeled(sigs.sparkSession, "graft: incr pairs checkpoint") {
          keptPrev.unionByName(deltaNew).localCheckpoint()
        }

        val splice = labeled(sigs.sparkSession, "graft: incr splice") {
          Clusters.spliceAssign(repsCk.select("url"), st.repAssign,
            st.pairs.filter(col("matched")), delta.filter(col("matched")), staleUrls)
        }
        val repAssign = labeled(sigs.sparkSession, "graft: incr assign checkpoint") {
          splice.assign.localCheckpoint()
        }
        val memberClusters = members
          .join(repAssign.withColumnRenamed("url", "rep_url"), "rep_url")
          .select(col("url"), col("cluster_id"))
        val clustered = memberClusters
          .join(valid.select(col("url"), col("size"), col("text_len"), col("warc_ts")), "url")
        // same result-boundary lineage truncation as downstream(): the
        // increment-chain plans stay O(this increment) for every consumer
        val clusters = labeled(sigs.sparkSession, "graft: incr clustering") {
          Clusters.electKeepers(clustered).localCheckpoint()
        }

        val spark = sigs.sparkSession
        import spark.implicits._
        val metrics =
          kvMetrics(sigs.agg(
            count(lit(1)).as("signatures"),
            coalesce(sum(when(col("reject_reason").isNotNull, 1L)), lit(0L)).as("rejected"),
            coalesce(sum(when(!col("extract_ok"), 1L)), lit(0L)).as("extract_mismatches")))
            .unionByName(kvMetrics(repsCk.agg(count(lit(1)).as("exact_groups"))))
            .unionByName(kvMetrics(pairs.agg(
              count(lit(1)).as("candidate_pairs"),
              coalesce(sum(when(col("matched"), 1L)), lit(0L)).as("matched_pairs"))))
            .unionByName(kvMetrics(clusters.groupBy("cluster_id").count().agg(
              coalesce(sum(when(col("count") > 1, 1L)), lit(0L)).as("dup_clusters"),
              coalesce(sum(when(col("count") > 1, col("count"))), lit(0L)).as("docs_in_dup_clusters"))))
            .unionByName(Seq(
              ("recluster_edges", splice.reclusterEdges),
              ("affected_clusters", splice.affectedClusters),
              ("untouched_clusters", splice.untouchedClusters)).toDF("metric", "value"))

        val res = Result(sigs, rejects, pairs, clusters, metrics)
        val state = IncState(repsCk, pairs, repAssign,
          retained = Seq(sigs, reps))
        // every returned frame is a checkpoint leaf (pairs, repAssign,
        // clusters, state.reps) or persisted in its own right (sigs, reps —
        // metrics still aggregates them; the NEXT increment releases them
        // via state.retained): the increment-local caches and the candidate
        // layer's internals are released here, keeping a long incremental
        // chain's cache footprint O(one increment)
        // Band-table maintenance for the NEXT generation: append-only on the
        // common (no-stale) path; a stale increment compacts by committing
        // the already-computed live ∪ new rows (no re-explode); a missing
        // table rebuilds from the current rep set (fallback only).
        labeled(sigs.sparkSession, "graft: band store update") {
          storedBandsFull match {
            case None =>
              bandsTable.commit(bandRowsOf(repsCk), cfg.configFp, "overwrite")
            case Some(all) if hasStale =>
              val staleThis = staleUrls.withColumn("config_fp", lit(cfg.configFp))
              val liveAll = all.join(staleThis, Seq("url", "config_fp"), "left_anti")
              val frame =
                if (hasNew) liveAll.unionByName(
                  newBandRows.select(all.columns.map(col): _*))
                else liveAll
              bandsTable.commit(frame, cfg.configFp, "overwrite")
            case Some(_) if hasNew =>
              bandsTable.commit(newBandRows, cfg.configFp, "append")
            case Some(_) => () // no rep-set change: table already current
          }
        }
        if (newBandRows != null) newBandRows.unpersist(false)
        newUrls.unpersist(false); staleUrls.unpersist(false)
        if (!(seedUrls eq newUrls)) seedUrls.unpersist(false)
        delta.unpersist(false); members.unpersist(false)
        Candidates.cleanupCaches(); Fingerprints.cleanupCaches()
        (res, inc, state)
    }
  }

  /** S2 analog (extension filter): lang predicate on the scan — pushed to
    * the source by Catalyst (row-group skip on Parquet). Shared with the
    * streaming ingest sink: every entry into fingerprinting applies it. */
  private[graft] def scan(pages: DataFrame, cfg: GraftConfig): DataFrame =
    cfg.langFilter match {
      case Some(ls) => pages.filter(col("lang").isin(ls.toSeq: _*))
      case None => pages
    }

  /** The shared relational core: exact-group -> candidates -> scoring ->
    * union-find -> keeper election. `pairs` and `clusters` come back
    * MATERIALIZED and lineage-truncated (see the checkpoint note below);
    * `signatures` stays a lazy persisted frame. */
  /** Label the jobs of `body` in the Spark UI / listeners (guide §1.5);
    * restores the caller's description so Bench sweep labels survive. */
  private[graft] def labeled[T](spark: org.apache.spark.sql.SparkSession,
                                desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  private def downstream(sigs: DataFrame, pages: DataFrame, cfg: GraftConfig,
                         persistLevel: StorageLevel,
                         pre: Option[ExactGroups] = None): Result = {
    val ps0 = pairStage(sigs, pages, cfg, persistLevel, pre)
    // Lineage truncation at the result boundary. The candidate stage is a
    // DAG of self-joins and unions over the same subtrees (band self-join,
    // heavy/light routing, payload join-back, verify re-joins); expressed as
    // a logical plan TREE those shared subtrees multiply out, so every
    // DataFrame later derived from `pairs`/`clusters` re-ANALYZES a tree
    // that grows geometrically with consumer depth — measured as
    // multi-minute single-core driver stalls per derived query and >10M-char
    // plan strings. An eager localCheckpoint rewrites the frame to a
    // LogicalRDD leaf: one materialization job here (the union-find needed
    // the rows anyway), O(1)-size plans for every consumer. It also
    // replaces the old clusters.count() AQE-cache-race guard — the eager
    // checkpoint materializes single-threadedly by construction. On a real
    // cluster the durable equivalent is writing pairs/clusters to the store
    // and reading them back (localCheckpoint is lost on executor failure).
    //
    // The exact-verify and substring passes are applied AFTER the first
    // checkpoint (round-6): planned inline, each pass's gated/untouched
    // union referenced the full candidate tree TWICE (and the substring
    // text joins re-walked it per side) — measured as 8-10 s ZERO-JOB
    // driver planning gaps before the pairs checkpoint at 8k docs. Over a
    // LogicalRDD leaf each pass's plan is O(1); one extra pair-volume
    // checkpoint materialization per enabled pass buys it.
    val spark0 = sigs.sparkSession
    val pairsBase = labeled(spark0, "graft: pairs checkpoint") { ps0.pairs.localCheckpoint() }
    val pairsVerified =
      if (!cfg.exactVerify) pairsBase
      else labeled(spark0, "graft: exact verify") {
        Pairs.exactVerify(pairsBase, ps0.reps, cfg).localCheckpoint()
      }
    val pairs =
      if (!cfg.substringPass) pairsVerified
      else labeled(spark0, "graft: substring pass") {
        Pairs.substringPass(pairsVerified, pages, cfg).localCheckpoint()
      }
    val ps = ps0.copy(pairs = pairs)
    val clusters = labeled(spark0, "graft: clustering") {
      clusterStage(ps, persistLevel).localCheckpoint()
    }
    // pairs and clusters are now LogicalRDD leaves: nothing references the
    // candidate layer's internal caches (band relation, slim projection)
    // any more — release them, or an incremental chain accumulates one band
    // relation per increment. members likewise only fed clusterStage.
    Candidates.cleanupCaches(); Fingerprints.cleanupCaches()
    ps.members.unpersist(false)

    // one driver job for every remaining run metric (S14): per-frame
    // aggregates are exploded to (metric, value) rows and unioned, so one
    // collect scans the persisted intermediates once — no per-phase
    // .head()/count() fan-out
    val metrics =
      kvMetrics(sigs.agg(
        count(lit(1)).as("signatures"),
        coalesce(sum(when(col("reject_reason").isNotNull, 1L)), lit(0L)).as("rejected"),
        coalesce(sum(when(!col("extract_ok"), 1L)), lit(0L)).as("extract_mismatches")))
        .unionByName(kvMetrics(ps.reps.agg(count(lit(1)).as("exact_groups"))))
        .unionByName(kvMetrics(ps.pairs.agg(
          count(lit(1)).as("candidate_pairs"),
          coalesce(sum(when(col("matched"), 1L)), lit(0L)).as("matched_pairs"))))
        .unionByName(kvMetrics(clusters.groupBy("cluster_id").count().agg(
          coalesce(sum(when(col("count") > 1, 1L)), lit(0L)).as("dup_clusters"),
          coalesce(sum(when(col("count") > 1, col("count"))), lit(0L)).as("docs_in_dup_clusters"))))

    Result(sigs, ps.rejects, ps.pairs, clusters, metrics)
  }

  /** profile = true: the round-1 behavior — a materializing action per phase
    * so wall-time attributes to fingerprint / exact-group / candidates /
    * clustering. Costs ~6 extra driver jobs; for tuning runs only. */
  private def downstreamProfiled(sigs: DataFrame, nSigs: Long, tFingerprint: Long,
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

    val ps0 = pairStage(sigs, pages, cfg, persistLevel)
    val withVerify =
      if (cfg.exactVerify) Pairs.exactVerify(ps0.pairs, ps0.reps, cfg) else ps0.pairs
    val ps = ps0.copy(pairs =
      if (cfg.substringPass) Pairs.substringPass(withVerify, pages, cfg)
      else withVerify)
    ps.pairs.persist(persistLevel)
    val repCount = ps.reps.count()
    val tExactGroup = phaseMs()

    val pairAgg = ps.pairs.agg(
      count(lit(1)),
      coalesce(sum(when(col("matched"), 1L)), lit(0L))).head()
    val tCandidates = phaseMs()

    val clusters = clusterStage(ps, persistLevel).persist(persistLevel)
    val cluAgg = clusters.groupBy("cluster_id").count()
      .agg(
        coalesce(sum(when(col("count") > 1, 1L)), lit(0L)),
        coalesce(sum(when(col("count") > 1, col("count"))), lit(0L))).head()
    val tClustering = phaseMs()

    val sigAgg = sigs.agg(
      coalesce(sum(when(col("reject_reason").isNotNull, 1L)), lit(0L)),
      coalesce(sum(when(!col("extract_ok"), 1L)), lit(0L))).head()

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

    // same release discipline as downstream(): pairs and clusters are fully
    // materialized by the per-phase aggregation actions above, so the
    // candidate layer's registered persists and the members frame can go —
    // without this, profiled runs pinned them for the session lifetime (or
    // until an unrelated later run's cleanup yanked them mid-consumer)
    Candidates.cleanupCaches(); Fingerprints.cleanupCaches()
    ps.members.unpersist(false)

    Result(sigs, ps.rejects, ps.pairs, clusters, metrics)
  }

  private final case class PairStage(rejects: DataFrame, valid: DataFrame,
                                     members: DataFrame, reps: DataFrame,
                                     pairs: DataFrame)

  private final case class ExactGroups(rejects: DataFrame, valid: DataFrame,
                                       members: DataFrame, reps: DataFrame)

  /** Exact-duplicate pre-grouping (one representative = min url per distinct
    * text) — the ONE definition of the grouping rule, shared by pairStage
    * and runIncrementalScoped. members and reps come back persisted. */
  private def exactGroups(sigs: DataFrame, persistLevel: StorageLevel): ExactGroups = {
    val rejects = sigs.filter(col("reject_reason").isNotNull)
      .select(col("url"), col("reject_reason").as("reason"))
    val valid = sigs.filter(col("reject_reason").isNull)
    val groups = valid.groupBy("text_md5").agg(min("url").as("rep_url"))
    // members has exactly ONE consumer on every path (the member-expansion
    // join) — persisted MEMORY_AND_DISK anyway because callers unpersist it
    // by contract, but at single-use the cache write is the only cost, so
    // keep it cheap (the join inputs are the cached sigs either way)
    val members = valid.select(col("url"), col("text_md5"))
      .join(groups, "text_md5")
      .select(col("url"), col("rep_url"))
      .persist(persistLevel)
    val reps = valid.join(
      groups.select(col("rep_url").as("url")), Seq("url"), "left_semi")
      .persist(persistLevel)
    ExactGroups(rejects, valid, members, reps)
  }

  /** Narrow + candidate half: rejects, exact-dup grouping, LSH candidates,
    * scored pairs. Lazy — nothing here triggers a job. */
  private def pairStage(sigs: DataFrame, pages: DataFrame, cfg: GraftConfig,
                        persistLevel: StorageLevel,
                        pre: Option[ExactGroups] = None): PairStage = {
    val eg = pre.getOrElse(exactGroups(sigs, persistLevel))
    val rejects = eg.rejects
    val valid = eg.valid
    val members = eg.members
    val reps = eg.reps

    // candidates + scoring (representative level). The exact-verify and
    // substring passes are NOT applied here (round-6): downstream() runs
    // them over the checkpointed pairs leaf so their plans stay O(1) — see
    // the checkpoint note there.
    val cand = Candidates.candidatePairs(reps, cfg)
    val scoredBase = Pairs.score(cand, cfg)
    // NOT persisted/checkpointed here: downstream() truncates lineage with
    // an eager localCheckpoint, downstreamProfiled() persists lazily so its
    // phase timers still attribute the candidate work to the right marker
    PairStage(rejects, valid, members, reps, scoredBase)
  }

  /** Clustering half: union-find (EAGER — iterative), member expansion,
    * keeper election. */
  private def clusterStage(ps: PairStage, persistLevel: StorageLevel): DataFrame = {
    val matched = ps.pairs.filter(col("matched"))
    // pairs carry dictionary ids: the union-find rounds shuffle longs
    val repClusters = Clusters.assignByIds(ps.reps.select("url"), matched)
    val memberClusters = ps.members
      .join(repClusters.withColumnRenamed("url", "rep_url"), "rep_url")
      .select(col("url"), col("cluster_id"))
    val clustered = memberClusters
      .join(ps.valid.select(col("url"), col("size"), col("text_len"), col("warc_ts")), "url")
    Clusters.electKeepers(clustered)
  }

  /** Explode a one-row aggregate frame into (metric, value) rows — keeps the
    * whole metrics surface inside one job when unioned. */
  private def kvMetrics(agg1row: DataFrame): DataFrame = {
    val cols: Seq[Column] = agg1row.columns.toSeq.map(c =>
      struct(lit(c).as("metric"), col(c).cast("long").as("value")))
    agg1row.select(explode(array(cols: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }
}
