package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.GraftConfig
import graft.data.CorpusSpark
import graft.ops.{AnnOps, DedupOps, Multimodal, TextOps}
import graft.spark.{Clusters, Pipeline}

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), with DuckDB-checkable `oracleSql` wherever the operator is
  * ANSI-SQL-expressible. Non-SQL operators (simhash/minhash/LSH/suffix-array/
  * the full webtext pipeline) are registered without oracles (rows-only
  * check) and are instead gated by the ScalaTest oracle suite
  * (PipelineSpec: recall/cluster-equivalence vs brute force).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Corpus size for the synthesized webtext queries, by the scale dir's
    * own NAME (the last path segment) — a substring match over the full
    * path would misclassify "/data/run-v0.1/sf0.01" as sf0.1. */
  private def corpusN(dir: String): Long = {
    val name = dir.stripSuffix("/").reverse.takeWhile(_ != '/').reverse
    if (name.contains("0.01")) 5000L
    else if (name.contains("0.1")) 20000L
    else 2000L
  }

  private val cfg = GraftConfig()

  /** The webtext queries share one pipeline run per (scale dir, mode). */
  private val pipelineCache =
    scala.collection.concurrent.TrieMap.empty[String, Pipeline.Result]

  /** Session-adaptive synthesis parallelism: the historic constant 16 left
    * half the cores idle through the narrow synthesis+fingerprint chain on
    * local[32]. Partitioning does not affect results — Corpus.page is a pure
    * function of the row index and the pairs table is partition-invariant
    * (SURVEY §5.7, pinned by the 2..32-core invariance evidence). */
  private def corpusParts(s: SparkSession): Int =
    math.max(16, 2 * s.sparkContext.defaultParallelism)

  /** Synthesize + persist the corpus for the duration of one pipeline build
    * (round-6 guide §5: the pipeline consumes `pages` from several plan
    * branches — url-dedup keys/clean/collapse, the substring text joins —
    * and unpersisted, every branch re-ran the ~ms/doc synthesis map).
    * Released right after the build: pairs/clusters are checkpoint leaves
    * and signatures are persisted in their own right by then. */
  private def withPages[T](s: SparkSession, n: Long)(body: DataFrame => T): T = {
    val pages = CorpusSpark.pages(s, n, corpusParts(s), cfg.seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(pages) finally { pages.unpersist(false); () }
  }

  private def pipelineFor(s: SparkSession, d: String): Pipeline.Result =
    pipelineCache.getOrElseUpdate(d,
      withPages(s, corpusN(d))(p => Pipeline.run(p, cfg)))

  /** Same corpus under the exact-verify mode (the reference's _SSIM mode,
    * prefs.h:14; kernel comparison.cpp:141-147) — F9/F10/V1-V3 get their own
    * hard oracle row via the exported integer (inter, union) measures. */
  /** Mode-coverage pipelines run a SECOND/THIRD full pipeline per scale dir;
    * they exist to exercise the mode end-to-end, so their corpus is capped —
    * identical to corpusN at the driver's correctness scale (sf0.01: 5000),
    * smaller only in the sf0.1 bench sweep where the default-mode pipeline
    * already carries the scale measurement. */
  private def modeCorpusN(d: String): Long = math.min(corpusN(d), 8000L)

  /** S7/S8 store round-trip frame: the default pipeline's signature
    * projection plus the store's required part_id (content-hash bucketed) —
    * deterministic, so two independent commits of it are value-identical.
    * q_store_roundtrip reads a committed store THROUGH the manifest chain
    * (Spark side) while the DuckDB oracle raw-globs every parquet file under
    * an identically-committed store's data dir ({AUX}/store_s8): an extra,
    * missing, or duplicated data file on either path breaks the hash match. */
  private def storeFrame(s: SparkSession, d: String): DataFrame =
    pipelineFor(s, d).signatures
      .select(col("url"), col("content_id"), col("text_md5"),
        col("size").cast("long").as("size"),
        col("text_len").cast("long").as("text_len"))
      .withColumn("part_id", pmod(xxhash64(col("url")), lit(8)).cast("int"))

  private val storeCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def storeRootFor(s: SparkSession, d: String): String =
    storeCache.getOrElseUpdate(d, {
      val root = java.nio.file.Files.createTempDirectory("graft-s8-store").toString
      graft.store.IcebergShaped.table(root).commit(storeFrame(s, d), cfg.configFp)
      root
    })

  /** S9 delete condition — SQL-expressible on purpose, so the DuckDB oracle
    * can re-apply NOT(condition) to the PRE-delete store's raw data files
    * (store_s8 holds the identical committed frame). */
  private def storeDeleteRootFor(s: SparkSession, d: String): String =
    storeCache.getOrElseUpdate(d + "!del", {
      val root = java.nio.file.Files.createTempDirectory("graft-s9-store").toString
      val t = graft.store.IcebergShaped.table(root)
      t.commit(storeFrame(s, d), cfg.configFp)
      t.delete(s, pmod(col("text_len"), lit(3)) === 0)
      root
    })

  /** S15 temp-file GC scenario (the reference's leftover-file cleanup,
    * mainwindow.cpp:53-64, as crashed-commit debris collection): a
    * two-snapshot store (the frame split by url-hash parity) plus two
    * planted `snap-debris-*` dirs that no manifest references. Labels are
    * root-independent — referenced dirs by their manifest version
    * ("v0"/"v1"), debris by its planted suffix — so the query-side temp
    * store and the aux-side twin agree on names. */
  private def buildGcScenario(s: SparkSession, d: String, root: String): Unit = {
    deleteRecursively(java.nio.file.Paths.get(root))
    val t = graft.store.IcebergShaped.table(root)
    val frame = storeFrame(s, d)
    t.commit(frame.filter(pmod(xxhash64(col("url")), lit(2)) === 0), cfg.configFp)
    t.commit(frame.filter(pmod(xxhash64(col("url")), lit(2)) === 1), cfg.configFp)
    for (tag <- Seq("debris-a", "debris-b")) {
      val p = java.nio.file.Paths.get(root, "data", s"snap-$tag", "part_id=0")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve("orphan.parquet"), s"crashed-commit-$tag")
    }
  }

  /** On-disk snap dirs under `root`, labeled root-independently; rows_total
    * from the owning manifest, or -1 for a dir no manifest references (a
    * survivor with -1 means GC failed to collect debris). */
  private def gcDirLabels(root: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val t = graft.store.IcebergShaped.table(root)
    val byDir: Map[String, (String, Long)] =
      (0 to t.currentVersion.getOrElse(-1)).flatMap { v =>
        val sn = t.snapshotAt(v)
        sn.files.headOption.map { f =>
          java.nio.file.Paths.get(f.path).getParent.toString ->
            (s"v$v", sn.files.map(_.rows).sum)
        }
      }.toMap
    val ds = java.nio.file.Files.list(java.nio.file.Paths.get(root, "data"))
    try ds.iterator().asScala
      .filter(_.getFileName.toString.startsWith("snap-"))
      .map { p =>
        byDir.getOrElse(p.toString,
          (p.getFileName.toString.stripPrefix("snap-"), -1L))
      }.toSeq.sortBy(_._1)
    finally ds.close()
  }

  private def gcRootFor(s: SparkSession, d: String): String =
    storeCache.getOrElseUpdate(d + "!gc", {
      val root = java.nio.file.Files.createTempDirectory("graft-s15-store").toString
      buildGcScenario(s, d, root)
      graft.store.IcebergShaped.table(root).gcOrphans()
      root
    })

  /** Recursive delete for the aux store root (re-committing onto a previous
    * verify run's store would append a second snapshot and desync the
    * oracle's raw file glob from the single-commit layout). */
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  /** Fixed cursor for the W2 progress-position query: a mid-range url
    * threshold in the deterministic corpus enumeration (it need not name an
    * existing pair — progress is a count over the canonical ordering). */
  private val progressCursor = "https://example.org/s31/doc0000001000"

  private val cfgExact = cfg.copy(exactVerify = true)
  private def pipelineExactFor(s: SparkSession, d: String): Pipeline.Result =
    pipelineCache.getOrElseUpdate(d + "!exact",
      withPages(s, modeCorpusN(d))(p => Pipeline.run(p, cfgExact)))

  /** The v=70 reverified pairs frame, computed once per scale dir and shared
    * by q_rethreshold_exact_low and the wt_pairs_exact_low aux export — the
    * [45,57) never-verified-stratum Jaccard join is the expensive half of the
    * low-slider path and used to run twice (round-4 ADVICE #4). */
  private val reverifyLowCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def reverifiedLowFor(s: SparkSession, d: String): DataFrame =
    reverifyLowCache.getOrElseUpdate(d + "!exactlow", {
      val res = pipelineExactFor(s, d)
      graft.spark.Pairs.reverify(res.pairs,
          res.signatures.filter(col("reject_reason").isNull), cfgExact, newThreshold = 70)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Same corpus with the suffix-array substring pass on (SURVEY §2.8 V4) —
    * the oracle re-derives `matched` (simhash threshold OR verbatim-overlap
    * >= minSubstringOverlap) from exported raw measures; the LCS values
    * themselves are sbt-pinned (SuffixOverlap suite). */
  private val cfgSub = cfg.copy(substringPass = true)
  private def pipelineSubFor(s: SparkSession, d: String): Pipeline.Result =
    pipelineCache.getOrElseUpdate(d + "!sub",
      withPages(s, modeCorpusN(d))(p => Pipeline.run(p, cfgSub)))

  /** Same corpus under a GRID sampling mode (thumbnail.h:6-26 — "2x2"
    * captures at 16/40/56/80% and fingerprints the union as one slot, the
    * montage-hash analog) — closes the last sampling-mode coverage gap with
    * a hard oracle row like the other modes (round-3 verdict #4). */
  private val cfgGrid = cfg.copy(samplingMode = "2x2")
  private def pipelineGridFor(s: SparkSession, d: String): Pipeline.Result =
    pipelineCache.getOrElseUpdate(d + "!grid",
      withPages(s, modeCorpusN(d))(p => Pipeline.run(p, cfgGrid)))

  /** The WIDEST grid mode (4x3 — 12 windows, thumbnail.h:20-26): stresses the
    * window-union dedup at the mode family's extreme; same oracle shape as
    * 2x2 (fingerprint-only decision re-derived from exported raw measures). */
  private val cfgGrid43 = cfg.copy(samplingMode = "4x3")
  private def pipelineGrid43For(s: SparkSession, d: String): Pipeline.Result =
    pipelineCache.getOrElseUpdate(d + "!grid43",
      withPages(s, modeCorpusN(d))(p => Pipeline.run(p, cfgGrid43)))

  /** §2.10 incremental re-cluster, scoped to affected components: base run
    * over the corpus' 80% prefix, then ONE increment to the full corpus via
    * Pipeline.runIncrementalScoped (store-backed anti-join resume, delta-only
    * candidate generation, spliceAssign union-find over affected components).
    * The DuckDB oracle for this query is the ONE-SHOT closure over the
    * default pipeline's exported pairs/sigs (wtClusterCte) — a value-identical
    * result proves incremental == one-shot end-to-end, keeper election
    * included, while the spec layer (IncrementalScopedSpec) separately pins
    * that the spliced union-find input stayed bounded by the affected
    * subgraph. */
  private def pipelineIncrementalFor(s: SparkSession, d: String): Pipeline.Result =
    pipelineCache.getOrElseUpdate(d + "!incr", {
      val store = graft.store.IcebergShaped.table(
        java.nio.file.Files.createTempDirectory("graft-incr-store").toString)
      val n = corpusN(d)
      withPages(s, n * 4 / 5) { base =>
        withPages(s, n) { full =>
          val (_, _, st1) = Pipeline.runIncrementalScoped(base, store, None, cfg)
          val (r2, inc2, _) = Pipeline.runIncrementalScoped(full, store, Some(st1), cfg)
          require(inc2.skipped > 0L, "increment must resume from the store")
          r2
        }
      }
    })

  // declared BEFORE configFpVariants on purpose: the variants reference it,
  // and although configFpVariants is a def today, a val-ification would
  // otherwise capture 0 at object init and desync q_config_fp's two sides
  private val sigCapTestCap = 64

  /** S10 config fingerprints: variants that differ in fingerprint-affecting
    * fields (mode, cap) — and, since mode-pruned persistence, in the stored
    * payload schema: exactVerify/substringPass enter the stamp only through
    * the payload marker (their stored rows are identical full-payload). */
  private def configFpVariants: Seq[(String, GraftConfig)] = Seq(
    "default" -> cfg,
    "exact"   -> cfgExact,
    "grid2x2" -> cfgGrid,
    "grid4x3" -> cfgGrid43,
    "cap64"   -> cfg.copy(maxStoredShinglesPerSlot = sigCapTestCap))

  private val sigCapCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** X12 stored-array cap + pre-cap ss-key sampling, hard-oracled: the kernel
    * runs twice per url — once with a cap this corpus actually exceeds (64;
    * the cap is config, the stored-thumbnail budget analog of thumbnail.h)
    * and once uncapped. The query returns the capped stored arrays exploded
    * to scalar rows; the oracle re-derives bottom-k (arrays are
    * sorted-distinct, so bottom-k == take k, core/Signatures.scala:84-88) and
    * the mod-m sampled merge-union (core/Signatures.scala:89-104) from the
    * UNCAPPED chains in SQL — the selection decision never crosses to DuckDB,
    * only raw hash chains do. */
  private def sigCapFor(s: SparkSession, d: String): DataFrame =
    sigCapCache.getOrElseUpdate(d, {
      import s.implicits._
      val cfgCap = cfg.copy(maxStoredShinglesPerSlot = sigCapTestCap)
      val cfgUncapped = cfg.copy(maxStoredShinglesPerSlot = Int.MaxValue)
      val out = CorpusSpark.pages(s, modeCorpusN(d), corpusParts(s), cfg.seed)
        .select("url", "warc_ts", "html", "text", "lang")
        .as[(String, java.sql.Timestamp, Array[Byte], String, String)]
        .mapPartitions { it =>
          val mh = new graft.core.MinHasher(cfg.numPerm, cfg.seed)
          it.flatMap { case (url, ts, html, text, lang) =>
            val capped =
              graft.spark.Fingerprints.signatureOf(url, ts, html, text, lang, cfgCap, mh)
            if (capped.reject_reason.isDefined) Iterator.empty
            else {
              val full =
                graft.spark.Fingerprints.signatureOf(url, ts, html, text, lang, cfgUncapped, mh)
              Iterator.single((url, capped.shingles_head, capped.shingles_tail,
                capped.ss_keys, full.shingles_head, full.shingles_tail))
            }
          }
        }
        .toDF("url", "head_cap", "tail_cap", "ss_cap", "head_full", "tail_full")
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Flagship query (driver smoke-checks rows > 0): end-to-end near-dup
    * pipeline on the deterministic synthetic corpus, reporting the top
    * duplicate clusters by reclaimable bytes. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = CorpusSpark.pages(spark, 2000L, parts = 8, seed = cfg.seed)
    val res = Pipeline.run(pages, cfg)
    Clusters.topClustersByReclaimable(res.clusters, 20)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / filters / projections (S1, S2, F6, F8) ----
    "q_scan_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45.0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- multi-root union (S3) ----
    "q_union_sources" -> ((s, d) =>
      t(s, d, "region").select(col("r_name").as("name"))
        .unionByName(t(s, d, "nation").select(col("n_name").as("name")))
        .orderBy("name")),

    // ---- case-insensitive distinct (F1) ----
    "q_ci_distinct" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy(lower(col("c_mktsegment")).as("seg"))
        .agg(count(lit(1)).as("n"))
        .orderBy("seg")),

    // ---- Hamming similarity predicate (X2, F8) ----
    "q_hamming_filter" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("sim_bits",
          (lit(64) - bit_count(col("o_orderkey").bitwiseXOR(col("o_custkey")))).cast("long"))
        .filter(col("sim_bits") >= 58)
        .select("o_orderkey", "o_custkey", "sim_bits")
        .orderBy("o_orderkey")),

    // ---- reclaimable aggregation (A1 shape: sum of least()) ----
    "q_reclaimable_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(least(col("l_partkey"), col("l_suppkey"))).cast("long").as("reclaim"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey")),

    // ---- keeper election window (W1) ----
    "q_keeper_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    }),

    // ---- existence semi-join (J5) ----
    "q_semi_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // ---- cache-resume anti-join (J4 / S7) ----
    "q_anti_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // ---- md5 content identity (X6) ----
    "q_md5_identity" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          md5(to_binary(concat(col("c_name"), lit("_"), col("c_custkey").cast("string")),
            lit("utf-8"))).as("content_id"))
        .orderBy("c_custkey")),

    // ---- cluster metrics aggregation (A6) ----
    "q_cluster_metrics" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_docs"),
          min(col("o_orderdate")).as("first_seen"),
          max(col("o_orderdate")).as("last_seen"))
        .orderBy("o_custkey")),

    // ---- top-k sort (flagship shape, §2.6) ----
    "q_topk_sort" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // ---- dedup family over documents ----
    "q_exact_dedup" -> ((s, d) => DedupOps.exactDedup(t(s, d, "documents"))),
    "q_minhash_lsh" -> ((s, d) =>
      DedupOps.minhashLshExact(t(s, d, "documents"), jacNum = 1, jacDen = 2, k = 3, cfg)),
    "q_minhash_est" -> ((s, d) =>
      DedupOps.minhashLsh(t(s, d, "documents"), minJaccard = 0.5, k = 3, cfg)),
    "q_simhash_dedup" -> ((s, d) =>
      DedupOps.simhashDedup(t(s, d, "documents"), maxHamming = 7, k = 3, cfg)),
    "q_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramOverlapExact(t(s, d, "documents"), "source", n = 3, jacNum = 1, jacDen = 20)),
    "q_embedding_dup" -> ((s, d) =>
      DedupOps.embeddingCosineDup(t(s, d, "embeddings"), threshold = 0.4, Some("label"))
        .select("vec_id_a", "vec_id_b")),

    // ---- text analysis over documents ----
    "q_token_count" -> ((s, d) => TextOps.tokenCounts(t(s, d, "documents"))),
    "q_subword_count" -> ((s, d) => TextOps.subwordCounts(t(s, d, "documents"))),
    "q_quality_signals" -> ((s, d) => TextOps.qualitySignals(t(s, d, "documents"))),
    "q_quality_score" -> ((s, d) => TextOps.qualityScore(t(s, d, "documents"))),
    "q_lang_id" -> ((s, d) => TextOps.langId(t(s, d, "documents"))),
    "q_doc_fingerprints" -> ((s, d) => TextOps.fingerprints(t(s, d, "documents"))),
    "q_lang_agg" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang", "source")),

    // ---- ANN over embeddings ----
    "q_ann_brute" -> ((s, d) => AnnOps.bruteTopK(t(s, d, "embeddings"), k = 5, nQueries = 10)),
    "q_ann_lsh" -> ((s, d) => AnnOps.lshTopK(t(s, d, "embeddings"), k = 5, nQueries = 10)),
    "q_ann_ivf" -> ((s, d) => AnnOps.ivfTopK(t(s, d, "embeddings"), k = 5, nQueries = 10)),

    // ---- multimodal plumbing (stubbed decode; real batching/schema) ----
    "q_multimodal_frames" -> ((s, d) =>
      Multimodal.frameFeatures(Multimodal.syntheticMedia(t(s, d, "documents")))
        .toDF().select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("pos_pct").cast("long").as("pos_pct"))
        .orderBy("media_id", "frame_idx")),
    "q_media_fingerprints" -> ((s, d) =>
      Multimodal.mediaFingerprints(Multimodal.syntheticMedia(t(s, d, "documents")))),

    // ---- events (streaming-analog hourly rollup, §2.10) ----
    "q_events_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("h", "event_type")),

    // ---- display formatters (X7-X10) ----
    // operands are constructed to dodge printf tie-rounding skew between
    // engines (Java %.1f rounds HALF_UP, DuckDB printf half-to-even): the
    // byte and Mbps operands are ODD — a one-decimal tie needs the operand
    // divisible by a power of two — and the kbps operand stays integer
    "q_display_formats" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          graft.ops.Display.msToHHMMSS(col("o_orderkey") % 86400000L).as("hhmmss"),
          graft.ops.Display.readableFileSize(
            (floor(col("o_totalprice") * 1000).cast("long") * 2 + 1)).as("size_h"),
          graft.ops.Display.readableDuration(col("o_custkey") * 1000L).as("dur_h"),
          graft.ops.Display.readableBitRate((col("o_custkey") % 9000L) * 2L + 10001L).as("bitrate_h"),
          graft.ops.Display.readableBitRate(col("o_custkey") % 9999L).as("bitrate_lo"))
        .orderBy("o_orderkey")),

    // ---- webtext pipeline ----
    // These ARE SQL-oracled: Verify exports the pipeline's raw measures
    // (wt_pairs: scored pairs; wt_sigs: valid per-doc rows) and DuckDB
    // independently re-derives exact groups, transitive closure (recursive
    // CTE), keeper election, actions, and the report from them.
    "q_webtext_actions" -> ((s, d) =>
      graft.spark.Actions.fromClusters(pipelineFor(s, d).clusters)
        .select(col("url"), col("cluster_id"), col("action"),
          col("rank_in_cluster"), col("reclaim_bytes"))
        .orderBy("url")),
    "q_webtext_match_report" -> ((s, d) =>
      graft.spark.Clusters.matchedReport(
        pipelineFor(s, d).pairs.filter(col("matched")))),
    "q_webtext_clusters" -> ((s, d) =>
      pipelineFor(s, d).clusters
        .select("url", "cluster_id", "is_keeper").orderBy("url")),
    // exact-verify (SSIM-mode) pipeline end-to-end: DuckDB re-derives the
    // match decision from the exported integer (inter, union) + len_mod
    // measures and the closure from scratch — covers F9/F10/V1-V3 hard
    "q_webtext_exact" -> ((s, d) =>
      pipelineExactFor(s, d).clusters
        .select("url", "cluster_id", "is_keeper").orderBy("url")),
    // substring-pass pipeline end-to-end: matched = simhash threshold OR
    // suffix-array verbatim overlap >= minSubstringOverlap; the oracle
    // re-derives the rule + closure from exported (sim_bits, overlap_len)
    "q_webtext_substring" -> ((s, d) =>
      pipelineSubFor(s, d).clusters
        .select("url", "cluster_id", "is_keeper").orderBy("url")),
    // grid-mode (2x2) pipeline end-to-end: single-slot montage fingerprint;
    // the oracle re-derives matched = sim_bits >= threshold + the closure
    // from the exported grid-mode raw measures and grid-mode sigs
    "q_webtext_grid" -> ((s, d) =>
      pipelineGridFor(s, d).clusters
        .select("url", "cluster_id", "is_keeper").orderBy("url")),
    // widest grid mode (4x3, 12 windows): same decision rule, maximum
    // window-union overlap in the sampled token stream
    "q_webtext_grid43" -> ((s, d) =>
      pipelineGrid43For(s, d).clusters
        .select("url", "cluster_id", "is_keeper").orderBy("url")),
    // §2.10 incremental re-cluster (scoped): final clusters after base(80%)
    // + one increment; oracled against the ONE-SHOT closure — see
    // pipelineIncrementalFor's scaladoc
    "q_incremental_clusters" -> ((s, d) =>
      pipelineIncrementalFor(s, d).clusters
        .select("url", "cluster_id", "is_keeper").orderBy("url")),
    "q_webtext_top_reclaimable" -> ((s, d) =>
      Clusters.topClustersByReclaimable(pipelineFor(s, d).clusters, 20)
        .select(col("cluster_id"), col("n_docs"),
          col("total_bytes").cast("long").as("total_bytes"),
          col("reclaimable_bytes").cast("long").as("reclaimable_bytes"),
          col("first_seen"))),
    // S12 move sink: non-keepers become move actions targeting a quarantine
    // root; the oracle re-derives keeper rank + target path from the closure
    "q_actions_move" -> ((s, d) =>
      graft.spark.Actions.moveDrops(pipelineFor(s, d).clusters, "/dedup/dropped")
        .select(col("url"), col("cluster_id"), col("action"), col("target"),
          col("rank_in_cluster"), col("reclaim_bytes"))
        .orderBy("url")),
    // S13 swap sink: each matched pair yields two identity-exchange rows;
    // the oracle re-derives the matched set (sim_bits >= threshold) and the
    // two-row expansion in SQL
    "q_actions_swap" -> ((s, d) =>
      graft.spark.Actions.swapPairs(
        pipelineFor(s, d).pairs.filter(col("matched"))
          .select(col("url_a"), col("url_b")))
        .select("url", "action", "target") // the oracle re-derives these three
        .orderBy("url", "target")),
    // A3 action totals (the reference's deleted-files running total)
    "q_action_summary" -> ((s, d) =>
      graft.spark.Actions.summary(
        graft.spark.Actions.fromClusters(pipelineFor(s, d).clusters))
        .select(col("action"), col("n"), col("bytes"))
        .orderBy("action")),
    // A2/S14 per-run summary: the oracle independently re-derives each
    // metric from the raw exports (distinct text groups, pair counts at the
    // re-derived threshold, cluster sizes over the recursive closure)
    "q_run_summary" -> ((s, d) =>
      pipelineFor(s, d).metrics
        .filter(col("metric").isin("exact_groups", "candidate_pairs",
          "matched_pairs", "dup_clusters", "docs_in_dup_clusters"))
        .orderBy("metric")),
    // W2 progress position: the canonical position of a fixed (a, b) cursor
    // in the deterministic pair enumeration — two distributed counts, no
    // global sort window (comparison.cpp:366-373)
    "q_progress" -> ((s, d) => {
      import s.implicits._
      val (pos, total, frac) = graft.spark.Pairs.progressOf(
        pipelineFor(s, d).pairs, progressCursor, progressCursor)
      Seq((pos, total, frac)).toDF("position", "total", "fraction")
    }),
    // X2/X3/X4/X5 scoring kernel: sim_bits re-derived by the oracle from the
    // exported RAW simhashes — hamming, both-null guard, length modifier,
    // 64-clamp, and the cutEnds best-of-two all re-computed in SQL
    "q_pair_scores" -> ((s, d) =>
      pipelineFor(s, d).pairs
        .select(col("url_a"), col("url_b"),
          col("len_mod").cast("long").as("len_mod"),
          col("sim_bits").cast("long").as("sim_bits"), col("matched"))
        .orderBy("url_a", "url_b")),
    // F2/F3/F4/F5/X13 reject routing: every signature row with its routed
    // reject_reason (NULL = accepted). The oracle re-derives the full
    // priority chain (empty -> extract-anomaly -> low-entropy) in SQL from
    // S5/F7 extraction hard-oracled: the engine's md5 of Extract.text(html)
    // per url (computed inside the fingerprint kernel BEFORE rejection, so
    // every corpus page appears), against DuckDB re-extracting from the raw
    // html bytes exported in wt_html. On this corpus's alphabet ([a-z ]
    // paragraphs, boilerplate outside <p>), the reference extraction rules
    // (video.cpp:47-120 probe analog) reduce to: all <p>...</p> blocks in
    // order, joined by \n\n — which DuckDB states independently as a regex.
    // unescape/canonicalize are identities here by corpus construction
    // (FIXTURES.md §1), so a drift in block selection, ordering, or joining
    // — the load-bearing extraction semantics — hash-mismatches.
    "q_extraction" -> ((s, d) =>
      pipelineFor(s, d).signatures
        .select(col("url"), col("text_md5"))
        .orderBy("url")),
    // F7 canonicalization + entity unescape hard-oracled on an ADVERSARIAL
    // construction (the corpus alphabet makes both identities in
    // q_extraction): each documents.text is wrapped in deterministic mess —
    // tab/NBSP/CRLF/VT/FF whitespace runs, inline tags, the full named-
    // entity set with the &amp;-last ordering trap (&amp;lt; must stay the
    // literal string "&lt;"), two numeric entities, and a non-NFC combining
    // accent (e + U+0301 -> é) — then run through the engine's real
    // Extract.text (video.cpp:104-114's canonical-form-before-fingerprint
    // analog). The DuckDB oracle REBUILDS the same mess from documents.text
    // with chr()/replace and re-derives the whole strip -> unescape ->
    // whitespace-collapse -> trim -> NFC chain with its own functions.
    // Generic numeric-entity decoding stays sbt-gated (the oracle states
    // the decode only for the two injected codes).
    "q_canonicalize" -> ((s, d) => {
      import s.implicits._
      val ds = t(s, d, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
      ds.map { case (id, text) =>
          val html = "<p id=\"z\">  \t" + text.replace(" ", "\t \u00A0") +
            "\r\n&amp;lt; <b>x</b>, &quot;q&apos; &gt;&lt;&nbsp;e\u0301 " +
            "&#65;&#x42;\u000B\u000C </p><div>nav</div><p>ok\u00A0x </p>"
          (id, graft.core.Extract.text(html))
        }.toDF("doc_id", "canon")
        .select(col("doc_id"), md5(col("canon")).as("canon_md5"),
          length(col("canon")).cast("long").as("canon_len"))
        .orderBy("doc_id")
    }),
    // RAW integer measures (text_len, html byte length, the NULL-mapped
    // simhash slots) exported in wt_sig_raw — the decision itself never
    // crosses (video.cpp:19-42,157-158 routing)
    "q_rejects" -> ((s, d) =>
      pipelineFor(s, d).signatures
        .select(col("url"), col("reject_reason"))
        .orderBy("url")),
    // X1/A4 SimHash construction (the pHash-analog kernel + its per-bit vote
    // reduce, video.cpp:203-226): the oracle re-derives BOTH 64-bit hashes
    // from the exported raw shingle-hash arrays — per-bit majority votes,
    // strict >0 rule, the <minDistinct NULL sentinel and the ==0 flip — all
    // in SQL. Universe: docs whose stored (bottom-k-capped) arrays are the
    // complete sets, re-derived identically on both sides from array length.
    // S7/S8 store round-trip: write-then-swap commit + manifest-chain read
    // (see storeFrame's scaladoc for what the oracle independently checks)
    "q_store_roundtrip" -> ((s, d) =>
      graft.store.IcebergShaped.table(storeRootFor(s, d)).read(s)
        .select(col("url"), col("content_id"), col("text_md5"),
          col("size"), col("text_len"))
        .orderBy("url")),
    // S9 cache delete (db.cpp:99-117's invalidation as an overwrite
    // snapshot): read-after-delete through the manifest; the oracle
    // re-applies NOT(condition) to the pre-delete store's raw files
    "q_store_delete" -> ((s, d) =>
      graft.store.IcebergShaped.table(storeDeleteRootFor(s, d)).read(s)
        .select(col("url"), col("content_id"), col("text_md5"),
          col("size"), col("text_len"))
        .orderBy("url")),
    // S15 temp-file GC (mainwindow.cpp:53-64): what gcOrphans actually left
    // on disk, labeled root-independently. A debris dir GC failed to remove
    // surfaces as an extra row with rows_total=-1 (no oracle counterpart); a
    // wrongly-collected live dir surfaces as a missing row. The oracle
    // re-derives the survivor set from the aux twin's raw listings.
    "q_store_gc" -> ((s, d) => {
      val rows = gcDirLabels(gcRootFor(s, d))
      s.createDataFrame(rows).toDF("dir_label", "rows_total")
        .orderBy("dir_label")
    }),
    "q_simhash_construct" -> ((s, d) =>
      pipelineExactFor(s, d).signatures
        .filter(col("reject_reason").isNull)
        .filter(size(col("shingles_head")) < cfg.maxStoredShinglesPerSlot &&
                size(col("shingles_tail")) < cfg.maxStoredShinglesPerSlot)
        .select(col("url"), col("simhash_head"), col("simhash_tail"))
        .orderBy("url")),
    // X12 stored-array cap + the pre-cap ss-key sampling (the round-4 recall
    // fix), exploded to scalars; the oracle re-derives bottom-k and the mod-m
    // union from the exported UNCAPPED hash chains
    "q_sig_cap" -> ((s, d) => {
      val base = sigCapFor(s, d)
      def ex(c: String, slot: String) =
        base.select(col("url"), posexplode(col(c)))
          .select(col("url"), lit(slot).as("slot"),
            (col("pos") + 1).cast("long").as("idx"), col("col").as("h"))
      ex("head_cap", "head").unionByName(ex("tail_cap", "tail"))
        .unionByName(ex("ss_cap", "ss"))
        .orderBy("url", "slot", "idx")
    }),

    // S10 version stamp (db.cpp:46-47's version table): the fp for each
    // fingerprint-affecting config variant; the oracle re-computes md5 over
    // the canonical strings with DuckDB's own md5()
    "q_config_fp" -> ((s, d) => {
      import s.implicits._
      configFpVariants.map { case (tag, c) => (tag, c.configFp) }
        .toDF("tag", "fp").orderBy("tag")
    }),

    // ---- §3.3 re-threshold (the reference's live slider) ----
    // matched re-derived from PERSISTED raw measures at v=80 — no
    // re-fingerprinting, no pipeline re-run (comparison.cpp:478-491)
    "q_rethreshold" -> ((s, d) =>
      graft.spark.Pairs.rethreshold(pipelineFor(s, d).pairs, threshold = 80)
        .filter(col("matched"))
        .select(col("url_a"), col("url_b"), col("sim_bits").cast("long").as("sim_bits"))
        .orderBy("url_a", "url_b")),

    // §3.3 slider in EXACT mode: matched re-derived from the persisted
    // jaccard branch (gate at max(thr_bits, 44), then jaccard + len_mod/64
    // > v/100) — the SSIM-mode half of comparison.cpp:478-491
    "q_rethreshold_exact" -> ((s, d) =>
      graft.spark.Pairs.rethreshold(pipelineExactFor(s, d).pairs, threshold = 92)
        .filter(col("matched"))
        .select(col("url_a"), col("url_b"), col("sim_bits").cast("long").as("sim_bits"))
        .orderBy("url_a", "url_b")),

    // §3.3 slider BELOW the run threshold in exact mode (v=70 < run's 89):
    // the new gate max(45, 44) ADMITS candidate pairs the original gate never
    // verified; reverify re-runs ONLY the Jaccard join for that stratum
    // (comparison.cpp:478-491's live re-compare — the round-3 "what's
    // missing" #1, now complete slider parity)
    "q_rethreshold_exact_low" -> ((s, d) =>
      reverifiedLowFor(s, d)
        .filter(col("matched"))
        .select(col("url_a"), col("url_b"), col("sim_bits").cast("long").as("sim_bits"))
        .orderBy("url_a", "url_b"))
  )

  /** Aux inputs for the DuckDB oracles that check non-SQL operators: the
    * pipeline's raw measures and the documents' simhashes, written by Verify
    * next to the query results. The oracle then RE-DERIVES the relational
    * half (exact groups, connected components, keeper election, actions,
    * thresholding, brute-force Hamming) independently in SQL — any recall or
    * logic drift in the Spark side shows up as a row/hash mismatch. */
  def auxExport(spark: SparkSession, sfDir: String, auxDir: String): Unit = {
    // each mode pipeline exports ITS OWN sigs table (url/text_md5/size/...):
    // the mode pipelines run on modeCorpusN docs while the default runs on
    // corpusN, and rejection is mode-dependent — reusing the default wt_sigs
    // in a mode CTE would enumerate the wrong url universe whenever the two
    // sizes diverge (round-3 ADVICE #1: a guaranteed false mismatch at sf0.1)
    // simhash_head/tail ride along as RAW measures: q_pair_scores re-derives
    // the entire scoring kernel (hamming, both-null guard, length modifier,
    // 64-clamp, best-of-two) from them in SQL — the decision never crosses
    def exportSigs(res: Pipeline.Result, name: String): Unit =
      res.signatures.filter(col("reject_reason").isNull)
        .select(col("url"), col("text_md5"),
          col("size").cast("long").as("size"),
          col("text_len").cast("long").as("text_len"), col("warc_ts"),
          col("simhash_head"), col("simhash_tail"))
        .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/$name")

    val res = pipelineFor(spark, sfDir)
    // raw reject-routing inputs for q_rejects, INCLUDING rejected rows:
    // text_len (= extracted length), the source page's html byte length, and
    // the NULL-mapped simhash slots (both NULL <=> the kernel's low-entropy
    // sentinel). The oracle re-applies the routing priority to these.
    res.signatures
      .select(col("url"), col("text_len").cast("long").as("text_len"),
        col("simhash_head"), col("simhash_tail"))
      .join(CorpusSpark.pages(spark, corpusN(sfDir), 16, cfg.seed)
        .select(col("url"), length(col("html")).cast("long").as("html_len")),
        Seq("url"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_sig_raw")
    // raw page html (UTF-8 decoded — the corpus is ASCII) for q_extraction:
    // DuckDB re-runs the extraction from these bytes alone. Universe =
    // signatures (post case-url dedup), matching the query side.
    CorpusSpark.pages(spark, corpusN(sfDir), 16, cfg.seed)
      .select(col("url"), col("html").cast("string").as("html_str"))
      .join(res.signatures.select("url"), Seq("url"), "left_semi")
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_html")
    // an INDEPENDENT commit of the q_store_roundtrip frame: the oracle
    // raw-globs this store's data files, the query reads its own store
    // through the manifest — commit determinism + manifest fidelity checked
    // against raw bytes (fresh single-snapshot store every verify run)
    val s8root = s"$auxDir/store_s8"
    deleteRecursively(java.nio.file.Paths.get(s8root))
    graft.store.IcebergShaped.table(s8root).commit(storeFrame(spark, sfDir), cfg.configFp)
    // S15 GC twin: the identical scenario, NOT collected — the oracle
    // re-derives the survivor set (pre-GC dirs ∩ manifest-referenced dirs)
    // from these raw listings, while q_store_gc reports what gcOrphans
    // actually left on its own independently-built store
    locally {
      import spark.implicits._
      val gcRoot = s"$auxDir/store_gc"
      buildGcScenario(spark, sfDir, gcRoot)
      gcDirLabels(gcRoot).map(_._1).toDF("dir_label")
        .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/store_gc_dirs")
      val tgc = graft.store.IcebergShaped.table(gcRoot)
      require(tgc.currentVersion.nonEmpty,
        s"GC twin store at $gcRoot is empty — scenario build failed")
      (0 to tgc.currentVersion.getOrElse(-1)).flatMap { v =>
        tgc.snapshotAt(v).files.map(f => (v, s"v$v", f.partId, f.rows))
      }.toDF("version", "dir_label", "part_id", "rows")
        .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/store_gc_manifest")
    }
    res.pairs.select(col("url_a"), col("url_b"),
      col("sim_bits").cast("long").as("sim_bits"),
      col("len_mod").cast("long").as("len_mod"),
      col("matched"), col("via"),
      col("size_a").cast("long").as("size_a"),
      col("size_b").cast("long").as("size_b"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_pairs")
    exportSigs(res, "wt_sigs")
    // exact-verify mode raw measures: integer (inter, union) slot-Jaccard
    // sizes + len_mod, from which the oracle re-derives `matched` (the
    // comparison.cpp:141-147 kernel) and the closure — never the flag itself
    val resX = pipelineExactFor(spark, sfDir)
    resX.pairs.select(col("url_a"), col("url_b"),
      col("sim_bits").cast("long").as("sim_bits"),
      col("len_mod").cast("long").as("len_mod"),
      col("jac_inter"), col("jac_union"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_pairs_exact")
    exportSigs(resX, "wt_sigs_exact")
    // raw shingle-hash arrays (exact mode keeps them): q_simhash_construct
    // re-derives the whole SimHash kernel from these in SQL
    resX.signatures.filter(col("reject_reason").isNull)
      .select(col("url"), col("shingles_head"), col("shingles_tail"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_shingles")
    // uncapped hash chains for q_sig_cap's SQL re-derivation of the bottom-k
    // cap and the pre-cap mod-m ss-key sampling
    sigCapFor(spark, sfDir)
      .select(col("url"), col("head_full"), col("tail_full"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_sig_full")
    // reverified measures at the LOW slider value (v=70): the never-gated
    // stratum's (inter, union) are now filled in; the oracle re-derives the
    // decision at the new gate from the integers, never the matched flag
    reverifiedLowFor(spark, sfDir)
      .select(col("url_a"), col("url_b"),
        col("sim_bits").cast("long").as("sim_bits"),
        col("len_mod").cast("long").as("len_mod"),
        col("jac_inter"), col("jac_union"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_pairs_exact_low")
    // substring-pass raw measures: the oracle re-derives matched =
    // sim_bits >= thr OR overlap_len >= minSubstringOverlap + the closure
    val resS = pipelineSubFor(spark, sfDir)
    resS.pairs.select(col("url_a"), col("url_b"),
      col("sim_bits").cast("long").as("sim_bits"),
      col("overlap_len").cast("long").as("overlap_len"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_pairs_ss")
    exportSigs(resS, "wt_sigs_ss")
    // grid-mode (2x2) raw measures: fingerprint-only decision
    val resG = pipelineGridFor(spark, sfDir)
    resG.pairs.select(col("url_a"), col("url_b"),
      col("sim_bits").cast("long").as("sim_bits"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_pairs_grid")
    exportSigs(resG, "wt_sigs_grid")
    // widest grid mode (4x3) raw measures
    val resG43 = pipelineGrid43For(spark, sfDir)
    resG43.pairs.select(col("url_a"), col("url_b"),
      col("sim_bits").cast("long").as("sim_bits"))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/wt_pairs_grid43")
    exportSigs(resG43, "wt_sigs_grid43")
    DedupOps.simhashes(t(spark, sfDir, "documents"), k = 3, cfg)
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/doc_simhashes")
    // minhash signatures + band keys: the hash chains are the only non-SQL
    // step of q_minhash_est; DuckDB re-derives band join, candidate dedup,
    // the agreement estimate, and the threshold from these rows
    DedupOps.minhashFingerprints(t(spark, sfDir, "documents"), k = 3, cfg)
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/mh_fp")
    Multimodal.frameHashes(Multimodal.syntheticMedia(t(spark, sfDir, "documents")))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/media_frame_hashes")
    // the only non-SQL half of q_ann_lsh is the hyperplane sign-sketch
    // (XXH64-seeded); export the per-vector bucket keys (same params as
    // AnnOps.lshTopK's defaults) and DuckDB re-derives EVERYTHING downstream:
    // multi-probe key expansion, bucket join, candidate dedup, cosine
    // scoring, window ranking — the q_simhash_dedup pattern
    AnnOps.hyperplaneSketch(t(spark, sfDir, "embeddings"), nBits = 12, seed = 42L)
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/ann_buckets")
    // the only non-SQL piece of q_ann_ivf is the k-means quantizer (its
    // training is bit-deterministic — sorted folds — so this re-train equals
    // the query run's model exactly); export the inverted-list assignment
    // and the per-query probe lists (same params as AnnOps.ivfTopK's
    // defaults) and DuckDB re-derives candidates, cosine scoring, and
    // ranking — the q_ann_lsh pattern
    val ivfCents = AnnOps.ivfTrain(t(spark, sfDir, "embeddings"))
    AnnOps.ivfAssign(t(spark, sfDir, "embeddings"), ivfCents)
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/ann_ivf_cells")
    AnnOps.ivfProbes(t(spark, sfDir, "embeddings"), ivfCents,
      nQueries = AnnOps.IvfNQueries, nProbes = AnnOps.IvfNProbes)
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/ann_ivf_probes")
  }

  /** Shared DuckDB prelude for the webtext oracles: re-derives exact groups
    * (min-url rep per text_md5), transitive closure of matched pairs plus
    * member->rep edges (recursive CTE), cluster ids (= component min url) and
    * the keeper ranking — independently of the Spark union-find/window
    * implementation, from the raw measures Verify exports to {AUX}. */
  private def wtCteWith(mpSql: String, sigsTable: String = "wt_sigs"): String =
    s"""WITH RECURSIVE
      |sigs AS (SELECT * FROM read_parquet('{AUX}/$sigsTable/*.parquet')),
      |mp AS ($mpSql),
      |grp AS (SELECT url, min(url) OVER (PARTITION BY text_md5) AS rep_url FROM sigs),
      |medges AS (SELECT url AS u, rep_url AS v FROM grp WHERE url <> rep_url),
      |e0 AS (SELECT url_a AS u, url_b AS v FROM mp UNION SELECT u, v FROM medges),
      |edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach(u, v) AS (SELECT u, v FROM edges
      |                UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |labels AS (SELECT u AS url, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
      |clus AS (
      |  SELECT s.url, coalesce(l.cluster_id, s.url) AS cluster_id,
      |         s.size, s.text_len, s.warc_ts
      |  FROM sigs s LEFT JOIN labels l ON s.url = l.url),
      |ranked AS (
      |  SELECT url, cluster_id, size, text_len, warc_ts,
      |    row_number() OVER (PARTITION BY cluster_id
      |      ORDER BY size DESC, text_len DESC, warc_ts ASC, url ASC) AS rn
      |  FROM clus)
      |""".stripMargin

  private val wtClusterCte: String = wtCteWith(
    "SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet') WHERE matched")

  /** Exact-mode edges: `matched` is RE-DERIVED by the oracle from the raw
    * integer measures — the comparison.cpp:141-147 kernel in SQL: gate at
    * sim_bits >= max(thr_bits, 44), then inter/union + len_mod/64 > thr.
    * The double division of the same two integers is IEEE-identical on both
    * engines, so the decision is bit-for-bit. */
  private val wtExactCte: String = wtCteWith(
    s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs_exact/*.parquet')
       | WHERE sim_bits >= ${cfgExact.exactVerifyGate}
       |   AND (CASE WHEN coalesce(jac_union, 0) > 0
       |        THEN jac_inter / CAST(jac_union AS DOUBLE) ELSE 0.0 END)
       |       + len_mod / 64.0 > ${cfgExact.jaccardThreshold}""".stripMargin,
    sigsTable = "wt_sigs_exact")

  /** Substring-mode edges: fingerprint threshold OR verbatim overlap —
    * comparison.cpp's match decision with the structural (SSIM-like) pass
    * rendered as the suffix-array overlap length (SURVEY §2.8 V4). */
  private val wtSubCte: String = wtCteWith(
    s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs_ss/*.parquet')
       | WHERE sim_bits >= ${cfgSub.simBitsThreshold}
       |    OR coalesce(overlap_len, 0) >= ${cfgSub.minSubstringOverlap}""".stripMargin,
    sigsTable = "wt_sigs_ss")

  /** Grid-mode edges: single-slot fingerprint decision at the run threshold. */
  private val wtGridCte: String = wtCteWith(
    s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs_grid/*.parquet')
       | WHERE sim_bits >= ${cfgGrid.simBitsThreshold}""".stripMargin,
    sigsTable = "wt_sigs_grid")

  /** 4x3 grid-mode edges: same single-slot fingerprint decision. */
  private val wtGrid43Cte: String = wtCteWith(
    s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs_grid43/*.parquet')
       | WHERE sim_bits >= ${cfgGrid43.simBitsThreshold}""".stripMargin,
    sigsTable = "wt_sigs_grid43")

  /** DuckDB equivalents for the SQL-expressible queries. Column names, order,
    * and types are aligned with the Spark side (aggregates cast to BIGINT;
    * every query fully ORDER BY'd). '{AUX}' is substituted by Verify with the
    * absolute path of the aux-export dir (auxExport above). */
  def oracleSql: Map[String, String] = Map(
    "q_scan_filter" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_union_sources" ->
      """SELECT name FROM (
        |  SELECT r_name AS name FROM region
        |  UNION ALL
        |  SELECT n_name AS name FROM nation
        |) ORDER BY name""".stripMargin,

    "q_ci_distinct" ->
      """SELECT lower(c_mktsegment) AS seg, CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1 ORDER BY seg""".stripMargin,

    "q_hamming_filter" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(64 - bit_count(xor(o_orderkey, o_custkey)) AS BIGINT) AS sim_bits
        |FROM orders
        |WHERE 64 - bit_count(xor(o_orderkey, o_custkey)) >= 58
        |ORDER BY o_orderkey""".stripMargin,

    "q_reclaimable_agg" ->
      """SELECT l_orderkey,
        |       CAST(sum(least(l_partkey, l_suppkey)) AS BIGINT) AS reclaim,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_keeper_window" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders
        |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_md5_identity" ->
      """SELECT c_custkey, md5(concat(c_name, '_', CAST(c_custkey AS VARCHAR))) AS content_id
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_cluster_metrics" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(o_orderdate) AS first_seen, max(o_orderdate) AS last_seen
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_topk_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    // null text = UNKNOWN content, never a duplicate: each such row is its
    // own canonical singleton (mirrors DedupOps.exactDedup's rule — the
    // fixture has no null texts today, but the oracle must not diverge the
    // day one appears)
    "q_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_md5,
        |       CAST(CASE WHEN text IS NULL THEN 1
        |            ELSE row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
        |            END AS BIGINT) AS dup_rank,
        |       (CASE WHEN text IS NULL THEN 1
        |        ELSE row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
        |        END = 1) AS is_canonical
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,

    // RE2 (DuckDB) has no lookarounds, so the Spark side's zero-width split
    // boundaries are reproduced by INSERTING a space at each boundary with
    // capture-group replaces, then counting non-empty whitespace tokens:
    // letter<->digit, lower->UPPER, and before every punctuation char.
    // \x0B appears explicitly next to every \s: Java's \s includes vertical
    // tab, RE2's does not — without it the oracle counts a VT as an extra
    // punctuation token (engine-class divergence, round-5 review).
    "q_subword_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |      '([A-Za-z])([0-9])', '\1 \2', 'g'),
        |      '([0-9])([A-Za-z])', '\1 \2', 'g'),
        |      '([a-z])([A-Z])', '\1 \2', 'g'),
        |      '([^A-Za-z0-9\s\x0B])', ' \1', 'g'),
        |    '[\s\x0B]+'), x -> x <> '')) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_signals" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars_m,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
        |       CAST(len(list_filter(string_split(text, ' '),
        |            x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS n_stopwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_agg" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_ann_brute" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
        |                    b.vec_id ASC) AS BIGINT) AS rank
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
        |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_ann_lsh" ->
      """WITH sk AS (SELECT * FROM read_parquet('{AUX}/ann_buckets/*.parquet')),
        |qb AS (
        |  SELECT vec_id AS query_id,
        |    CASE WHEN p < 0 THEN bucket
        |         ELSE xor(bucket, CAST(1 AS BIGINT) << p) END AS bucket
        |  FROM sk CROSS JOIN (SELECT unnest([-1,0,1,2,3]) AS p) probes
        |  WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT q.query_id, s.vec_id
        |  FROM qb q JOIN sk s ON q.bucket = s.bucket
        |  WHERE s.vec_id <> q.query_id),
        |scored AS (
        |  SELECT c.query_id, c.vec_id,
        |    CAST(row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
        |               c.vec_id ASC) AS BIGINT) AS rank
        |  FROM cand c
        |  JOIN embeddings a ON a.vec_id = c.query_id
        |  JOIN embeddings b ON b.vec_id = c.vec_id)
        |SELECT query_id, vec_id AS neighbor_id, rank
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_ann_ivf" ->
      """WITH asg AS (SELECT * FROM read_parquet('{AUX}/ann_ivf_cells/*.parquet')),
        |qp AS (SELECT * FROM read_parquet('{AUX}/ann_ivf_probes/*.parquet')),
        |cand AS (
        |  SELECT DISTINCT q.query_id, a.vec_id
        |  FROM qp q JOIN asg a USING (cell)
        |  WHERE a.vec_id <> q.query_id),
        |scored AS (
        |  SELECT c.query_id, c.vec_id,
        |    CAST(row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
        |               c.vec_id ASC) AS BIGINT) AS rank
        |  FROM cand c
        |  JOIN embeddings a ON a.vec_id = c.query_id
        |  JOIN embeddings b ON b.vec_id = c.vec_id)
        |SELECT query_id, vec_id AS neighbor_id, rank
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,

    "q_doc_fingerprints" ->
      """SELECT doc_id, content_md5, CAST(i AS BIGINT) AS win_idx,
        |       md5(substring(text, CAST(i*64+1 AS INT), 64)) AS win_md5
        |FROM (SELECT doc_id, text, md5(text) AS content_md5,
        |        unnest(generate_series(0, greatest((length(text)-1)//64, 0))) AS i
        |      FROM documents)
        |ORDER BY doc_id, win_idx""".stripMargin,

    "q_lang_id" ->
      """SELECT doc_id, lang AS lang_declared,
        |  CASE
        |    WHEN en >= greatest(de, fr, es) AND en > 0 THEN 'en'
        |    WHEN de >= greatest(fr, es) AND de > 0 THEN 'de'
        |    WHEN fr >= es AND fr > 0 THEN 'fr'
        |    WHEN es > 0 THEN 'es'
        |    ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(lower(text),' '), x -> x IN ('the','a','of','and','to','is','in'))) AS en,
        |    len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','das','und','ist','nicht'))) AS de,
        |    len(list_filter(string_split(lower(text),' '), x -> x IN ('le','la','et','les','des','est'))) AS fr,
        |    len(list_filter(string_split(lower(text),' '), x -> x IN ('el','los','las','es','y','una'))) AS es
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """SELECT doc_id,
        |  CAST(floor((least(ntok/100.0, 1.0) * 0.4
        |    + (1.0 - least(punct / greatest(ntok, 1.0), 1.0)) * 0.3
        |    + least(stop * 20.0 / greatest(ntok, 1.0), 1.0) * 0.3) * 10000.0) AS BIGINT) AS quality_bp
        |FROM (SELECT doc_id,
        |        CAST(len(string_split(text,' ')) AS DOUBLE) AS ntok,
        |        CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) AS punct,
        |        CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to'))) AS DOUBLE) AS stop
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 1)),
        |      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
        |pr AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_size,
        |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS union_size
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT doc_id_a, doc_id_b, inter_size, union_size FROM pr
        |WHERE inter_size * 2 >= union_size * 1
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT source AS block, doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 1)),
        |      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        |  FROM (SELECT source, doc_id, string_split(text,' ') AS t FROM documents)),
        |pr AS (
        |  SELECT a.block AS block, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_size,
        |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS union_size
        |  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id)
        |SELECT block, doc_id_a, doc_id_b, inter_size, union_size FROM pr
        |WHERE inter_size * 20 >= union_size * 1
        |ORDER BY block, doc_id_a, doc_id_b""".stripMargin,

    "q_minhash_est" ->
      """WITH fp AS (SELECT * FROM read_parquet('{AUX}/mh_fp/*.parquet')),
        |bnd AS (
        |  SELECT doc_id, i AS band_id, bands[i] AS key
        |  FROM fp, unnest(generate_series(1, len(bands))) AS t(i)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        |  FROM bnd a JOIN bnd b ON a.band_id = b.band_id AND a.key = b.key
        |  WHERE a.doc_id < b.doc_id),
        |est AS (
        |  SELECT c.doc_id_a, c.doc_id_b,
        |    len(list_filter(generate_series(1, len(fa.minhash)),
        |        i -> fa.minhash[i] = fb.minhash[i]))
        |      / CAST(len(fa.minhash) AS DOUBLE) AS est_jaccard
        |  FROM cand c
        |  JOIN fp fa ON fa.doc_id = c.doc_id_a
        |  JOIN fp fb ON fb.doc_id = c.doc_id_b)
        |SELECT doc_id_a, doc_id_b, est_jaccard FROM est
        |WHERE est_jaccard >= 0.5
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // simhash = 0 is the invalid/low-entropy sentinel, excluded from pairing
    // on both sides (same rule as the Spark operator)
    "q_simhash_dedup" ->
      """WITH s AS (SELECT * FROM read_parquet('{AUX}/doc_simhashes/*.parquet')
        |           WHERE simhash <> 0)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    "q_embedding_dup" ->
      """SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY vec_id_a, vec_id_b""".stripMargin,

    "q_multimodal_frames" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(f.idx AS BIGINT) AS frame_idx,
        |       CAST(f.pct AS BIGINT) AS pos_pct
        |FROM documents, (VALUES (0, 8), (1, 96)) AS f(idx, pct)
        |ORDER BY media_id, frame_idx""".stripMargin,

    "q_media_fingerprints" ->
      """SELECT media_id,
        |  max(CASE WHEN frame_idx = 0 THEN frame_hash END) AS hash_head,
        |  max(CASE WHEN frame_idx = 1 THEN frame_hash END) AS hash_tail
        |FROM read_parquet('{AUX}/media_frame_hashes/*.parquet')
        |GROUP BY media_id ORDER BY media_id""".stripMargin,

    "q_webtext_clusters" ->
      (wtClusterCte +
        """SELECT url, cluster_id, (rn = 1) AS is_keeper FROM ranked ORDER BY url"""),

    // the incremental run is oracled against the ONE-SHOT closure: identical
    // SQL to q_webtext_clusters, derived from the default pipeline's exports
    "q_incremental_clusters" ->
      (wtClusterCte +
        """SELECT url, cluster_id, (rn = 1) AS is_keeper FROM ranked ORDER BY url"""),

    "q_webtext_exact" ->
      (wtExactCte +
        """SELECT url, cluster_id, (rn = 1) AS is_keeper FROM ranked ORDER BY url"""),

    "q_webtext_substring" ->
      (wtSubCte +
        """SELECT url, cluster_id, (rn = 1) AS is_keeper FROM ranked ORDER BY url"""),

    "q_webtext_grid" ->
      (wtGridCte +
        """SELECT url, cluster_id, (rn = 1) AS is_keeper FROM ranked ORDER BY url"""),

    "q_webtext_grid43" ->
      (wtGrid43Cte +
        """SELECT url, cluster_id, (rn = 1) AS is_keeper FROM ranked ORDER BY url"""),

    "q_webtext_actions" ->
      (wtClusterCte +
        """SELECT url, cluster_id,
          |  CASE WHEN rn = 1 THEN 'keep' ELSE 'drop' END AS action,
          |  CAST(rn AS BIGINT) AS rank_in_cluster,
          |  CAST(CASE WHEN rn = 1 THEN 0 ELSE size END AS BIGINT) AS reclaim_bytes
          |FROM ranked ORDER BY url""".stripMargin),

    "q_webtext_top_reclaimable" ->
      (wtClusterCte +
        """SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(size) AS BIGINT) AS total_bytes,
          |  CAST(sum(size) - max(CASE WHEN rn = 1 THEN size ELSE 0 END) AS BIGINT) AS reclaimable_bytes,
          |  min(warc_ts) AS first_seen
          |FROM ranked GROUP BY cluster_id HAVING count(*) > 1
          |ORDER BY reclaimable_bytes DESC, cluster_id ASC LIMIT 20""".stripMargin),

    "q_webtext_match_report" ->
      """WITH mp AS (SELECT * FROM read_parquet('{AUX}/wt_pairs/*.parquet') WHERE matched),
        |fm AS (SELECT url_a, arg_min(least(size_a, size_b), url_b) AS first_min_size
        |       FROM mp GROUP BY url_a)
        |SELECT CAST(count(*) AS BIGINT) AS docs_with_match,
        |       CAST(sum(first_min_size) AS BIGINT) AS reclaimable_bytes
        |FROM fm""".stripMargin,

    // S12 move sink: keeper rank + quarantine target re-derived from the
    // closure (mp itself re-derived at the threshold, not the raw flag)
    "q_actions_move" ->
      (wtCteWith(s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet')
           | WHERE sim_bits >= ${cfg.simBitsThreshold}""".stripMargin) +
        """SELECT url, cluster_id,
          |  CASE WHEN rn = 1 THEN 'keep' ELSE 'move' END AS action,
          |  CASE WHEN rn = 1 THEN NULL ELSE '/dedup/dropped/' || url END AS target,
          |  CAST(rn AS BIGINT) AS rank_in_cluster,
          |  CAST(CASE WHEN rn = 1 THEN 0 ELSE size END AS BIGINT) AS reclaim_bytes
          |FROM ranked ORDER BY url""".stripMargin),

    // S13 swap sink: two identity-exchange rows per matched pair
    "q_actions_swap" ->
      s"""WITH mp AS (SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet')
         |            WHERE sim_bits >= ${cfg.simBitsThreshold})
         |SELECT url, action, target FROM (
         |  SELECT url_a AS url, 'swap' AS action, url_b AS target FROM mp
         |  UNION ALL SELECT url_b, 'swap', url_a FROM mp)
         |ORDER BY url, target""".stripMargin,

    // A3 action totals over the re-derived keeper election
    "q_action_summary" ->
      (wtCteWith(s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet')
           | WHERE sim_bits >= ${cfg.simBitsThreshold}""".stripMargin) +
        """SELECT CASE WHEN rn = 1 THEN 'keep' ELSE 'drop' END AS action,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE size END) AS BIGINT) AS bytes
          |FROM ranked GROUP BY 1 ORDER BY action""".stripMargin),

    // A2/S14 per-run summary: each metric independently re-derived
    "q_run_summary" ->
      (wtCteWith(s"""SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet')
           | WHERE sim_bits >= ${cfg.simBitsThreshold}""".stripMargin) +
        """SELECT metric, value FROM (
          |  SELECT 'candidate_pairs' AS metric,
          |    CAST((SELECT count(*) FROM read_parquet('{AUX}/wt_pairs/*.parquet')) AS BIGINT) AS value
          |  UNION ALL SELECT 'matched_pairs', CAST((SELECT count(*) FROM mp) AS BIGINT)
          |  UNION ALL SELECT 'exact_groups',
          |    CAST((SELECT count(DISTINCT text_md5) FROM sigs) AS BIGINT)
          |  UNION ALL SELECT 'dup_clusters', CAST((SELECT count(*) FROM
          |    (SELECT cluster_id FROM clus GROUP BY cluster_id HAVING count(*) > 1)) AS BIGINT)
          |  UNION ALL SELECT 'docs_in_dup_clusters', CAST((SELECT coalesce(sum(c), 0) FROM
          |    (SELECT count(*) AS c FROM clus GROUP BY cluster_id HAVING count(*) > 1)) AS BIGINT)
          |) ORDER BY metric""".stripMargin),

    // W2 progress position at the fixed cursor
    "q_progress" ->
      s"""WITH p AS (SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet')),
         |a AS (SELECT
         |  CAST(coalesce(sum(CASE WHEN url_a < '$progressCursor'
         |         OR (url_a = '$progressCursor' AND url_b <= '$progressCursor')
         |       THEN 1 END), 0) AS BIGINT) AS position,
         |  CAST(count(*) AS BIGINT) AS total FROM p)
         |SELECT position, total,
         |  CASE WHEN total = 0 THEN 0.0
         |       ELSE position / CAST(total AS DOUBLE) END AS fraction
         |FROM a""".stripMargin,

    // X2-X5 scoring kernel re-derived wholesale from RAW simhashes: hamming
    // via xor+bit_count, both-null guard, length modifier, 64-clamp, cutEnds
    // best-of-two — bit-for-bit integer arithmetic on both engines
    "q_pair_scores" ->
      s"""WITH s AS (SELECT * FROM read_parquet('{AUX}/wt_sigs/*.parquet')),
         |p AS (SELECT url_a, url_b FROM read_parquet('{AUX}/wt_pairs/*.parquet')),
         |j AS (SELECT p.url_a, p.url_b,
         |        a.simhash_head AS ha_h, a.simhash_tail AS ha_t,
         |        b.simhash_head AS hb_h, b.simhash_tail AS hb_t,
         |        CASE WHEN abs(a.text_len - b.text_len) <= ${cfg.lenTolChars}
         |             THEN ${cfg.sameLenBonus} ELSE -${cfg.diffLenPenalty} END AS lm
         |      FROM p JOIN s a ON p.url_a = a.url JOIN s b ON p.url_b = b.url),
         |sc AS (SELECT url_a, url_b, lm,
         |        CASE WHEN ha_h IS NULL AND hb_h IS NULL THEN 0
         |             ELSE least(64 - bit_count(xor(coalesce(ha_h, CAST(0 AS BIGINT)),
         |                                           coalesce(hb_h, CAST(0 AS BIGINT)))) + lm, 64) END AS sh,
         |        CASE WHEN ha_t IS NULL AND hb_t IS NULL THEN 0
         |             ELSE least(64 - bit_count(xor(coalesce(ha_t, CAST(0 AS BIGINT)),
         |                                           coalesce(hb_t, CAST(0 AS BIGINT)))) + lm, 64) END AS st
         |      FROM j)
         |SELECT url_a, url_b, CAST(lm AS BIGINT) AS len_mod,
         |  CAST(greatest(sh, st) AS BIGINT) AS sim_bits,
         |  greatest(sh, st) >= ${cfg.simBitsThreshold} AS matched
         |FROM sc ORDER BY url_a, url_b""".stripMargin,

    // S7/S8 store round-trip vs raw bytes: every parquet file under the
    // aux store's data dir, globbed directly — no manifest on this side
    "q_store_roundtrip" ->
      """SELECT url, content_id, text_md5,
        |  CAST(size AS BIGINT) AS size, CAST(text_len AS BIGINT) AS text_len
        |FROM read_parquet('{AUX}/store_s8/data/*/*/*.parquet')
        |ORDER BY url""".stripMargin,

    // S9 delete semantics re-derived: retained set = pre-delete raw files
    // minus the condition, computed on the DuckDB side from store_s8's bytes
    "q_store_delete" ->
      """SELECT url, content_id, text_md5,
        |  CAST(size AS BIGINT) AS size, CAST(text_len AS BIGINT) AS text_len
        |FROM read_parquet('{AUX}/store_s8/data/*/*/*.parquet')
        |WHERE NOT (text_len % 3 = 0)
        |ORDER BY url""".stripMargin,

    // S15 GC re-derived: survivors = pre-GC on-disk dirs that some manifest
    // references, rows from the manifests of the aux twin (an independent
    // commit of the same frame, so commit determinism rides along). The
    // query side lists ACTUAL post-GC disk state; the collect/keep decision
    // itself never crosses.
    "q_store_gc" ->
      """WITH dirs AS (SELECT dir_label
        |              FROM read_parquet('{AUX}/store_gc_dirs/*.parquet')),
        |m AS (SELECT dir_label, CAST(sum(rows) AS BIGINT) AS rows_total
        |      FROM read_parquet('{AUX}/store_gc_manifest/*.parquet')
        |      GROUP BY 1)
        |SELECT d.dir_label, m.rows_total
        |FROM dirs d JOIN m USING (dir_label)
        |ORDER BY d.dir_label""".stripMargin,

    // X1/A4 SimHash construction re-derived wholesale: per-bit majority
    // votes over the raw shingle-hash arrays, the strict >0 rule, the
    // <minDistinct NULL sentinel and the ==0->1 flip — the whole kernel in
    // SQL (bit 63 via the sign to avoid a 1<<63 overflow)
    "q_simhash_construct" ->
      s"""WITH s AS (SELECT url, shingles_head, shingles_tail
         |           FROM read_parquet('{AUX}/wt_shingles/*.parquet')
         |           WHERE len(shingles_head) < ${cfg.maxStoredShinglesPerSlot}
         |             AND len(shingles_tail) < ${cfg.maxStoredShinglesPerSlot}),
         |bits AS (SELECT unnest(generate_series(0, 63)) AS bit),
         |hv AS (SELECT s.url, bits.bit,
         |         sum(CASE WHEN bits.bit = 63 THEN (CASE WHEN t.h < 0 THEN 1 ELSE -1 END)
         |                  WHEN (t.h & (CAST(1 AS BIGINT) << bits.bit)) <> 0 THEN 1
         |                  ELSE -1 END) AS v
         |       FROM s, unnest(s.shingles_head) AS t(h), bits
         |       GROUP BY s.url, bits.bit),
         |hh AS (SELECT url, CAST(sum(CASE WHEN v > 0 THEN
         |                CASE WHEN bit = 63 THEN CAST(-9223372036854775807 AS HUGEINT) - 1
         |                     ELSE CAST(CAST(1 AS BIGINT) << bit AS HUGEINT) END
         |              ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS hraw
         |       FROM hv GROUP BY url),
         |tv AS (SELECT s.url, bits.bit,
         |         sum(CASE WHEN bits.bit = 63 THEN (CASE WHEN t.h < 0 THEN 1 ELSE -1 END)
         |                  WHEN (t.h & (CAST(1 AS BIGINT) << bits.bit)) <> 0 THEN 1
         |                  ELSE -1 END) AS v
         |       FROM s, unnest(s.shingles_tail) AS t(h), bits
         |       GROUP BY s.url, bits.bit),
         |th AS (SELECT url, CAST(sum(CASE WHEN v > 0 THEN
         |                CASE WHEN bit = 63 THEN CAST(-9223372036854775807 AS HUGEINT) - 1
         |                     ELSE CAST(CAST(1 AS BIGINT) << bit AS HUGEINT) END
         |              ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS traw
         |       FROM tv GROUP BY url)
         |SELECT s.url,
         |  CASE WHEN len(s.shingles_head) < ${cfg.minDistinctShingles} THEN NULL
         |       WHEN coalesce(hh.hraw, 0) = 0 THEN 1 ELSE hh.hraw END AS simhash_head,
         |  CASE WHEN len(s.shingles_tail) < ${cfg.minDistinctShingles} THEN NULL
         |       WHEN coalesce(th.traw, 0) = 0 THEN 1 ELSE th.traw END AS simhash_tail
         |FROM s LEFT JOIN hh USING (url) LEFT JOIN th USING (url)
         |ORDER BY s.url""".stripMargin,

    // S5/F7 extraction re-derived wholesale from raw html: every <p> block's
    // inner text in document order, \n\n-joined, md5'd. The regex states the
    // extraction contract independently of the engine's hand-rolled scanner.
    "q_extraction" ->
      """SELECT url,
        |  md5(array_to_string(
        |        regexp_extract_all(html_str, '<p[^>]*>(.*?)</p>', 1),
        |        chr(10) || chr(10))) AS text_md5
        |FROM read_parquet('{AUX}/wt_html/*.parquet') ORDER BY url""".stripMargin,

    // F7 canonicalization + unescape re-derived wholesale: DuckDB rebuilds
    // the identical adversarial mess from documents.text (chr()/replace) and
    // states strip -> unescape (engine order, &amp; last) -> whitespace
    // collapse -> trim -> NFC entirely in its own functions
    "q_canonicalize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '<p id="z">' || '  ' || chr(9) ||
        |    replace(text, ' ', chr(9) || ' ' || chr(160)) ||
        |    chr(13) || chr(10) ||
        |    '&amp;lt; <b>x</b>, &quot;q&apos; &gt;&lt;&nbsp;e' || chr(769) ||
        |    ' &#65;&#x42;' || chr(11) || chr(12) || ' ' ||
        |    '</p><div>nav</div><p>ok' || chr(160) || 'x </p>' AS html
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, list_transform(
        |    regexp_extract_all(html, '(?s)<p[^>]*>(.*?)</p>', 1),
        |    x -> nfc_normalize(trim(regexp_replace(
        |           replace(replace(replace(replace(replace(replace(replace(replace(
        |             regexp_replace(x, '<[^>]*>', '', 'g'),
        |             '&#65;', 'A'), '&#x42;', 'B'),
        |             '&lt;', chr(60)), '&gt;', chr(62)), '&quot;', '"'),
        |             '&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |           '[' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)
        |               || chr(160) || ' ]+', ' ', 'g'), ' '))) AS blocks
        |  FROM m
        |)
        |SELECT doc_id,
        |  md5(array_to_string(blocks, chr(10) || chr(10))) AS canon_md5,
        |  CAST(length(array_to_string(blocks, chr(10) || chr(10))) AS BIGINT)
        |    AS canon_len
        |FROM b ORDER BY doc_id""".stripMargin,

    // F2-F5/X13 reject routing re-derived wholesale: the priority chain and
    // every threshold live in this SQL; the export carries only raw measures
    "q_rejects" ->
      """SELECT url,
        |  CASE WHEN text_len = 0 THEN 'empty_text'
        |       WHEN text_len > html_len THEN 'extract_anomaly'
        |       WHEN simhash_head IS NULL AND simhash_tail IS NULL THEN 'low_entropy'
        |       ELSE NULL END AS reject_reason
        |FROM read_parquet('{AUX}/wt_sig_raw/*.parquet') ORDER BY url""".stripMargin,

    // S10 version stamp: DuckDB's own md5() over the canonical config strings
    // (format re-stated here on purpose — drift in configFp's assembly or
    // hashing shows up as a value mismatch, core/GraftConfig.scala:160-169)
    "q_config_fp" -> {
      def canon(c: GraftConfig): String =
        s"graft4|k=${c.k}|perm=${c.numPerm}|mb=${c.minhashBands}|" +
          s"sb=${c.simhashBandBits}|mode=${c.samplingMode}|" +
          s"minShingles=${c.minDistinctShingles}|seed=${c.seed}|" +
          s"ssmod=${c.shingleSampleMod}|cap=${c.maxStoredShinglesPerSlot}|" +
          s"short=${c.shortSlotShingles}|" +
          s"payload=${if (c.exactVerify || c.substringPass) "full" else "pruned"}"
      val rows = configFpVariants
        .map { case (tag, c) => s"('$tag', '${canon(c)}')" }.mkString(", ")
      s"""SELECT tag, md5(str) AS fp FROM (VALUES $rows) AS t(tag, str)
         |ORDER BY tag""".stripMargin
    },

    // X12 cap + ss sampling re-derived wholesale from the uncapped chains:
    // bottom-k per slot (sorted-distinct arrays => smallest k), and the
    // ss keys = distinct mod-m survivors of the head∪tail union, ascending
    "q_sig_cap" ->
      s"""WITH f AS (SELECT url, head_full, tail_full
         |           FROM read_parquet('{AUX}/wt_sig_full/*.parquet')),
         |hx AS (SELECT url, t.h AS h FROM f, unnest(f.head_full) AS t(h)),
         |tx AS (SELECT url, t.h AS h FROM f, unnest(f.tail_full) AS t(h)),
         |hc AS (SELECT url, 'head' AS slot,
         |         CAST(row_number() OVER (PARTITION BY url ORDER BY h) AS BIGINT) AS idx, h
         |       FROM hx QUALIFY row_number() OVER (PARTITION BY url ORDER BY h) <= $sigCapTestCap),
         |tc AS (SELECT url, 'tail' AS slot,
         |         CAST(row_number() OVER (PARTITION BY url ORDER BY h) AS BIGINT) AS idx, h
         |       FROM tx QUALIFY row_number() OVER (PARTITION BY url ORDER BY h) <= $sigCapTestCap),
         |ssu AS (SELECT DISTINCT url, h
         |        FROM (SELECT url, h FROM hx UNION ALL SELECT url, h FROM tx)
         |        WHERE h % ${cfg.shingleSampleMod} = 0),
         |ss AS (SELECT url, 'ss' AS slot,
         |         CAST(row_number() OVER (PARTITION BY url ORDER BY h) AS BIGINT) AS idx, h
         |       FROM ssu)
         |SELECT url, slot, idx, h FROM hc
         |UNION ALL SELECT url, slot, idx, h FROM tc
         |UNION ALL SELECT url, slot, idx, h FROM ss
         |ORDER BY url, slot, idx""".stripMargin,

    "q_rethreshold" ->
      """SELECT url_a, url_b, CAST(sim_bits AS BIGINT) AS sim_bits
        |FROM read_parquet('{AUX}/wt_pairs/*.parquet')
        |WHERE sim_bits >= 51
        |ORDER BY url_a, url_b""".stripMargin,

    "q_rethreshold_exact" -> {
      val v = 92
      val gate = math.max(math.round(64.0 * v / 100.0).toInt, 44)
      s"""SELECT url_a, url_b, CAST(sim_bits AS BIGINT) AS sim_bits
         |FROM read_parquet('{AUX}/wt_pairs_exact/*.parquet')
         |WHERE jac_union IS NOT NULL AND sim_bits >= $gate
         |  AND (CASE WHEN jac_union > 0
         |       THEN jac_inter / CAST(jac_union AS DOUBLE) ELSE 0.0 END)
         |      + len_mod / 64.0 > ${v / 100.0}
         |ORDER BY url_a, url_b""".stripMargin
    },

    // the low-slider reverify: same re-derivation, but over the REVERIFIED
    // export whose [newGate, oldGate) stratum carries freshly computed
    // (inter, union) integers — the oracle applies the comparison.cpp:141-147
    // kernel at v=70 (gate max(45,44)=45) and must reproduce Spark's matched
    // set bit-for-bit
    "q_rethreshold_exact_low" -> {
      val v = 70
      val gate = math.max(math.round(64.0 * v / 100.0).toInt, 44)
      s"""SELECT url_a, url_b, CAST(sim_bits AS BIGINT) AS sim_bits
         |FROM read_parquet('{AUX}/wt_pairs_exact_low/*.parquet')
         |WHERE jac_union IS NOT NULL AND sim_bits >= $gate
         |  AND (CASE WHEN jac_union > 0
         |       THEN jac_inter / CAST(jac_union AS DOUBLE) ELSE 0.0 END)
         |      + len_mod / 64.0 > ${v / 100.0}
         |ORDER BY url_a, url_b""".stripMargin
    },

    "q_display_formats" ->
      """SELECT o_orderkey,
        |  printf('%02d:%02d:%02d.%03d',
        |    (o_orderkey % 86400000) // 3600000,
        |    (o_orderkey % 86400000) // 60000 % 60,
        |    (o_orderkey % 86400000) // 1000 % 60,
        |    (o_orderkey % 86400000) % 1000) AS hhmmss,
        |  CASE
        |    WHEN (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1) >= 1073741824 THEN printf('%.1f GB', (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1) / 1073741824.0)
        |    WHEN (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1) >= 1048576 THEN printf('%.1f MB', (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1) / 1048576.0)
        |    WHEN (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1) >= 1024 THEN printf('%.1f kB', (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1) / 1024.0)
        |    ELSE printf('%d B', (CAST(floor(o_totalprice * 1000) AS BIGINT) * 2 + 1))
        |  END AS size_h,
        |  concat(
        |    CASE WHEN o_custkey * 1000 // 3600000 > 0 THEN printf('%dh', o_custkey * 1000 // 3600000) ELSE '' END,
        |    CASE WHEN o_custkey * 1000 // 60000 % 60 > 0 THEN printf('%dm', o_custkey * 1000 // 60000 % 60) ELSE '' END,
        |    CASE WHEN (o_custkey * 1000 // 1000 % 60 > 0) OR (o_custkey * 1000 // 3600000 = 0 AND o_custkey * 1000 // 60000 % 60 = 0)
        |         THEN printf('%ds', o_custkey * 1000 // 1000 % 60) ELSE '' END) AS dur_h,
        |  printf('%.1f Mbps', ((o_custkey % 9000) * 2 + 10001) / 1000.0) AS bitrate_h,
        |  printf('%d kbps', o_custkey % 9999) AS bitrate_lo
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
