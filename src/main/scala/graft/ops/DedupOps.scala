package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** Deduplication operator family over a generic `documents` table
  * (doc_id, text, ...) — the training-data-pipeline rendering of the engine's
  * core near-dup machinery, each exposed as a standalone operator:
  * exact (hash group), MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine. The web-text pipeline (graft.spark.Pipeline) composes the same
  * primitives with the reference's exact semantics; these entry points make
  * them reusable on any text column.
  *
  * Session hygiene: the near-dup operators persist internal frames
  * (fingerprints, n-gram sets) that must outlive the returned lazy
  * DataFrame; long-lived sessions running many operators should call
  * [[cleanupCaches]] after materializing each result (Bench and Verify do),
  * or the accumulated plan references are only reclaimed by LRU block
  * eviction, never the JVM references themselves.
  */
object DedupOps {

  /** Frames persisted internally by the near-dup operators (fingerprints,
    * n-gram sets). They must stay cached while the RETURNED lazy DataFrame
    * executes, so the operators cannot unpersist them eagerly; callers that
    * run many operators in one session own cleanup — call `cleanupCaches()`
    * after materializing each result (Bench and Verify do). Otherwise LRU
    * eviction reclaims them under memory pressure. */
  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private def registerPersist(df: DataFrame): DataFrame = {
    persistedFrames.add(df.persist())
    df
  }
  def cleanupCaches(): Unit = {
    var df = persistedFrames.poll()
    while (df != null) { df.unpersist(false); df = persistedFrames.poll() }
  }

  /** Exact dedup: canonical row = min doc_id per content hash — a ranking
    * window over content_md5 (one hash shuffle; the sort is per-key within
    * partitions, never global), so every row keeps its dup_rank/is_canonical
    * flags rather than collapsing to one representative. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))
    // null text -> null content_md5: UNKNOWN content, never a proven
    // duplicate of anything — each such row is its own canonical singleton
    // (the window would otherwise pool all null hashes into one group and
    // mark distinct unknown documents as duplicates of each other)
    docs.select(col("doc_id"), md5(to_binary(col("text"), lit("utf-8"))).as("content_md5"))
      .withColumn("dup_rank",
        when(col("content_md5").isNull, lit(1L))
          .otherwise(row_number().over(w).cast("long")))
      .withColumn("is_canonical", col("dup_rank") === 1L)
      .orderBy("doc_id")
  }

  /** Chained minhash band keys — THE single definition of the
    * slot-fold-into-seed hash chain for every banded operator here
    * (splitNgramBands + ngramJaccard via [[bandKeysR2]], and the
    * configurable-rows banding in [[fingerprint]]): a drift between copies
    * would silently change candidate recall for one operator only.
    * Null signature (too few shingles) -> no band keys. */
  private def chainedBandKeys(sig: Array[Long], nBands: Int, rows: Int,
                              seed: Long): Array[Long] =
    if (sig == null) Array.emptyLongArray
    else Array.tabulate(nBands) { b =>
      var acc = seed + b
      var i = 0
      while (i < rows) { acc = XXH64.hashLong(sig(b * rows + i), acc); i += 1 }
      acc
    }

  /** Dense r=2 instance of [[chainedBandKeys]]. */
  private def bandKeysR2(sig: Array[Long], cfg: GraftConfig): Array[Long] =
    chainedBandKeys(sig, cfg.numPerm / 2, 2, cfg.seed)

  /** Per-doc fingerprint record used by the near-dup variants. */
  private[ops] final case class DocFp(
      doc_id: Long, simhash: Long, minhash: Array[Long],
      bands: Array[Long], shingles: Array[Long], n_tokens: Int)

  private[ops] def fingerprint(docs: DataFrame, cfg: GraftConfig, k: Int): Dataset[DocFp] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val sh = new Shingler(k, cfg.seed)
      val mh = new MinHasher(cfg.numPerm, cfg.seed)
      it.map { case (id, text) =>
        val toks = Extract.tokens(text)
        val th = sh.tokenHashes(toks)
        val shingles = sh.hashesOf(th, 0, th.length)
        val sim = SimHash64.of(shingles, 1)
        val sig = mh.signature(shingles)
        val bands: Array[Long] =
          chainedBandKeys(sig, cfg.minhashBands, cfg.minhashRowsPerBand, cfg.seed)
        DocFp(id, sim, if (sig == null) Array.emptyLongArray else sig, bands, shingles, toks.length)
      }
    }
  }

  /** MinHash + LSH near-dup: shingle -> minhash -> band -> bucket-join ->
    * estimated-Jaccard filter. Returns candidate pairs with the estimate. */
  def minhashLsh(docs: DataFrame, minJaccard: Double = 0.8, k: Int = 3,
                 cfg: GraftConfig = GraftConfig()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fp = registerPersist(fingerprint(docs, cfg, k).toDF())
    val bands = fp.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_id", "key")))
    val a = bands.toDF("doc_id_a", "band_id", "key")
    val b = bands.toDF("doc_id_b", "band_id", "key")
    val cand = a.join(b, Seq("band_id", "key"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b").distinct()
    val sigs = fp.select(col("doc_id"), col("minhash"))
    val withSigs = cand
      .join(sigs.toDF("doc_id_a", "mh_a"), "doc_id_a")
      .join(sigs.toDF("doc_id_b", "mh_b"), "doc_id_b")
    val est = udf((x: Seq[Long], y: Seq[Long]) => {
      var same = 0; var i = 0
      while (i < x.length) { if (x(i) == y(i)) same += 1; i += 1 }
      same.toDouble / x.length
    })
    withSigs.withColumn("est_jaccard", est(col("mh_a"), col("mh_b")))
      .filter(col("est_jaccard") >= minJaccard)
      .select("doc_id_a", "doc_id_b", "est_jaccard")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Per-doc (minhash signature, band keys) rows (exported for the harness's
    * DuckDB oracle of [[minhashLsh]]: the hash chains are the only non-SQL
    * step, so DuckDB re-derives everything downstream — band self-join,
    * candidate dedup, minhash-agreement estimate, threshold). */
  def minhashFingerprints(docs: DataFrame, k: Int = 3,
                          cfg: GraftConfig = GraftConfig()): DataFrame =
    fingerprint(docs, cfg, k).select(col("doc_id"), col("minhash"), col("bands"))

  /** Per-doc 64-bit SimHash fingerprints (exported for the harness's DuckDB
    * oracle: DuckDB recomputes the band join as a brute-force
    * bit_count(xor) <= maxHamming over these values). */
  def simhashes(docs: DataFrame, k: Int = 3,
                cfg: GraftConfig = GraftConfig()): DataFrame =
    fingerprint(docs, cfg, k).select(col("doc_id"), col("simhash"))

  /** SimHash near-dup: 64-bit fingerprints, pairs within `maxHamming`.
    * Candidates via `64/sliceBits` bit-slice bands; pigeonhole: S slices
    * guarantee every pair within Hamming S-1 shares a slice, so recall is
    * EXACTLY 1.0 whenever maxHamming <= 64/sliceBits - 1 (the default 8-bit
    * slices cover the default maxHamming 7 — oracle-checkable against
    * brute force). Wider slices trade guaranteed radius for key entropy at
    * huge corpora (SURVEY §2.3 J2 discussion). */
  def simhashDedup(docs: DataFrame, maxHamming: Int = 7, k: Int = 3,
                   cfg: GraftConfig = GraftConfig(), sliceBits: Int = 8): DataFrame = {
    require(64 % sliceBits == 0, "slices must tile 64 bits")
    val nSlices = 64 / sliceBits
    val mask = (1L << sliceBits) - 1
    // 0L is SimHash64's invalid/low-entropy sentinel (Fingerprint.scala:
    // "callers map 0L to a NULL column"), not a fingerprint: null/empty/
    // whitespace docs all produce it, and comparing sentinels would report
    // every such pair as hamming-0 dups AND pile them into one band bucket
    // (O(m^2) on content-free rows). The DuckDB oracle applies the same
    // simhash <> 0 rule.
    val fp = registerPersist(fingerprint(docs, cfg, k).toDF())
      .filter(col("simhash") =!= 0L)
    val slices = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until nSlices).map(i =>
        shiftrightunsigned(col("simhash"), i * sliceBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band_id", "key")))
    val a = slices.toDF("doc_id_a", "simhash_a", "band_id", "key")
    val b = slices.toDF("doc_id_b", "simhash_b", "band_id", "key")
    a.join(b, Seq("band_id", "key"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Whitespace-token n-gram DISTINCT set as a Column — built on `split` so a
    * SQL oracle (string_split + list_transform) reproduces the exact set.
    * Spans shorter than n collapse to one whole-span shingle, like
    * core.Shingler. NULL text -> NULL set (the family rule: unknown content
    * is never a proven duplicate — without the guard, `greatest` skips the
    * null length and `concat_ws` swallows the null slice, so null text
    * collapses to the set {""} and two null-text docs verify at jaccard 1);
    * the SQL side gets this for free (string_split(NULL) stays NULL). */
  private def ngramSetCol(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = split(text, " ")
    when(text.isNotNull,
      array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Dense r=2 minhash band keys computed over the SAME split-on-space
    * n-gram set the exact verifier measures. The candidate generator must
    * share the verifier's similarity space: shingling `Extract.tokens`
    * (whitespace-class, empties dropped) while verifying `split(text, ' ')`
    * n-grams diverges on text with tabs/newlines/space runs, so pairs above
    * the threshold in split-space could silently never be proposed (round-2
    * ADVICE). Tokenization, window shape (short spans collapse to one
    * whole-span shingle), and distinctness mirror `ngramSetCol` exactly;
    * each distinct n-gram string is XXH64-hashed before minhashing. */
  private def splitNgramBands(docs: DataFrame, n: Int, cfg: GraftConfig): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      val mh = new MinHasher(cfg.numPerm, cfg.seed)
      it.map {
        // null text: unknown content -> no band keys, never a candidate
        // (matches ngramSetCol's NULL set; without this, text.split NPEs)
        case (id, null) => (id, Array.emptyLongArray)
        case (id, text) =>
        val toks = text.split(" ", -1) // = Spark split(text, " "): keeps empties
        val upto = math.max(toks.length - (n - 1), 1)
        val seen = new java.util.HashSet[String]()
        val hashes = new scala.collection.mutable.ArrayBuffer[Long](upto)
        var i = 0
        while (i < upto) {
          val sb = new java.lang.StringBuilder
          val end = math.min(i + n, toks.length)
          var j = i
          while (j < end) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
          val ng = sb.toString
          if (seen.add(ng)) hashes += XXH64.hashString(ng, cfg.seed)
          i += 1
        }
        val sig = mh.signature(hashes.toArray)
        (id, bandKeysR2(sig, cfg))
      }
    }.toDF("doc_id", "bands")
  }

  /** MinHash-LSH near-dup with EXACT verification: dense r=2 minhash banding
    * over the split-space n-gram set proposes candidates
    * (P(miss) = (1-J^2)^(numPerm/2) — ~1e-8 at J=0.5, measured in the SAME
    * space the verifier uses), then each candidate is verified with exact
    * n-gram-set overlap emitted as INTEGER (intersection, union) sizes and
    * filtered at jaccard >= jacNum/jacDen in integer arithmetic —
    * bit-for-bit reproducible by a SQL oracle, no estimate and no float
    * threshold. */
  def minhashLshExact(docs: DataFrame, jacNum: Int = 1, jacDen: Int = 2,
                      k: Int = 3, cfg: GraftConfig = GraftConfig()): DataFrame = {
    val fp = registerPersist(splitNgramBands(docs, k, cfg))
    val bands = fp.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_id", "key")))
    val cand = bands.toDF("doc_id_a", "band_id", "key")
      .join(bands.toDF("doc_id_b", "band_id", "key"), Seq("band_id", "key"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b").distinct()
    val sets = docs.select(col("doc_id"), ngramSetCol(col("text"), k).as("ng"))
    cand
      .join(sets.toDF("doc_id_a", "ng_a"), "doc_id_a")
      .join(sets.toDF("doc_id_b", "ng_b"), "doc_id_b")
      // single-intersect gate (see ngramOverlapExact): integer-identical to
      // inter*den >= union*num, but the optimizer's predicate push into the
      // join condition evaluates array_intersect once per candidate, not
      // twice
      .filter(size(array_intersect(col("ng_a"), col("ng_b"))) * (jacDen + jacNum) >=
        (size(col("ng_a")) + size(col("ng_b"))) * jacNum)
      .withColumn("inter_size", size(array_intersect(col("ng_a"), col("ng_b"))).cast("long"))
      .withColumn("union_size",
        (size(col("ng_a")) + size(col("ng_b"))).cast("long") - col("inter_size"))
      .select("doc_id_a", "doc_id_b", "inter_size", "union_size")
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Exact n-gram overlap for pairs within a blocking key, as INTEGER
    * (intersection, union) sizes at jaccard >= jacNum/jacDen — the
    * SQL-oracle-friendly face of `ngramJaccard` (same all-pairs-within-block
    * shape, built-ins only so whole-stage codegen applies end-to-end).
    *
    * BY DESIGN all-pairs within each block (the exact verifier): there is no
    * maxBlockRows fallback here — a hot blocking key goes quadratic on one
    * join key. Callers with unbounded block sizes want `ngramJaccard` (its
    * banded in-block fallback bounds the hot key) and this only on the
    * survivors. NULL blocking keys pair with nothing (SQL equi-join
    * semantics): a null block means "unblocked", not "one shared block" —
    * same rule in ngramJaccard and embeddingCosineDup's blockCol path. */
  def ngramOverlapExact(docs: DataFrame, blockCol: String, n: Int = 3,
                        jacNum: Int = 1, jacDen: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    // Round-6 (guide §2.5 input skew): the whole quadratic join ran as ONE
    // task — the docs table is a single small parquet file, so the n-gram
    // projection, the broadcast build, and the join's stream side all had
    // one partition and 32 cores sat idle for the block-pairs × intersect
    // work (measured 14.5 s single-task at sf0.1). Round-robin repartition
    // of the RAW TEXT (before the array projection, so the shuffle carries
    // ~300 B rows, not arrays) spreads everything downstream; deterministic
    // under retries (sort-before-repartition, SPARK-23207) and
    // result-invariant (output is totally ordered).
    val streamParts = math.max(2, 2 * spark.sparkContext.defaultParallelism)
    val sets = docs.select(col(blockCol).as("block"), col("doc_id"), col("text"))
      .repartition(streamParts)
      .select(col("block"), col("doc_id"), ngramSetCol(col("text"), n).as("ng"))
      // null text -> NULL set: drop before the all-pairs join (never a
      // proven duplicate; also keeps unknown-content rows out of the block's
      // quadratic pairing volume)
      .filter(col("ng").isNotNull)
    val a = sets.toDF("block", "doc_id_a", "ng_a")
    val b = sets.toDF("block", "doc_id_b", "ng_b")
    a.join(b, "block")
      .filter(col("doc_id_a") < col("doc_id_b"))
      // the selectivity gate references the intersection ONCE:
      //   inter*den >= union*num  <=>  inter*(den+num) >= (|a|+|b|)*num
      // (integer-exact, union = |a|+|b|-inter) — written with a single
      // array_intersect so the optimizer's push into the join condition
      // cannot double-evaluate the O(|set|) kernel per pair
      .filter(size(array_intersect(col("ng_a"), col("ng_b"))) * (jacDen + jacNum) >=
        (size(col("ng_a")) + size(col("ng_b"))) * jacNum)
      .withColumn("inter_size", size(array_intersect(col("ng_a"), col("ng_b"))).cast("long"))
      .withColumn("union_size",
        (size(col("ng_a")) + size(col("ng_b"))).cast("long") - col("inter_size"))
      .select("block", "doc_id_a", "doc_id_b", "inter_size", "union_size")
      .orderBy("block", "doc_id_a", "doc_id_b")
  }

  /** Exact n-gram Jaccard for pairs within a blocking key (e.g. source) —
    * the small-group exact verifier; sorted-merge kernel, no array_intersect
    * materialization.
    *
    * Scale guard: blocks up to `maxBlockRows` go all-pairs (exact); larger
    * blocks are pre-filtered with dense r=2 minhash banding INSIDE the block
    * before the exact kernel, so one giant block can no longer go quadratic
    * on a single key. The banded path is exact above moderate Jaccard
    * (P(miss) = (1-J^2)^(numPerm/2): <1e-8 at J>=0.5) but under-recalls at
    * very low minJaccard — callers scanning for faint overlap in huge blocks
    * should raise numPerm or shrink blocks. */
  def ngramJaccard(docs: DataFrame, blockCol: String, n: Int = 3,
                   minJaccard: Double = 0.0, cfg: GraftConfig = GraftConfig(),
                   maxBlockRows: Long = 10000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withNgrams = docs.select(col(blockCol).as("block"), col("doc_id"), col("text"))
      .as[(String, Long, String)]
      .mapPartitions { it =>
        val sh = new Shingler(n, cfg.seed)
        val mh = new MinHasher(cfg.numPerm, cfg.seed)
        it.map { case (block, id, text) =>
          val ngrams = sh.hashes(Extract.tokens(text))
          val sig = mh.signature(ngrams)
          (block, id, ngrams, bandKeysR2(sig, cfg))
        }
      }.toDF("block", "doc_id", "ngrams", "bands")
    registerPersist(withNgrams)

    val counts = withNgrams.groupBy("block").count()
    // one small action up front: it materializes the persisted n-gram frame
    // exactly once (ahead of AQE's concurrent join stages) AND tells us
    // whether the banded fallback activates at all — when every block is
    // small the big-branch plan is dropped entirely
    val hasBig = counts.filter(col("count") > maxBlockRows).limit(1).count() > 0
    if (hasBig && minJaccard < 0.3)
      System.err.println(
        s"[graft] ngramJaccard: a block exceeds maxBlockRows=$maxBlockRows, so its " +
          s"pairs come from r=2 minhash banding, which under-recalls below " +
          s"jaccard ~0.3 (requested minJaccard=$minJaccard) — the result is NOT " +
          "exhaustive for low-similarity pairs in that block; raise minJaccard, " +
          "numPerm, or maxBlockRows for exhaustive output")
    val small = withNgrams.join(counts.filter(col("count") <= maxBlockRows), "block")
    val big = withNgrams.join(counts.filter(col("count") > maxBlockRows), "block")

    val jac = udf((x: Seq[Long], y: Seq[Long]) =>
      Similarity.jaccard(x.toArray, y.toArray))

    val sa = small.toDF("block", "doc_id_a", "ng_a", "bands_a", "cnt_a")
    val sb = small.toDF("block", "doc_id_b", "ng_b", "bands_b", "cnt_b")
    val smallPairs = sa.join(sb, "block")
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("block"), col("doc_id_a"), col("doc_id_b"),
        jac(col("ng_a"), col("ng_b")).as("jaccard"))

    val bigBands = big.select(col("block"), col("doc_id"),
      posexplode(col("bands")).as(Seq("band_id", "key")))
    val bigCand = bigBands.toDF("block", "doc_id_a", "band_id", "key")
      .join(bigBands.toDF("block", "doc_id_b", "band_id", "key"),
        Seq("block", "band_id", "key"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("block", "doc_id_a", "doc_id_b").distinct()
    val ng = big.select(col("block"), col("doc_id"), col("ngrams"))
    val bigPairs = bigCand
      .join(ng.toDF("block", "doc_id_a", "ng_a"), Seq("block", "doc_id_a"))
      .join(ng.toDF("block", "doc_id_b", "ng_b"), Seq("block", "doc_id_b"))
      .select(col("block"), col("doc_id_a"), col("doc_id_b"),
        jac(col("ng_a"), col("ng_b")).as("jaccard"))

    (if (hasBig) smallPairs.unionByName(bigPairs) else smallPairs)
      .filter(col("jaccard") >= minJaccard)
      .orderBy("block", "doc_id_a", "doc_id_b")
  }

  /** Embedding cosine near-dup over (vec_id, embedding ARRAY<FLOAT>): exact
    * cosine via built-in higher-order functions (codegen; no UDF), pairs
    * above threshold, blocked to bound the join.
    *
    * Blocking: an explicit label column when given; otherwise `sketches`
    * INDEPENDENT LSH sign-sketches (distinct seeds), each with 1-bit-flip
    * multi-probe, OR-ed together (round 1 defaulted to a constant key — a
    * full cartesian on a single reducer; never ship a lit(0) join key).
    *
    * Recall honesty (round-2 ADVICE): ONE 8-bit sketch with 1-bit probing
    * misses a pair iff it differs in >= 2 sketch bits. At cosine ~0.95 the
    * per-bit disagreement probability is acos(0.95)/pi ~ 0.10, so a single
    * sketch misses ~19% of true pairs — NOT vanishingly unlikely. With R
    * independent sketches the miss rate is ~0.19^R (default R=3: < 0.7%);
    * raise `sketches` (or use an explicit blockCol, or brute-force) when
    * recall matters more than join volume, which grows linearly in R.
    *
    * Only ONE join side multi-probes (the lshTopK shape): a 1-bit-differing
    * pair is found by flipping that bit on either side, so probing both
    * sides buys no recall at that radius while inflating the probed-side
    * row volume (nBits+1 rows/vec/sketch) into BOTH join inputs — the
    * candidate volume the miss model above prices assumes one probed side.
    * Candidate pairs are deduped across sketches BEFORE the cosine math,
    * and embeddings join back at candidate volume (slim key join, not
    * payload through the band shuffle). */
  def embeddingCosineDup(emb: DataFrame, threshold: Double = 0.95,
                         blockCol: Option[String] = None, nBits: Int = 8,
                         seed: Long = 42L, sketches: Int = 3): DataFrame = {
    val (ba, bb) = blockCol match {
      case Some(c) =>
        val blk = emb.select(col("vec_id"), col(c).cast("string").as("block"))
        (blk.toDF("vec_id_a", "block"), blk.toDF("vec_id_b", "block"))
      case None =>
        val sides = (0 until sketches).map { r =>
          val sk = AnnOps.hyperplaneSketch(emb, nBits, seed + 7919L * r)
          val probed = sk
            .withColumn("probe", explode(array((lit(-1) +: (0 until nBits).map(lit)): _*)))
            .withColumn("block",
              concat(lit(s"$r:"), AnnOps.probedBucket(col("bucket")).cast("string")))
            .select(col("vec_id"), col("block"))
          val exact = sk
            .select(col("vec_id"),
              concat(lit(s"$r:"), col("bucket").cast("string")).as("block"))
          (probed, exact)
        }
        (sides.map(_._1).reduce(_ unionByName _).toDF("vec_id_a", "block"),
          sides.map(_._2).reduce(_ unionByName _).toDF("vec_id_b", "block"))
    }
    val candIds = ba.join(bb, "block")
      .filter(col("vec_id_a") < col("vec_id_b"))
      .select("vec_id_a", "vec_id_b").distinct()

    // norm + cosine are AnnOps' single definitions, not a local re-derivation
    val base = AnnOps.withNorm(emb, "vec_id")
    val va = base.toDF("vec_id_a", "v_a", "norm_a")
    val vb = base.toDF("vec_id_b", "v_b", "norm_b")
    candIds.join(va, "vec_id_a").join(vb, "vec_id_b")
      .withColumn("cosine",
        AnnOps.cosine(col("v_a"), col("v_b"), col("norm_a"), col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_id_a", "vec_id_b", "cosine")
      .orderBy("vec_id_a", "vec_id_b")
  }
}
