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
  */
object DedupOps {

  /** Exact dedup: canonical row = min doc_id per content hash (hash-groupBy,
    * one shuffle; no sort). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), md5(to_binary(col("text"), lit("utf-8"))).as("content_md5"))
      .withColumn("dup_rank", row_number().over(w).cast("long"))
      .withColumn("is_canonical", col("dup_rank") === 1L)
      .orderBy("doc_id")
  }

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
        val rows = cfg.minhashRowsPerBand
        val bands: Array[Long] =
          if (sig == null) Array.emptyLongArray
          else Array.tabulate(cfg.minhashBands) { b =>
            var acc = cfg.seed + b
            var i = 0
            while (i < rows) { acc = XXH64.hashLong(sig(b * rows + i), acc); i += 1 }
            acc
          }
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
    val fp = fingerprint(docs, cfg, k).persist()
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

  /** SimHash near-dup: 64-bit fingerprints, pairs within `maxHamming`
    * (candidates via 16-bit slice bands — guarantee Hamming <= 3). */
  def simhashDedup(docs: DataFrame, maxHamming: Int = 3, k: Int = 3,
                   cfg: GraftConfig = GraftConfig()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fp = fingerprint(docs, cfg, k).persist()
    val slices = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_id", "key")))
    val a = slices.toDF("doc_id_a", "simhash_a", "band_id", "key")
    val b = slices.toDF("doc_id_b", "simhash_b", "band_id", "key")
    a.join(b, Seq("band_id", "key"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Exact n-gram Jaccard for all pairs within a blocking key (e.g. source) —
    * the small-group exact verifier; sorted-merge kernel, no array_intersect
    * materialization. */
  def ngramJaccard(docs: DataFrame, blockCol: String, n: Int = 3,
                   minJaccard: Double = 0.0, cfg: GraftConfig = GraftConfig()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withNgrams = docs.select(col(blockCol).as("block"), col("doc_id"), col("text"))
      .as[(String, Long, String)]
      .mapPartitions { it =>
        val sh = new Shingler(n, cfg.seed)
        it.map { case (block, id, text) => (block, id, sh.hashes(Extract.tokens(text))) }
      }.toDF("block", "doc_id", "ngrams")
    val a = withNgrams.toDF("block", "doc_id_a", "ng_a")
    val b = withNgrams.toDF("block", "doc_id_b", "ng_b")
    val jac = udf((x: Seq[Long], y: Seq[Long]) =>
      Similarity.jaccard(x.toArray, y.toArray))
    a.join(b, "block")
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("jaccard", jac(col("ng_a"), col("ng_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("block", "doc_id_a", "doc_id_b", "jaccard")
      .orderBy("block", "doc_id_a", "doc_id_b")
  }

  /** Embedding cosine near-dup over (vec_id, embedding ARRAY<FLOAT>): exact
    * cosine via built-in higher-order functions (codegen; no UDF), pairs
    * above threshold, blocked by an optional label column to bound the join. */
  def embeddingCosineDup(emb: DataFrame, threshold: Double = 0.95,
                         blockCol: Option[String] = None): DataFrame = {
    val base = emb.select(col("vec_id"),
      blockCol.map(col).getOrElse(lit(0)).as("block"),
      col("embedding").cast("array<double>").as("v"))
    val withNorm = base.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val a = withNorm.toDF("vec_id_a", "block", "v_a", "norm_a")
    val b = withNorm.toDF("vec_id_b", "block", "v_b", "norm_b")
    a.join(b, "block")
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("dot", aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("cosine", col("dot") / (col("norm_a") * col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_id_a", "vec_id_b", "cosine")
      .orderBy("vec_id_a", "vec_id_b")
  }
}
