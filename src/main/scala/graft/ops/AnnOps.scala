package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.XXH64

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>). Three paths:
  *
  *  - `bruteTopK`: exact cosine top-k via a blocked cross join — the
  *    correctness baseline. All math is built-in higher-order functions
  *    (zip_with/aggregate) so the scoring stays inside codegen.
  *  - `lshTopK`: random-hyperplane LSH (sign-bit sketch of the embedding,
  *    the pHash-for-vectors analog) with multi-probe bucketing — the scale
  *    path: candidates are per-bucket, cost ~ n * bucketSize instead of n^2.
  *  - `ivfTopK`: inverted-file index (IVF-flat) — a spherical k-means
  *    coarse quantizer partitions vectors into nCells inverted lists;
  *    queries probe the nProbes nearest cells and score only those lists.
  *    Unlike LSH's data-oblivious hyperplanes, the quantizer adapts to the
  *    data distribution, so cell occupancy is balanced where the data is.
  *
  * At cluster scale, brute force shuffles n_q x n rows; the LSH/IVF paths
  * partition by bucket/cell key so each task scores a bounded candidate
  * set. IVF training is bounded by `maxTrain` (quantizers are trained on a
  * sample — the model is nCells x dim doubles, broadcast to executors);
  * full-corpus assignment is a map-only pass over the broadcast model.
  */
object AnnOps {

  /** Shared IVF parameters (r5 ADVICE #4): SparkEntry.auxExport re-trains
    * the quantizer for the oracle export with the SAME parameters as
    * q_ann_ivf's ivfTopK run — one constant set keeps the two sides from
    * silently desyncing when a default changes. */
  val IvfNCells = 16
  val IvfIters = 3
  val IvfSeed = 42L
  val IvfMaxTrain = 100000
  val IvfNQueries = 10
  val IvfNProbes = 4

  /** Spread a narrow input over the session's cores (round-6, guide §2.5
    * input skew): the embeddings table is a single small parquet file, so
    * every mapPartitions kernel (sketching, cell ranking) otherwise runs as
    * ONE task. Round-robin repartition is result-invariant here — the
    * kernels are pure per-row functions of deterministic seeded matrices —
    * and deterministic under retries (sort-before-repartition). */
  private def balanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  // private[ops]: DedupOps.embeddingCosineDup shares these (one definition
  // of norm/cosine/probing for every embedding operator — a fix to one must
  // reach all)
  private[ops] def withNorm(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  private[ops] def cosine = (vA: org.apache.spark.sql.Column, vB: org.apache.spark.sql.Column,
                             nA: org.apache.spark.sql.Column, nB: org.apache.spark.sql.Column) =>
    aggregate(zip_with(vA, vB, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) / (nA * nB)

  /** Multi-probe bucket key: probe < 0 keeps the original bucket, probe b
    * flips bit b. The probe column must be named exactly "probe" (a variable
    * shift amount has no Column-typed builtin, so the shift is an expr). */
  private[ops] def probedBucket(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(col("probe") < 0, bucket)
      .otherwise(bucket.bitwiseXOR(
        expr("shiftleft(CAST(1 AS BIGINT), CAST(probe AS INT))")))

  /** Exact cosine top-k neighbors for the query set (default: vec_id < nQueries). */
  def bruteTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val base = withNorm(emb, "vec_id")
    val queries = base.filter(col("vec_id") < nQueries)
      .toDF("query_id", "v_q", "norm_q")
    val scored = queries.crossJoin(base)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", cosine(col("v_q"), col("v"), col("norm_q"), col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane sketch: bit i = sign(<v, h_i>) with h_i a seeded
    * pseudo-random hyperplane (components from SplitMix via XXH64 — no
    * stored model). Returns nBits-bit bucket keys; `probes` extra keys with
    * one flipped bit implement multi-probe lookup. */
  def hyperplaneSketch(emb: DataFrame, nBits: Int = 16, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    balanced(emb.select(col("vec_id"), col("embedding"))).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        // The hyperplane component depends only on (bit, dim index, seed):
        // build the nBits x dim matrix ONCE per partition (lazily, sized from
        // the first row; regrown if a longer vector appears) instead of
        // nBits x dim hash calls per ROW. Components are deterministic
        // pseudo-randoms in [-1,1) from XXH64 — no stored model.
        var hyper: Array[Array[Double]] = null
        it.map { case (id, v) =>
          if (hyper == null || hyper(0).length < v.length) {
            hyper = Array.tabulate(nBits) { b =>
              Array.tabulate(v.length) { i =>
                XXH64.hashLong(i.toLong * 131071L + b, seed).toDouble /
                  Long.MaxValue.toDouble
              }
            }
          }
          var key = 0L
          var b = 0
          while (b < nBits) {
            val hb = hyper(b)
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += v(i) * hb(i); i += 1 }
            if (dot > 0) key |= (1L << b)
            b += 1
          }
          (id, key)
        }
      }.toDF("vec_id", "bucket")
  }

  /** LSH-bucketed approximate top-k: score only candidates sharing a bucket
    * key (multi-probe: the exact key plus `probes` one-bit-flipped keys).
    * The bucket join is SLIM (ids + keys only) and candidate pairs dedup
    * BEFORE scoring; vectors join back at candidate volume — no payload
    * through the bucket shuffle, no distinct over double columns. */
  def lshTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10, nBits: Int = 12,
              probes: Int = 4, seed: Long = 42L): DataFrame = {
    val sk = hyperplaneSketch(emb, nBits, seed)

    val probeKeys = array((lit(-1) +: (0 until probes).map(lit)): _*)
    val qBuckets = sk.filter(col("vec_id") < nQueries)
      .withColumn("probe", explode(probeKeys))
      .withColumn("bucket", probedBucket(col("bucket")))
      .select(col("vec_id").as("query_id"), col("bucket"))
    val candIds = qBuckets.join(sk.select(col("vec_id"), col("bucket")), "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id").distinct()

    scoreAndRank(candIds, emb, k)
  }

  /** Shared scoring tail of the bucketed paths (LSH and IVF): join the
    * vectors back at CANDIDATE volume, score cosine inside codegen, rank
    * per query (ties broken by neighbor id so the output is total-ordered),
    * keep top-k. */
  private def scoreAndRank(candIds: DataFrame, emb: DataFrame, k: Int): DataFrame = {
    val base = withNorm(emb, "vec_id")
    val scored = candIds
      .join(base.toDF("query_id", "v_q", "norm_q"), "query_id")
      .join(base.toDF("vec_id", "v", "norm"), "vec_id")
      .withColumn("cosine", cosine(col("v_q"), col("v"), col("norm_q"), col("norm")))
      .select("query_id", "vec_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Per-row nearest cells under the broadcast centroid model: emits the
    * `nProbes` highest-cosine (vec_id, cell) rows per vector, ties broken
    * by lower cell id. One map-only pass — the model (nCells x dim doubles)
    * rides a broadcast, so assignment never shuffles the corpus. */
  private def cellRank(vecs: DataFrame, cents: Array[Array[Double]],
                       nProbes: Int): DataFrame = cellRankBc(vecs, cents, nProbes)._1

  /** [[cellRank]] exposing the model broadcast so call sites that fully
    * materialize the result (the ivfTrain loop) can destroy it — round-5
    * ADVICE #3: each training iteration leaked one model broadcast per
    * call in long-lived sessions. Call sites returning lazy frames (ivfTopK
    * assignment/probes) must NOT destroy theirs. */
  private def cellRankBc(vecs: DataFrame, cents: Array[Array[Double]],
                         nProbes: Int): (DataFrame, org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val out = balanced(vecs.select(col("vec_id"), col("embedding"))).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        val cn = cs.map { c =>
          var s = 0.0; var i = 0
          while (i < c.length) { s += c(i) * c(i); i += 1 }
          math.sqrt(s)
        }
        it.flatMap { case (id, vSeq) =>
          val v = vSeq.toArray
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
          val vn = math.sqrt(s)
          val sims = Array.tabulate(cs.length) { c =>
            val cc = cs(c)
            var dot = 0.0; var j = 0
            val n = math.min(v.length, cc.length)
            while (j < n) { dot += v(j) * cc(j); j += 1 }
            if (vn == 0.0 || cn(c) == 0.0) 0.0 else dot / (vn * cn(c))
          }
          (0 until cs.length).sortBy(c => (-sims(c), c))
            .take(math.min(nProbes, cs.length)).map(c => (id, c))
        }
      }.toDF("vec_id", "cell")
    (out, bc)
  }

  /** Deterministic spherical k-means coarse quantizer. Bit-reproducible
    * under ANY input partitioning: the training sample and the initial
    * centroids are taken in xxhash64(vec_id, seed) order (orderBy+limit
    * plans as a top-k, never a full sort), and each update-step mean folds
    * its addends in vec_id order (array_sort over collected (vec_id, x)
    * structs), so FP summation order — the usual nondeterminism of a
    * distributed mean — is pinned. Fixed `iters` rounds, no early stop.
    * Cells that lose all members keep their previous centroid. The model
    * is tiny (nCells x dim doubles) and lives driver-side. */
  def ivfTrain(emb: DataFrame, nCells: Int = IvfNCells, iters: Int = IvfIters,
               seed: Long = IvfSeed, maxTrain: Int = IvfMaxTrain): Array[Array[Double]] = {
    val train = emb
      .select(col("vec_id"), col("embedding"),
        xxhash64(col("vec_id"), lit(seed)).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(maxTrain)
      .persist()
    try {
      var cents: Array[Array[Double]] = train
        .orderBy(col("h"), col("vec_id")).limit(nCells)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      for (_ <- 0 until iters) {
        val (asg, bc) = cellRankBc(train, cents, 1)
        val sums = train.join(asg, Seq("vec_id"))
          .select(col("cell"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")))
          .toDF("cell", "vec_id", "dim", "x")
          .groupBy("cell", "dim")
          .agg(count(lit(1L)).as("n"),
            aggregate(array_sort(collect_list(struct(col("vec_id"), col("x")))),
              lit(0.0), (a, s) => a + s.getField("x")).as("sx"))
          .collect()
        // the iteration's result is fully materialized — release the model
        // broadcast now instead of leaking iters per invocation (r5 ADVICE)
        bc.destroy()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          // dim bound (r5 ADVICE #1): hyperplaneSketch-style ragged inputs
          // can carry more dims than the init centroids; skip out-of-range
          // dims instead of throwing on the driver (cellRank's ranking
          // already truncates the dot product to the shared range)
          val cell = r.getInt(0); val dim = r.getInt(1)
          if (dim < next(cell).length)
            next(cell)(dim) = r.getDouble(3) / r.getLong(2)
        }
        cents = next
      }
      cents
    } finally { train.unpersist(); () }
  }

  /** Full-corpus inverted-list assignment: (vec_id, cell), map-only. */
  def ivfAssign(emb: DataFrame, cents: Array[Array[Double]]): DataFrame =
    cellRank(emb, cents, 1)

  /** Per-query probe list: the nProbes nearest cells per query vector. */
  def ivfProbes(emb: DataFrame, cents: Array[Array[Double]],
                nQueries: Int = IvfNQueries, nProbes: Int = IvfNProbes): DataFrame =
    cellRank(emb.filter(col("vec_id") < nQueries), cents, nProbes)
      .toDF("query_id", "cell")

  /** IVF-flat approximate top-k: train the quantizer (bounded sample),
    * assign every vector to its inverted list, probe the nProbes nearest
    * lists per query, and score only list members — cost ~ n_q x (probed
    * list sizes) instead of n_q x n. The candidate join is SLIM (ids +
    * cell keys); vectors join back at candidate volume in scoreAndRank. */
  def ivfTopK(emb: DataFrame, k: Int = 5, nQueries: Int = IvfNQueries,
              nCells: Int = IvfNCells, nProbes: Int = IvfNProbes,
              iters: Int = IvfIters, seed: Long = IvfSeed,
              maxTrain: Int = IvfMaxTrain): DataFrame = {
    val cents = ivfTrain(emb, nCells, iters, seed, maxTrain)
    val candIds = ivfProbes(emb, cents, nQueries, nProbes)
      .join(ivfAssign(emb, cents), "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id").distinct()
    scoreAndRank(candIds, emb, k)
  }

  /** Recall of the LSH path against the brute-force baseline (diagnostic).
    * The LSH knobs pass through so the recall measured is the recall of the
    * caller's actual configuration, and the O(n*nQueries) brute-force plan
    * is collected ONCE (intersect + count would otherwise execute the
    * crossJoin twice). */
  def lshRecall(emb: DataFrame, k: Int = 5, nQueries: Int = 10, nBits: Int = 12,
                probes: Int = 4, seed: Long = 42L): Double = {
    val exact = bruteTopK(emb, k, nQueries).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = lshTopK(emb, k, nQueries, nBits, probes, seed)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact & approx).size.toDouble / math.max(exact.size, 1)
  }
}
