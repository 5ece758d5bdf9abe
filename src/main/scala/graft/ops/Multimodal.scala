package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.XXH64

/** Multimodal column plumbing for a training-data pipeline: media payloads
  * travel as opaque `BINARY` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run batch-wise inside partitions.
  *
  * The decode kernels are STUBBED (this container ships no image/audio
  * codecs): `decodeStub` produces a deterministic fake decode from the
  * payload bytes. Everything Spark-side — schema, batching, partitioning,
  * the operator signatures and their composition — is real and tested, so a
  * real codec slots into `MediaDecoder` without touching the plumbing.
  */
object Multimodal {

  /** One media row: payload plus the typed metadata a real WARC/media table
    * carries. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, duration_ms: Long)

  /** Decoded frame features: fixed-width vector per sampled frame. */
  final case class FrameFeatures(media_id: Long, frame_idx: Int, pos_pct: Int,
                                 features: Array[Float])

  /** The decoder seam. A production build binds JNI/FFmpeg here; the stub is
    * deterministic in the payload bytes so tests can pin outputs. */
  trait MediaDecoder extends Serializable {
    def frameFeatures(payload: Array[Byte], posPct: Int, dim: Int): Array[Float]
  }

  /** Deterministic fake decode: features derived from XXH64 over (payload,
    * position) — stands in for decode -> resize(INTER_AREA) -> grayscale ->
    * feature head (the reference's capture path, video.cpp:122-195). */
  object decodeStub extends MediaDecoder {
    def frameFeatures(payload: Array[Byte], posPct: Int, dim: Int): Array[Float] = {
      val base = XXH64.hashBytes(payload, posPct.toLong)
      Array.tabulate(dim) { i =>
        val h = XXH64.hashLong(base + i, 42L)
        (h.toDouble / Long.MaxValue.toDouble).toFloat
      }
    }
  }

  /** The reference's sampling plans (thumbnail.h:19-26): capture positions as
    * percent of duration — single-sourced from core.SamplingModes, the same
    * table the text fingerprints sample by (GraftConfig.samplingMode). */
  val cutEndsPositions: Seq[Int] = graft.core.SamplingModes.positions("cutEnds")
  val grid2x2Positions: Seq[Int] = graft.core.SamplingModes.positions("2x2")
  /** Capture plan for any mode name (thumbnail.h modes "1x1".."4x3", "cutEnds"). */
  def positionsFor(mode: String): Seq[Int] = graft.core.SamplingModes.positions(mode)

  /** Frame-sample + feature-extract: one narrow mapPartitions, batch shape
    * (rows x positions), deterministic output order. */
  def frameFeatures(media: DataFrame, positions: Seq[Int] = cutEndsPositions,
                    dim: Int = 16, decoder: MediaDecoder = decodeStub): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          positions.zipWithIndex.map { case (pct, idx) =>
            // null payload (e.g. syntheticMedia over a null-text doc): no
            // bytes to decode -> null features, and the decoder contract
            // stays "payload is never null" for real JNI/FFmpeg bindings
            val feats =
              if (payload == null) null
              else decoder.frameFeatures(payload, pct, dim)
            FrameFeatures(id, idx, pct, feats)
          }
        }
      }
  }

  /** Media-level fingerprint from frame features — mirrors the pipeline's
    * head/tail SimHash shape so media dedup reuses the same downstream
    * operators (banding, scoring, clustering). */
  /** Per-frame fold hash (media_id, frame_idx, frame_hash) — element-wise
    * xxhash64 chained over the float features: hashing the array's STRING
    * rendering would silently change fingerprints if Spark's array formatting
    * ever drifted; element hashing is pinned by the xxhash64 expression
    * contract (MultimodalSpec pins a literal value). Exported by Verify so
    * the DuckDB oracle can check the fingerprint pivot. */
  def frameHashes(media: DataFrame, dim: Int = 16): DataFrame =
    frameFeatures(media, cutEndsPositions, dim)
      .toDF().select(col("media_id"), col("frame_idx"),
        aggregate(col("features"), xxhash64(lit(42L)),
          (acc, x) => xxhash64(acc, x)).as("frame_hash"))

  def mediaFingerprints(media: DataFrame, dim: Int = 16): DataFrame = {
    frameHashes(media, dim)
      .groupBy("media_id")
      .pivot("frame_idx", Seq(0, 1))
      .agg(first(col("frame_hash")))
      .withColumnsRenamed(Map("0" -> "hash_head", "1" -> "hash_tail"))
      .orderBy("media_id")
  }

  /** Synthesize a media table from any binary-able column (for tests and the
    * harness: the container has no real media files). */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      (pmod(col("doc_id"), lit(640)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 16).cast("int").as("height"),
      (col("n_chars") * 100).as("duration_ms"))
}
