package graft.core

/** Pure-Scala XXH64 (the public xxHash 64-bit algorithm,
  * https://github.com/Cyan4973/xxHash — BSD-2). Implemented here so the
  * Spark-free oracle layer and the Spark pipeline hash identically; the
  * byte-level variant is bit-compatible with Spark's builtin `xxhash64`
  * (seed 42) which tests use as a cross-check.
  *
  * This is the engine's stand-in for the reference's perceptual hash
  * front-end: where the reference hashes pixels (video.cpp:197-228), we hash
  * UTF-8 shingle bytes.
  */
object XXH64 {
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  /** XXH64 over a byte range. */
  def hashBytes(b: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    val end = off + len
    var i = off
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        val limit = end - 32
        while (i <= limit) {
          v1 = round(v1, readLong(b, i))
          v2 = round(v2, readLong(b, i + 8))
          v3 = round(v3, readLong(b, i + 16))
          v4 = round(v4, readLong(b, i + 24))
          i += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = mergeRound(acc, v1)
        acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3)
        mergeRound(acc, v4)
      } else seed + P5
    h += len
    while (i + 8 <= end) {
      h ^= round(0L, readLong(b, i))
      h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= readInt(b, i) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h ^= (b(i) & 0xffL) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    avalanche(h)
  }

  def hashBytes(b: Array[Byte], seed: Long): Long = hashBytes(b, 0, b.length, seed)

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** XXH64 of a single 8-byte little-endian long (matches Spark's
    * XxHash64Function.hashLong). */
  def hashLong(v: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= round(0L, v)
    h = rotl(h, 27) * P1 + P4
    avalanche(h)
  }

  /** XXH64 over `n` longs from `arr(from)`, serialized little-endian — THE
    * single definition of the long-array hashing kernel shared by shingle
    * window hashes (core.Shingler) and the native expression's band keys
    * (functions.FingerprintKernel): the two must stay bit-identical or band
    * keys silently desynchronize from shingle hashes. `buf` must hold at
    * least n*8 bytes; hot loops pass a reused buffer. */
  def hashLongsLE(arr: Array[Long], from: Int, n: Int, seed: Long,
                  buf: Array[Byte]): Long = {
    var i = 0
    while (i < n) {
      val v = arr(from + i)
      val o = i << 3
      buf(o) = v.toByte
      buf(o + 1) = (v >>> 8).toByte
      buf(o + 2) = (v >>> 16).toByte
      buf(o + 3) = (v >>> 24).toByte
      buf(o + 4) = (v >>> 32).toByte
      buf(o + 5) = (v >>> 40).toByte
      buf(o + 6) = (v >>> 48).toByte
      buf(o + 7) = (v >>> 56).toByte
      i += 1
    }
    hashBytes(buf, 0, n << 3, seed)
  }
}
