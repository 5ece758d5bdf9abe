package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftConfig
import graft.spark.SparkTest

/** Null-content semantics across the dedup operator family (the rule
  * exactDedup documents: null text is UNKNOWN content, never a proven
  * duplicate), the SimHash 0L sentinel, the multimodal null payload, and the
  * repaired subword boundary classes. */
class OpsHardeningSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val cfg = GraftConfig()

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("null text never pairs in minhashLshExact (no NPE, no bands)") {
    val d = docs(
      (1L, "s", null), (2L, "s", null),
      (3L, "s", "the quick brown fox jumps over the lazy dog"),
      (4L, "s", "the quick brown fox jumps over the lazy dog"))
    val got = DedupOps.minhashLshExact(d, jacNum = 1, jacDen = 2, k = 3, cfg)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 4L)))
  }

  test("null text never pairs in ngramOverlapExact (old code verified " +
      "null-vs-null at jaccard 1 via the {\"\"} set)") {
    val d = docs(
      (1L, "blk", null), (2L, "blk", null), (3L, "blk", ""),
      (4L, "blk", "same words here"), (5L, "blk", "same words here"))
    val got = DedupOps.ngramOverlapExact(d, "source", n = 3, jacNum = 1, jacDen = 2)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // empty STRING is known content: "" == "" is a legitimate exact overlap
    // pair in split-space ({""} sets); nulls pair with nothing
    assert(got === Set((4L, 5L)))
    assert(!got.exists(p => p._1 <= 2L || p._2 <= 2L))
  }

  test("simhashDedup excludes the 0L invalid sentinel: content-free docs " +
      "are never hamming-0 dups of each other") {
    val d = docs(
      (1L, "s", null), (2L, "s", ""), (3L, "s", "   \t "),
      (4L, "s", "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "s", "alpha beta gamma delta epsilon zeta eta theta"))
    val got = DedupOps.simhashDedup(d, maxHamming = 7, k = 3, cfg)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((4L, 5L)), s"sentinel rows paired: $got")
  }

  test("frameFeatures yields null features (not an NPE) for a null payload") {
    import spark.implicits._
    val media = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, "bytes".getBytes("UTF-8"))).toDF("media_id", "payload")
    val rows = Multimodal.frameFeatures(media).collect()
    assert(rows.count(_.media_id == 1L) === 2)
    assert(rows.filter(_.media_id == 1L).forall(_.features == null))
    assert(rows.filter(_.media_id == 2L).forall(f =>
      f.features != null && f.features.length === 16))
  }

  test("subwordCounts: acronyms are one subword; letter/digit and " +
      "camel-hump boundaries split") {
    import spark.implicits._
    val d = Seq(
      (1L, "NASA API"), // 2: all-caps words stay whole
      (2L, "camelCase"), // 2: lower->UPPER hump
      (3L, "A1"), // 2: letter->digit
      (4L, "a1b2"), // 4: alternating boundaries
      (5L, "hello, world!"), // 4: punct chars split off
      (6L, "plain words only") // 3
    ).toDF("doc_id", "text")
    val got = TextOps.subwordCounts(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L, 6L -> 3L))
  }

  test("subwordCounts matches the lookaround-free oracle formulation " +
      "(space insertion via capture groups) on adversarial strings") {
    import spark.implicits._
    val texts = Seq("NASA API", "camelCase", "A1", "a1b2", "1a1a", "aAa1A",
      "hello, world!", "x!!y", "...", "mixedUP2case3Xy", "a b\tc",
      // vertical tab IS whitespace on the Java side; the DuckDB oracle names
      // \x0B explicitly next to every \s because RE2's \s excludes it
      "a\u000Bb", "x\u000B\u000B!y")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaSplit = TextOps.subwordCounts(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the oracle's shape: insert a space at every boundary, count tokens
    val inserted = d.select(col("doc_id"),
      size(filter(split(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(col("text"),
          "([A-Za-z])([0-9])", "$1 $2"),
          "([0-9])([A-Za-z])", "$1 $2"),
          "([a-z])([A-Z])", "$1 $2"),
          "([^A-Za-z0-9\\s])", " $1"),
        "\\s+"), t => length(t) > 0)).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSplit === inserted)
  }
}
