package graft.data

import java.sql.Timestamp

/** Deterministic synthetic web-page corpus (FIXTURES.md) — seeded, pure
  * function of the row index, so it can be generated distributively at any
  * scale (`spark.range(n).mapPartitions`) with no driver materialization and
  * no cross-row state.
  *
  * Layout: the index space is tiled in groups of 16 rows.
  *   r = i % 16, g = i / 16.
  *   r in 0..9  -> base documents (some groups make r=8/r=9 special rows)
  *   r in 10..15 -> planned variants of base (g, r-10):
  *     10 exact duplicate              (identical text, new url/warc_ts)
  *     11 near duplicate, small edit   (~1% tokens replaced  -> low Hamming)
  *     12 near duplicate, larger edit  (~8% tokens replaced  -> boundary
  *        Hamming); every 5th group it derives from variant 11 instead of the
  *        base -> transitive chain A ~ B ~ C with A !~ C (union-find fixture)
  *     13 head-modified (first ~10% replaced) -> tail-hash match (cutEnds)
  *     14 tail-modified (last ~10% replaced)  -> head-hash match (cutEnds)
  *     15 verbatim-block: ~30% of the base pasted into an unrelated doc
  *        (suffix-array substring fixture)
  *   special bases:
  *     g % 11 == 3, r == 9 -> low-entropy doc (one token repeated) -> NULL
  *                            signature reject (video.cpp:203-211 analog)
  *     g % 13 == 5, r == 9 -> empty text (boilerplate-only page) -> validity
  *                            reject (video.cpp:19-23,31-35 analog)
  *     g % 17 == 7, r == 8 -> case-variant url duplicate of (g, 7)
  *                            (mainwindow.cpp:217-225 analog)
  *     g % 37 == 0, r in 0..5 -> skew bucket: 80% shared boilerplate body ->
  *                            one giant near-dup cluster + hot band keys
  */
object Corpus {

  /** xorshift64* PRNG — deterministic, allocation-free. */
  final class Rng(seed0: Long) {
    private var s: Long = if (seed0 == 0L) 0x9E3779B97F4A7C15L else seed0
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    def nextInt(bound: Int): Int = {
      val r = (nextLong() >>> 1) % bound
      r.toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  /** 8k-word deterministic vocabulary. */
  val vocab: Array[String] = {
    val rng = new Rng(0xC0FFEE42L)
    Array.fill(8192) {
      val len = 3 + rng.nextInt(8)
      val sb = new java.lang.StringBuilder(len)
      var j = 0
      while (j < len) { sb.append(('a' + rng.nextInt(26)).toChar); j += 1 }
      sb.toString
    }
  }

  val Epoch: Long = 1704067200000L // 2024-01-01T00:00:00Z

  sealed trait Kind { def parent: Long }
  case class Base(parent: Long = -1L) extends Kind
  case class ExactDup(parent: Long) extends Kind
  case class NearDupSmall(parent: Long) extends Kind
  case class NearDupLarge(parent: Long) extends Kind
  case class HeadMod(parent: Long) extends Kind
  case class TailMod(parent: Long) extends Kind
  case class VerbatimBlock(parent: Long) extends Kind
  case class LowEntropy(parent: Long = -1L) extends Kind
  case class EmptyDoc(parent: Long = -1L) extends Kind
  case class CaseUrlDup(parent: Long) extends Kind
  case class SkewBase(parent: Long = -1L) extends Kind

  def kindOf(i: Long): Kind = {
    val g = i / 16; val r = (i % 16).toInt
    r match {
      case 9 if g % 11 == 3 => LowEntropy()
      case 9 if g % 13 == 5 => EmptyDoc()
      case 8 if g % 17 == 7 => CaseUrlDup(g * 16 + 7)
      case rr if rr <= 9 => if (g % 37 == 0 && rr <= 5) SkewBase() else Base()
      case 10 => ExactDup(g * 16)
      case 11 => NearDupSmall(g * 16 + 1)
      case 12 => if (g % 5 == 2) NearDupLarge(g * 16 + 11) else NearDupLarge(g * 16 + 2)
      case 13 => HeadMod(g * 16 + 3)
      case 14 => TailMod(g * 16 + 4)
      case 15 => VerbatimBlock(g * 16 + 5)
    }
  }

  /** Canonical token stream of a base document at index i. */
  private def baseTokens(i: Long, seed: Long): Array[String] = {
    val g = i / 16
    val rng = new Rng(seed ^ (i * 0x9E3779B97F4A7C15L) ^ 0xD0C5L)
    val u = rng.nextDouble()
    val len = 50 + (u * u * 2950).toInt // skewed to short docs, 50..3000 tokens
    val skew = g % 37 == 0 && (i % 16) <= 5
    if (skew) {
      // 80% shared boilerplate (identical across ALL skew groups) + unique tail
      val bp = boilerplateTokens
      val uniq = Array.fill(math.max(10, len / 5))(vocab(rng.nextInt(vocab.length)))
      bp ++ uniq
    } else {
      Array.fill(len)(vocab(rng.nextInt(vocab.length)))
    }
  }

  private lazy val boilerplateTokens: Array[String] = {
    val rng = new Rng(0xB0117E41A7EL)
    Array.fill(400)(vocab(rng.nextInt(vocab.length)))
  }

  /** Deterministic edit: replace `t` tokens at seeded positions. */
  private def replaceTokens(toks: Array[String], t: Int, rng: Rng): Array[String] = {
    val out = toks.clone()
    var j = 0
    while (j < t && out.length > 0) {
      out(rng.nextInt(out.length)) = vocab(rng.nextInt(vocab.length))
      j += 1
    }
    out
  }

  /** The token stream of row i (pure function: regenerates parents as needed). */
  def tokensOf(i: Long, seed: Long): Array[String] = kindOf(i) match {
    case Base(_) | SkewBase(_) => baseTokens(i, seed)
    case LowEntropy(_) =>
      // one token repeated — the monochrome-capture analog (video.cpp:203-211)
      val rng = new Rng(seed ^ i)
      val tok = vocab(rng.nextInt(vocab.length))
      Array.fill(80 + rng.nextInt(80))(tok)
    case EmptyDoc(_) => Array.empty
    case CaseUrlDup(p) => tokensOf(p, seed)
    case ExactDup(p) => tokensOf(p, seed)
    case NearDupSmall(p) =>
      val base = tokensOf(p, seed)
      replaceTokens(base, math.max(1, base.length / 100), new Rng(seed ^ (i * 31)))
    case NearDupLarge(p) =>
      val base = tokensOf(p, seed)
      replaceTokens(base, math.max(3, base.length * 8 / 100), new Rng(seed ^ (i * 37)))
    case HeadMod(p) =>
      val base = tokensOf(p, seed)
      val cut = math.max(1, base.length / 10)
      val rng = new Rng(seed ^ (i * 41))
      Array.fill(cut)(vocab(rng.nextInt(vocab.length))) ++ base.drop(cut)
    case TailMod(p) =>
      val base = tokensOf(p, seed)
      val cut = math.max(1, base.length / 10)
      val rng = new Rng(seed ^ (i * 43))
      base.dropRight(cut) ++ Array.fill(cut)(vocab(rng.nextInt(vocab.length)))
    case VerbatimBlock(p) =>
      val donor = tokensOf(p, seed)
      val rng = new Rng(seed ^ (i * 47))
      val ownLen = math.max(60, donor.length)
      val own = Array.fill(ownLen)(vocab(rng.nextInt(vocab.length)))
      val blockLen = math.max(30, donor.length * 3 / 10)
      val from = if (donor.length <= blockLen) 0 else rng.nextInt(donor.length - blockLen)
      val at = rng.nextInt(own.length)
      own.take(at) ++ donor.slice(from, from + blockLen) ++ own.drop(at)
  }

  /** Canonical text: paragraphs of 40-80 tokens joined by "\n\n".
    * Paragraph breaks are seeded by the token CONTENT (not the row index) so
    * rows with identical tokens (exact dups, case-url dups) get byte-identical
    * text. */
  def textOf(i: Long, seed: Long): String = {
    val toks = tokensOf(i, seed)
    if (toks.isEmpty) return ""
    val contentSeed = toks.foldLeft(seed)((acc, t) => graft.core.XXH64.hashString(t, acc))
    val rng = new Rng(contentSeed ^ 0x9A9AL)
    val sb = new java.lang.StringBuilder(toks.length * 7)
    var j = 0
    var nextBreak = 40 + rng.nextInt(41)
    while (j < toks.length) {
      if (j > 0) {
        if (j == nextBreak) { sb.append("\n\n"); nextBreak += 40 + rng.nextInt(41) }
        else sb.append(' ')
      }
      sb.append(toks(j))
      j += 1
    }
    sb.toString
  }

  def urlOf(i: Long): String = {
    val base = f"https://example.org/s${i / 16 % 64}%02d/doc$i%010d"
    kindOf(i) match {
      case CaseUrlDup(p) => f"HTTPS://EXAMPLE.ORG/S${p / 16 % 64}%02d/DOC$p%010d"
      case _ => base
    }
  }

  def langOf(i: Long): String = {
    val h = graft.core.XXH64.hashLong(i, 7L)
    val m = ((h % 100) + 100) % 100
    if (m < 90) "en" else if (m < 95) "de" else "fr"
  }

  /** One fully-rendered page row. */
  def page(i: Long, seed: Long): PageRow = {
    val text = textOf(i, seed)
    val ts = new Timestamp(Epoch + i * 137000L)
    // styleSeed varies boilerplate per row but stays in the identity-safe pool
    PageRow(urlOf(i), ts, Render.html(text, i), text, langOf(i))
  }
}

/** The input-table row, exactly per BASELINE.json input_hint:
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)
