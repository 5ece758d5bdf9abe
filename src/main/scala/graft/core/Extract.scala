package graft.core

import java.nio.charset.StandardCharsets
import java.text.Normalizer

/** Deterministic HTML -> text extraction — the analog of the reference's
  * external metadata/content probe (reference: video.cpp:47-120 spawns
  * `ffmpeg -i` and parses its output; here the "probe" is a pure function, so
  * it runs inside a typed map with no process boundary).
  *
  * Contract (BASELINE.json input_hint): byte-identical extracted text per url.
  * `Extract.text(render(t)) == t` for canonical t, and
  * `Extract.text` is idempotent through `Render`:
  * `Extract(render(Extract(h))) == Extract(h)` for arbitrary h.
  *
  * Rules:
  *  - content = the `<p>...</p>` blocks, in order; everything else (nav,
  *    footer, title, scripts) is boilerplate and dropped — the analog of the
  *    reference discarding everything but the sampled frames.
  *  - within a block: strip inline tags, unescape HTML entities, then
  *    canonicalize (the rotation-normalization analog, reference:
  *    video.cpp:104-114 — canonical form is fixed BEFORE fingerprinting):
  *    Unicode NFC, all whitespace runs (incl. NBSP, CRLF) collapsed to a
  *    single space, trimmed.
  *  - blocks joined with "\n\n".
  *
  * Hand-rolled scanners (no regex): this runs once per row in the hot
  * fingerprint stage, and the regex version measured ~6 ms/doc — 20x slower
  * than the scan.
  */
object Extract {

  private val NumEntity = "&#(x[0-9a-fA-F]+|[0-9]+);".r

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000B' || c == '\f' || c == '\u00A0'

  /** Canonicalize a text block: collapse whitespace runs to one space, trim,
    * Unicode NFC (fast-path skipped when already normalized). */
  def canonicalize(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    val collapsed = sb.toString
    if (Normalizer.isNormalized(collapsed, Normalizer.Form.NFC)) collapsed
    else Normalizer.normalize(collapsed, Normalizer.Form.NFC)
  }

  /** Unescape the HTML entities the renderer (and common web text) emits. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val numDone = NumEntity.replaceAllIn(s, m => {
      val body = m.group(1)
      // out-of-range numeric entities (beyond Int, or not a valid code
      // point) are left VERBATIM, the browser behavior — web input is
      // arbitrary and a malformed '&#99999999999;' in one page must not
      // throw inside the per-row fingerprint map and fail the task
      val cp =
        try {
          if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
            Integer.parseInt(body.substring(1), 16)
          else Integer.parseInt(body)
        } catch { case _: NumberFormatException => -1 }
      if (cp < 0 || !Character.isValidCodePoint(cp))
        scala.util.matching.Regex.quoteReplacement(m.matched)
      else
        scala.util.matching.Regex.quoteReplacement(new String(Character.toChars(cp)))
    })
    numDone
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&apos;", "'")
      .replace("&nbsp;", " ")
      .replace("&amp;", "&") // last, so &amp;lt; -> &lt; (literal), not <
  }

  /** Strip `<...>` tags with a single scan. */
  private def stripTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Find the next `<p>` / `<p attrs>` open tag (case-insensitive) at or
    * after `from`; returns the index AFTER its '>' or -1. */
  private def nextPOpen(html: String, from: Int): Int = {
    var i = from
    val n = html.length
    while (i >= 0 && i < n) {
      i = html.indexOf('<', i)
      if (i < 0) return -1
      if (i + 1 < n && (html.charAt(i + 1) == 'p' || html.charAt(i + 1) == 'P')) {
        val after = i + 2
        if (after < n) {
          val c = html.charAt(after)
          if (c == '>') return after + 1
          if (isWs(c)) {
            val close = html.indexOf('>', after)
            if (close < 0) return -1
            return close + 1
          }
        }
      }
      i += 1
    }
    -1
  }

  /** Find the next `</p>` close tag (case-insensitive) at or after `from`. */
  private def nextPClose(html: String, from: Int): Int = {
    var i = from
    val n = html.length
    while (i >= 0 && i < n - 3) {
      i = html.indexOf('<', i)
      if (i < 0 || i > n - 4) return -1
      if (html.charAt(i + 1) == '/' &&
          (html.charAt(i + 2) == 'p' || html.charAt(i + 2) == 'P') &&
          html.charAt(i + 3) == '>') return i
      i += 1
    }
    -1
  }

  /** Extract canonical text from HTML bytes (UTF-8). */
  def text(html: Array[Byte]): String =
    if (html == null) "" else text(new String(html, StandardCharsets.UTF_8))

  /** Extract canonical text from an HTML string. */
  def text(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val sb = new java.lang.StringBuilder(html.length / 2)
    var pos = 0
    var first = true
    var done = false
    while (!done) {
      val contentStart = nextPOpen(html, pos)
      if (contentStart < 0) done = true
      else {
        val end = nextPClose(html, contentStart)
        if (end < 0) done = true // unclosed <p>: ignored (matches the strict block rule)
        else {
          val cleaned = canonicalize(unescape(stripTags(html.substring(contentStart, end))))
          if (!first) sb.append("\n\n")
          sb.append(cleaned)
          first = false
          pos = end + 4
        }
      }
    }
    sb.toString
  }

  /** Tokenize canonical text for shingling: split on whitespace runs. */
  def tokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    var start = -1
    while (i < n) {
      val c = text.charAt(i)
      if (isWs(c)) {
        if (start >= 0) { out += text.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += text.substring(start, n)
    out.toArray
  }
}
