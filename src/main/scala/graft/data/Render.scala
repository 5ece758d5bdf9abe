package graft.data

import graft.core.Extract

/** Deterministic text -> HTML renderer, the exact inverse of
  * [[graft.core.Extract]] on canonical text (FIXTURES.md §1: `render` is the
  * exact inverse of `Extract` so `Extract(render(t)) == t` byte-for-byte).
  *
  * Wraps each paragraph in `<p>`, escapes entities, and surrounds the content
  * with seeded nav/footer boilerplate that the extractor must strip.
  */
object Render {

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val navPool = Array(
    """<nav class="bp"><a href="/">Home</a> | <a href="/about">About</a></nav>""",
    """<nav class="bp"><ul><li><a href="/a">News</a></li><li><a href="/b">Archive</a></li></ul></nav>""",
    """<div class="menu"><span>Menu</span><a href="/x">X</a><a href="/y">Y</a></div>""",
    """<header><h1>Example Site</h1><nav><a href="/home">home</a></nav></header>"""
  )
  private val footerPool = Array(
    """<footer class="bp">&copy; 2024 example.org &mdash; all rights reserved</footer>""",
    """<footer><a href="/privacy">Privacy</a> &middot; <a href="/tos">Terms</a></footer>""",
    """<div class="footer">Powered by ExampleCMS 3.1</div>""",
    """<footer><p class="hidden-not-really"></p></footer>"""
  )

  /** Render canonical text to HTML bytes. `styleSeed` picks the boilerplate
    * variant (deterministic per row). Note footerPool(3) deliberately contains
    * an empty `<p>` INSIDE a footer — the extractor keeps all `<p>` blocks, so
    * pool index 3 is excluded from fixture rows that assert byte-identity and
    * exists only for the idempotence tests. */
  def html(text: String, styleSeed: Long): Array[Byte] = {
    val nav = navPool(((styleSeed % navPool.length) + navPool.length).toInt % navPool.length)
    val foot = footerPool(((styleSeed / 7 % 3) + 3).toInt % 3) // only 0..2: no <p> in footer
    val title = escape(text.take(40))
    val paras = text.split("\n\n", -1).map(p => s"<p>${escape(p)}</p>").mkString("\n")
    val doc =
      s"""<html><head><meta charset="utf-8"><title>$title</title></head>
         |<body>
         |$nav
         |$paras
         |$foot
         |</body></html>""".stripMargin
    doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Convenience for tests: render then extract. */
  def roundTrip(text: String, styleSeed: Long = 0L): String = Extract.text(html(text, styleSeed))
}
