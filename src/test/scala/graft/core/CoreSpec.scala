package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.data.{Corpus, Render}

class XXH64Spec extends AnyFunSuite {
  test("known vector: empty input, seed 0") {
    // Official xxHash test vector: XXH64("") = 0xEF46DB3751D8E999
    assert(XXH64.hashBytes(Array.emptyByteArray, 0L) === 0xEF46DB3751D8E999L)
  }
  test("hashLong agrees with hashBytes on the 8 LE bytes") {
    val rng = new Corpus.Rng(7L)
    for (_ <- 0 until 500) {
      val v = rng.nextLong(); val seed = rng.nextLong()
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
      assert(XXH64.hashLong(v, seed) === XXH64.hashBytes(b, seed))
    }
  }
  test("deterministic and collision-free on distinct short strings") {
    val strs = (0 until 2000).map(i => s"s$i-${i * 31}")
    val hashes = strs.map(XXH64.hashString(_, 42L))
    assert(hashes.distinct.size === strs.size)
    assert(hashes === strs.map(XXH64.hashString(_, 42L)))
  }
}

class ExtractSpec extends AnyFunSuite {
  test("byte-identity: Extract(render(t)) == t for corpus texts") {
    for (i <- 0L until 512L) {
      val t = Corpus.textOf(i, 42L)
      val got = Extract.text(Render.html(t, i))
      assert(got === t, s"row $i")
      assert(got.getBytes("UTF-8").sameElements(t.getBytes("UTF-8")), s"bytes row $i")
    }
  }
  test("idempotence on messy html: Extract(render(Extract(h))) == Extract(h)") {
    val messy = Seq(
      "<html><body><p>  hello \r\n world </p><p>a &amp; b &lt;tag&gt;</p></body></html>",
      "<p>nested <b>bold <i>italic</i></b> text</p>",
      "<p>élève   café</p><p>你好世界</p>",
      "<p>a&#233;b&#x4F60;c</p>",
      "<p></p><p>x</p><p></p>",
      "<div>no paragraphs here</div>",
      "<p>nbsp here</p><p>tab\there</p>"
    )
    for (h <- messy) {
      val once = Extract.text(h)
      assert(Extract.text(Render.html(once, 3L)) === once, h)
    }
  }
  test("entity unescape") {
    assert(Extract.text("<p>a &amp; b</p>") === "a & b")
    assert(Extract.text("<p>&lt;p&gt;</p>") === "<p>")
    assert(Extract.text("<p>&#65;&#x42;</p>") === "AB")
    assert(Extract.text("<p>&amp;lt;</p>") === "&lt;") // double-escape stays literal
  }
  test("boilerplate stripped, paragraphs preserved in order") {
    val t = "first para\n\nsecond para"
    val html = new String(Render.html(t, 1L), "UTF-8")
    assert(html.contains("nav") || html.contains("header") || html.contains("menu"))
    assert(Extract.text(html) === t)
  }
  test("CRLF and whitespace runs collapse; empty html/body") {
    assert(Extract.text("<p>a\r\nb</p>") === "a b")
    assert(Extract.text("<p>a \t  b</p>") === "a b")
    assert(Extract.text("") === "")
    assert(Extract.text(null: String) === "")
    assert(Extract.text("<html><body></body></html>") === "")
  }
  test("NFC normalization") {
    val decomposed = "école" // e + combining acute
    assert(Extract.text(s"<p>$decomposed</p>") === "école")
  }
}

class SimilaritySpec extends AnyFunSuite {
  val cfg = GraftConfig()

  test("one-knob threshold coupling (mainwindow.cpp:110-121)") {
    assert(GraftConfig(threshold = 89).simBitsThreshold === 57)
    assert(GraftConfig(threshold = 89).jaccardThreshold === 0.89)
    assert(GraftConfig(threshold = 100).simBitsThreshold === 64)
    assert(GraftConfig(threshold = 50).simBitsThreshold === 32)
    assert(GraftConfig(threshold = 1).simBitsThreshold === 1)
    // exact-verify gate = max(threshold, 44) (comparison.cpp:141-142)
    assert(GraftConfig(threshold = 89).exactVerifyGate === 57)
    assert(GraftConfig(threshold = 50).exactVerifyGate === 44)
  }

  test("hamming similarity (comparison.cpp:160-166)") {
    assert(Similarity.hammingSim(0L, 0L) === 64)
    assert(Similarity.hammingSim(-1L, 0L) === 0)
    assert(Similarity.hammingSim(0b1011L, 0b0011L) === 63)
    val rng = new Corpus.Rng(11L)
    for (_ <- 0 until 500) {
      val a = rng.nextLong(); val b = rng.nextLong()
      assert(Similarity.hammingSim(a, b) === Similarity.hammingSim(b, a))
      assert(Similarity.hammingSim(a, a) === 64)
    }
  }

  test("length modifier boundary (comparison.cpp:168-174, tol both sides)") {
    assert(Similarity.lenModifier(1000, 1000 + cfg.lenTolChars, cfg) === cfg.sameLenBonus)
    assert(Similarity.lenModifier(1000, 1000 + cfg.lenTolChars + 1, cfg) === -cfg.diffLenPenalty)
    assert(Similarity.lenModifier(1000 + cfg.lenTolChars, 1000, cfg) === 1)
    assert(Similarity.lenModifier(0, 10000, cfg) === -4)
  }

  test("slot similarity: both-zero guard, clamp at 64 (comparison.cpp:153-174)") {
    assert(Similarity.slotSimilarity(0L, 0L, 5, 5, cfg) === 0)
    // identical hashes + same length: 64 + 1 clamps to 64
    assert(Similarity.slotSimilarity(7L, 7L, 5, 5, cfg) === 64)
    // identical hashes + different length: 64 - 4 = 60
    assert(Similarity.slotSimilarity(7L, 7L, 5, 50000, cfg) === 60)
    // one-side-zero is NOT guarded (matches reference: only both-zero returns 0)
    assert(Similarity.slotSimilarity(0L, -1L, 5, 5, cfg) === 0 + 0 + 1) // 64-64+1
  }

  test("best-of-two (comparison.cpp:133-136)") {
    val a = Similarity.pairSimilarity(7L, 0L, 7L, 0L, 5, 5, cfg)
    assert(a === 64)
    // head differs fully, tail matches -> tail wins
    val b = Similarity.pairSimilarity(0L, 7L, -1L, 7L, 5, 5, cfg)
    assert(b === 64)
    val noCut = cfg.copy(samplingMode = "1x1")
    assert(Similarity.pairSimilarity(0L, 7L, -1L, 7L, 5, 5, noCut) === 1)
  }

  test("exact-verify predicate (comparison.cpp:143-147)") {
    assert(Similarity.matchesExact(0.89, 5, 5, cfg)) // 0.89 + 1/64 > 0.89
    assert(!Similarity.matchesExact(0.89, 5, 50000, cfg)) // 0.89 - 4/64 < 0.89
    assert(!Similarity.matchesExact(0.874, 5, 5, cfg)) // 0.874+0.0156=0.8896 < 0.89
    assert(Similarity.matchesExact(0.875, 5, 5, cfg)) // 0.875+0.015625 > 0.89... 0.890625
  }

  test("jaccard merge matches set math") {
    val rng = new Corpus.Rng(13L)
    for (_ <- 0 until 300) {
      val xs = List.fill(rng.nextInt(60))(rng.nextLong() % 50)
      val ys = List.fill(rng.nextInt(60))(rng.nextLong() % 50)
      val a = xs.distinct.sorted.toArray
      val b = ys.distinct.sorted.toArray
      val inter = (xs.toSet intersect ys.toSet).size.toDouble
      val union = (xs.toSet union ys.toSet).size.toDouble
      val expected = if (union == 0) 0.0 else inter / union
      assert(math.abs(Similarity.jaccard(a, b) - expected) < 1e-12)
    }
  }
}

class ShinglerSpec extends AnyFunSuite {
  val sh = new Shingler(3, 42L)
  test("sliding windows, distinct, sorted") {
    val toks = "a b c d e a b c d e".split(" ")
    val h = sh.hashes(toks)
    assert(h.sameElements(h.sorted))
    assert(h.length === h.distinct.length)
    // 8 windows but 'a b c','b c d','c d e' repeat -> expect 5 + 'd e a','e a b' = 5 distinct... compute:
    // windows: abc bcd cde dea eab abc bcd cde -> distinct 5
    assert(h.length === 5)
  }
  test("degenerate short span = whole-span shingle") {
    assert(sh.hashes(Array("x")).length === 1)
    assert(sh.hashes(Array("x", "y")).length === 1)
    assert(sh.hashes(Array.empty[String]).length === 0)
    // whole-span hash of ["x","y"] = XXH64 over the two token hashes' LE bytes
    val th = Array(XXH64.hashString("x", 42L), XXH64.hashString("y", 42L))
    val buf = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(th(0)).putLong(th(1))
    assert(sh.hashes(Array("x", "y"))(0) === XXH64.hashBytes(buf.array(), 42L))
  }
  test("low-entropy doc yields few distinct shingles -> SimHash sentinel") {
    val toks = Array.fill(200)("same")
    val h = sh.hashes(toks)
    assert(h.length === 1)
    assert(SimHash64.of(h, minDistinct = 3) === 0L)
  }
}

class SimHashMinHashSpec extends AnyFunSuite {
  val cfg = GraftConfig()
  val mh = new MinHasher(cfg.numPerm, cfg.seed)
  val sh = new Shingler(cfg.k, cfg.seed)

  private def randTokens(seed: Long, n: Int): Array[String] = {
    val rng = new Corpus.Rng(seed)
    Array.fill(n)(Corpus.vocab(rng.nextInt(Corpus.vocab.length)))
  }

  test("simhash: identical docs -> identical hash; small edits -> small hamming") {
    val base = randTokens(1L, 500)
    val h0 = SimHash64.of(sh.hashes(base), 3)
    assert(h0 !== 0L)
    assert(SimHash64.of(sh.hashes(base.clone()), 3) === h0)
    // replace 2 of 500 tokens
    val edited = base.clone(); edited(100) = "zzzz"; edited(300) = "qqqq"
    val h1 = SimHash64.of(sh.hashes(edited), 3)
    val ham = 64 - Similarity.hammingSim(h0, h1)
    assert(ham <= 12, s"hamming $ham too large for a 2-token edit")
    // unrelated docs -> large hamming
    val other = randTokens(99L, 500)
    val h2 = SimHash64.of(sh.hashes(other), 3)
    val ham2 = 64 - Similarity.hammingSim(h0, h2)
    assert(ham2 >= 20, s"hamming $ham2 suspiciously small for unrelated docs")
  }

  test("minhash estimates jaccard within 0.1") {
    val a = (0L until 1000L).toArray
    for (overlap <- Seq(0, 300, 700, 1000)) {
      val b = (0L until overlap.toLong).toArray ++ (2000L until (3000L - overlap)).toArray
      val trueJ = Similarity.jaccard(a.sorted, b.sorted)
      val est = mh.estimate(mh.signature(a), mh.signature(b))
      assert(math.abs(est - trueJ) < 0.1, s"overlap=$overlap true=$trueJ est=$est")
    }
  }

  test("minhash of empty set is null; deterministic otherwise") {
    assert(mh.signature(Array.emptyLongArray) === null)
    val s1 = mh.signature(Array(1L, 2L, 3L))
    val s2 = mh.signature(Array(3L, 2L, 1L).sorted)
    assert(s1.sameElements(s2))
  }
}

class UnionFindSpec extends AnyFunSuite {
  test("path graph collapses to one component with min root") {
    val uf = new UnionFind[String]
    val nodes = (0 until 1000).map(i => f"n$i%04d")
    nodes.sliding(2).foreach { case Seq(a, b) => uf.union(a, b) }
    val comp = uf.components(nodes)
    assert(comp.values.toSet === Set("n0000"))
  }
  test("disjoint components stay disjoint") {
    val uf = new UnionFind[Int]
    uf.union(1, 2); uf.union(3, 4); uf.union(2, 5)
    val comp = uf.components(Seq(1, 2, 3, 4, 5, 6))
    assert(comp(1) === 1 && comp(2) === 1 && comp(5) === 1)
    assert(comp(3) === 3 && comp(4) === 3)
    assert(comp(6) === 6)
  }
}

class SuffixOverlapSpec extends AnyFunSuite {
  private def bruteLcs(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }
  test("matches brute-force DP on random small strings") {
    val rng = new Corpus.Rng(17L)
    def rand(): String = Array.fill(60)(('a' + rng.nextInt(3)).toChar).mkString
    for (_ <- 0 until 200) {
      val a = rand(); val b = rand()
      assert(SuffixOverlap.longestCommonSubstring(a, b) === bruteLcs(a, b), s"a=$a b=$b")
    }
  }
  test("verbatim block detected") {
    val block = "the quick brown fox jumps over the lazy dog repeatedly"
    val a = s"xxxx yyy $block zz ww"
    val b = s"unrelated prefix $block and suffix"
    assert(SuffixOverlap.longestCommonSubstring(a, b) >= block.length)
  }
  test("corpus verbatim-block fixture exceeds threshold") {
    val cfg = GraftConfig()
    // find a VerbatimBlock row and its parent
    val i = (0L until 1000L).find(j => Corpus.kindOf(j).isInstanceOf[Corpus.VerbatimBlock]).get
    val p = Corpus.kindOf(i).parent
    val lcs = SuffixOverlap.longestCommonSubstring(Corpus.textOf(i, 42L), Corpus.textOf(p, 42L))
    assert(lcs >= cfg.minSubstringOverlap, s"lcs=$lcs")
  }
}

class CorpusSpec extends AnyFunSuite {
  test("deterministic: same index -> same page") {
    for (i <- Seq(0L, 1L, 15L, 16L, 100L, 999L)) {
      val a = Corpus.page(i, 42L); val b = Corpus.page(i, 42L)
      assert(a.url === b.url && a.text === b.text && a.html.sameElements(b.html))
    }
  }
  test("planned variants relate to parents as designed") {
    val g = 10L // plain group
    val base0 = Corpus.textOf(g * 16, 42L)
    assert(Corpus.textOf(g * 16 + 10, 42L) === base0) // exact dup
    val near = Corpus.textOf(g * 16 + 11, 42L)
    assert(near !== Corpus.textOf(g * 16 + 1, 42L)) // edited
    // case url dup: g=7 -> g%17==7
    val cu = 7L * 16 + 8
    assert(Corpus.kindOf(cu).isInstanceOf[Corpus.CaseUrlDup])
    assert(Corpus.urlOf(cu).toLowerCase === Corpus.urlOf(7L * 16 + 7).toLowerCase)
    assert(Corpus.urlOf(cu) !== Corpus.urlOf(7L * 16 + 7))
  }
  test("empty and low-entropy rows exist as planned") {
    val emptyIdx = (0L until 2000L).find(j => Corpus.kindOf(j) == Corpus.EmptyDoc()).get
    assert(Corpus.textOf(emptyIdx, 42L) === "")
    val lowIdx = (0L until 2000L).find(j => Corpus.kindOf(j) == Corpus.LowEntropy()).get
    val cfg = GraftConfig()
    val sig = DocSignatures.of(Corpus.textOf(lowIdx, 42L), cfg, new MinHasher(cfg.numPerm, cfg.seed))
    assert(sig.isRejected, "low-entropy doc must have all-zero simhash slots")
  }
  test("urls unique (case-sensitively) over a window") {
    val urls = (0L until 5000L).map(Corpus.urlOf)
    assert(urls.distinct.size === urls.size)
  }
}
