package graft

import graft.analysis.{Analyzer, StopWords}
import graft.ref.OracleBm25
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts ported from the reference tests (FIXTURES.md §4):
  * /root/reference/tests/SemanticKernel.Rankers.BM25.Tests/BM25RerankerBasicTests.cs
  */
class AnalyzerOracleSpec extends AnyFunSuite {

  val F1 = Seq(
    "The cat is sleeping on the mat",
    "Dogs are loyal pets",
    "A black cat crossed the street")

  val F2 = Seq(
    "Machine learning is a subset of artificial intelligence",
    "Deep learning uses neural networks",
    "Artificial intelligence encompasses machine learning",
    "Neural networks are used in machine learning",
    "Cooking recipes for beginners",
    "Machine learning algorithms are powerful")

  val F3 = Seq(
    "The quick brown fox jumps over the lazy dog.",
    "The fox",
    "The dog",
    "A brown dog jumps over another dog.",
    "The quick brown fox.",
    "Machine learning is a subset of artificial intelligence.",
    "Natural language processing helps computers understand human language.",
    "The algorithm processes documents efficiently.",
    "Information retrieval systems rank documents by relevance.",
    "Text mining extracts useful information from unstructured data.")

  val en = StopWords.english

  test("fused analyze ≡ termFreqs ∘ tokenize on varied inputs") {
    val inputs = F1 ++ F2 ++ F3 ++ Seq("", "   ", "a", "The THE the", "x'y-z 42!! Ünïcödé",
      F3.mkString(" "), "don't won't can't", "tok0 tok0 tok0 rare99")
    inputs.foreach { t =>
      val (len, terms, tfs) = Analyzer.analyze(t, en)
      val toks = Analyzer.tokenize(t, en)
      val tfm = Analyzer.termFreqs(toks)
      assert(len == toks.length, s"len mismatch for '$t'")
      assert(terms.toSeq == tfm.keys.toSeq.sorted, s"terms mismatch for '$t'")
      assert(terms.zip(tfs).toMap == tfm, s"tfs mismatch for '$t'")
    }
  }

  test("PartitionAnalyzer ≡ analyze: fixed cases, random fuzz, norm collisions") {
    import graft.analysis.PartitionAnalyzer
    def check(pa: PartitionAnalyzer, t: String, stop: Set[String],
              norm: Analyzer.Norm): Unit = {
      val (l1, t1, f1) = pa.analyze(t)
      val (l2, t2, f2) = Analyzer.analyze(t, stop, norm)
      assert(l1 == l2, s"len mismatch for '$t'")
      assert(t1.toSeq == t2.toSeq, s"terms mismatch for '$t'")
      assert(f1.toSeq == f2.toSeq, s"tfs mismatch for '$t'")
    }
    // fixed inputs, reused instance (per-doc state must fully reset)
    val pa = new PartitionAnalyzer(en)
    val fixed = F1 ++ F2 ++ F3 ++ Seq("", "   ", null, "a", "The THE the",
      "x'y-z 42!! Ünïcödé", F3.mkString(" "), "ab𝒜cd ab😀cd", "tok0 tok0 rare99")
    fixed.foreach(t => check(pa, t, en, Analyzer.Identity))
    // seeded fuzz: many docs through ONE instance, growing vocabulary past
    // the initial table capacity to force a mid-doc rehash
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh 0123 .!?ü東 "
    (0 until 300).foreach { i =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(400)).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
      sb ++= s" uniq${i}a uniq${i}b uniq${i}c uniq${i}d uniq${i}e uniq${i}f"
      check(pa, sb.toString, en, Analyzer.Identity)
    }
    // a normalizer that collides distinct raw tokens onto one term must
    // merge their per-doc counts identically in both implementations
    val strip: Analyzer.Norm = s => s.stripSuffix("s").stripSuffix("ing")
    val pn = new PartitionAnalyzer(en, strip)
    Seq("running runs run runnings", "dogs dog DOGS doging",
        "the States stating state").foreach(t => check(pn, t, en, strip))
  }

  test("analyzer is deterministic and stopword/punctuation-dropping") {
    val t = Analyzer.tokenize("The quick brown fox jumps over the lazy dog.", en)
    assert(t.sameElements(Array("quick", "brown", "fox", "jumps", "lazy", "dog")))
    assert(Analyzer.tokenize("", en).isEmpty)
    assert(Analyzer.tokenize("   !!! ...", en).isEmpty)
    // case-insensitive stopwords, digits kept
    assert(Analyzer.tokenize("THE The the 42", en).sameElements(Array("42")))
    // determinism
    for (_ <- 0 until 10)
      assert(Analyzer.tokenize(F3.mkString(" "), en).sameElements(
        Analyzer.tokenize(F3.mkString(" "), en)))
  }

  test("tokenizer is codepoint-aware: accents, CJK, astral-plane letters") {
    // mirrors what DuckDB's regexp '[\p{L}\p{Nd}]+' on lower(text) yields
    assert(Analyzer.tokenizeRaw("Café Ärger 42 naïve Москва 東京")
      .sameElements(Array("café", "ärger", "42", "naïve", "москва", "東京")))
    // astral-plane letter (U+1D49C, surrogate pair) is one token char, and
    // an astral non-letter (emoji) splits tokens
    assert(Analyzer.tokenizeRaw("ab𝒜cd").sameElements(Array("ab𝒜cd")))
    assert(Analyzer.tokenizeRaw("ab😀cd").sameElements(Array("ab", "cd")))
    // polyHash31 folds codepoints (like SQL ascii()), not UTF-16 units
    val astral = "𝒜" // U+1D49C = 119964
    assert(graft.analysis.TextHash.polyHash31(astral) == 119964L)
    assert(graft.analysis.TextHash.polyHash31("a" + astral) ==
      ('a'.toLong * 31 + 119964L) % 2147483647L)
  }

  test("fused hash kernels ≡ their string-building definitions") {
    import graft.analysis.TextHash
    val rnd = new scala.util.Random(7)
    val words = Array("spark", "a", "东京", "naïve", "ab𝒜cd", "x1", "q", "longtokenhere")
    for (_ <- 1 to 200) {
      val toks = Array.fill(rnd.nextInt(9))(words(rnd.nextInt(words.length)))
      // windowPolyHash31 ≡ polyHash31 of the space-joined shingle string
      for (w <- 1 to 3; i <- 0 to toks.length - w)
        assert(TextHash.windowPolyHash31(toks, i, w) ==
          TextHash.polyHash31(toks.slice(i, i + w).mkString(" ")))
      // the fused MinHash signature ≡ the shingles().distinct composition
      val sh = TextHash.shingles(toks).distinct
      val expected =
        if (sh.isEmpty) Array.empty[Long]
        else TextHash.minHashSig(sh.iterator.map(TextHash.polyHash31), 8)
      assert(TextHash.minHashSigWindows(toks, 3, 8).sameElements(expected))
      // simHash63's prefix-fold h2/h3 ≡ the string-concat definition
      for (t <- toks) {
        assert(TextHash.polyHash31("#" + t) ==
          { var h = 35L; t.codePoints().toArray.foreach(cp => h = (h * 31 + cp) % TextHash.P31); h })
        assert(TextHash.polyHash31("##" + t) ==
          { var h = 1120L; t.codePoints().toArray.foreach(cp => h = (h * 31 + cp) % TextHash.P31); h })
      }
    }
  }

  test("F1 + 'cat': both cat docs strictly outscore the dog doc (BM25RerankerBasicTests.cs:40-43)") {
    val scores = OracleBm25.scoreAll("cat", F1, en).map(_._2)
    assert(scores(0) > scores(1))
    assert(scores(2) > scores(1))
    assert(scores(0) > 0 && scores(2) > 0)
  }

  test("empty query: all scores exactly 0 (BM25RerankerBasicTests.cs:64-66)") {
    assert(OracleBm25.scoreAll("", F1, en).forall(_._2 == 0.0))
  }

  test("F2 + 'machine learning' topN=3: exactly 3, descending (BM25RerankerBasicTests.cs:92-98)") {
    val top = OracleBm25.rank("machine learning", F2, 3, en)
    assert(top.size == 3)
    assert(top.sliding(2).forall { case Seq(a, b) => a._2 >= b._2; case _ => true })
    // the cooking doc (index 4) must not rank
    assert(!top.map(_._1).contains(4))
  }

  test("score is 0 iff no term overlap; monotone in tf") {
    val docs = Seq("alpha beta", "gamma delta", "alpha alpha beta")
    val s = OracleBm25.scoreAll("alpha", docs, Set.empty).map(_._2)
    assert(s(1) == 0.0 && s(0) > 0.0)
    // doc 2 has tf=2 for alpha but is longer; against same-length doc tf wins
    val s2 = OracleBm25.scoreAll("alpha", Seq("alpha beta gamma", "alpha alpha beta"), Set.empty).map(_._2)
    assert(s2(1) > s2(0))
  }

  test("north-star params (k1=1.2) and ref defaults (k1=1.5) both rank F3 sensibly") {
    for (p <- Seq(OracleBm25.RefDefaults, OracleBm25.NorthStar)) {
      val top = OracleBm25.rank("quick brown fox", F3, 3, en, p)
      // doc 4 "The quick brown fox." (short, all terms) must be #1
      assert(top.head._1 == 4)
      assert(top.map(_._1).contains(0))
    }
  }
}
