package graft

import graft.analysis.{Analyzer, EnglishStemmer, StopWords}
import graft.build.IndexBuilder
import graft.query.{Bm25, Searcher}
import graft.ref.OracleBm25
import graft.sources.Transcripts
import org.scalatest.funsuite.AnyFunSuite

/** The shipped English stemmer behind the lemmatizer seam: unit behavior,
  * determinism, and a stemmed build+query end-to-end rank-identity run
  * against the pure-Scala oracle executing the SAME Norm. */
class StemmerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stem conflates inflections to a common form") {
    val groups = Seq(
      Seq("run", "runs", "running"),
      Seq("connect", "connected", "connecting", "connection", "connections"),
      Seq("cat", "cats"),
      Seq("relate", "related", "relating"),
      Seq("happy", "happiness"),
      Seq("pony", "ponies"))
    groups.foreach { g =>
      val stems = g.map(EnglishStemmer.stem).distinct
      assert(stems.size == 1, s"$g stemmed to $stems")
    }
  }

  test("stem leaves short, non-ASCII and already-stemmed tokens alone") {
    assert(EnglishStemmer.stem("go") == "go")
    assert(EnglishStemmer.stem("is") == "is")
    assert(EnglishStemmer.stem("café") == "café")
    assert(EnglishStemmer.stem("tisch") == "tisch")
    assert(EnglishStemmer.stem("x1") == "x1") // digits pass through
    // classic Porter sanity pairs (canonical outputs from Porter's own
    // published vocabulary: agreed → agre, the step-5 e-drop)
    assert(EnglishStemmer.stem("caresses") == "caress")
    assert(EnglishStemmer.stem("agreed") == "agre")
    assert(EnglishStemmer.stem("plastered") == "plaster")
    assert(EnglishStemmer.stem("hopping") == "hop")
  }

  test("stemmed build+query: 'running' retrieves docs containing 'runs'") {
    val texts = Seq(
      "the fox runs across the field every day",
      "a database connection pool keeps connections warm",
      "completely unrelated text about mountains and rivers")
    val dir = TestSpark.tmpDir("idxstem")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dir,
      IndexBuilder.Config(shards = 2, normalizer = Analyzer.EnglishStem))
    val s = new Searcher(spark, dir, normalizer = Analyzer.EnglishStem)
    val hits = s.topK("running", 3).select("turn_idx").as[Int].collect()
    assert(hits.sameElements(Array(0)), s"expected doc 0 only, got ${hits.mkString(",")}")
    val hits2 = s.topK("connecting", 3).select("turn_idx").as[Int].collect()
    assert(hits2.sameElements(Array(1)))
    // identity-normalized index does NOT match (the gap the stemmer closes)
    val dirId = TestSpark.tmpDir("idxident")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dirId,
      IndexBuilder.Config(shards = 2))
    assert(new Searcher(spark, dirId).topK("running", 3).count() == 0)
  }

  test("French light stemmer conflates inflections, leaves stems apart") {
    val fr = Analyzer.FrenchLightStem
    // plural/feminine pairs the light rules are designed to merge
    Seq(
      Seq("maison", "maisons"),
      Seq("chevaux", "cheval"), // -aux → -al (no further rule matches cheval)
      Seq("fenêtre", "fenêtres"),
      Seq("journaux", "journal")).foreach { g =>
      val stems = g.map(fr).distinct
      assert(stems.size == 1, s"$g stemmed to $stems")
    }
    // short words and non-Latin tokens pass through
    assert(fr("les") == "les")
    assert(fr("x123") == "x123")
    // derivational suffixes are NOT touched (light = inflection only)
    assert(fr("national") == "national")
  }

  test("German light stemmer conflates plural/case endings") {
    val de = Analyzer.GermanLightStem
    Seq(
      Seq("frauen", "frau"),
      Seq("kinder", "kind"),
      Seq("jahre", "jahren", "jahr"),
      Seq("autos", "auto"),
      Seq("lehrerinnen", "lehrerin")).foreach { g =>
      val stems = g.map(de).distinct
      assert(stems.size == 1, s"$g stemmed to $stems")
    }
    assert(de("haus") == "haus") // length guard
    assert(de("straße") == "straß") // final-e rule; ß is in-alphabet
  }

  test("stemFor registry: per-language norm with Identity fallback") {
    assert(Analyzer.stemFor("en")("running") == "run")
    assert(Analyzer.stemFor("fr")("maisons") == "maison")
    assert(Analyzer.stemFor("de")("kinder") == "kind")
    assert(Analyzer.stemFor("es")("libros") == "libr")
    assert(Analyzer.stemFor("it")("amici") == "amic")
    assert(Analyzer.stemFor("xx")("maisons") == "maisons")
  }

  test("Spanish light stemmer conflates plural/gender endings") {
    val es = Analyzer.SpanishLightStem
    Seq(
      Seq("libros", "libro", "libras", "libra"), // plural + gender → libr
      Seq("luces", "luz"),                       // orthographic c/z plural
      Seq("veces", "vez"),
      Seq("mujeres", "mujer"),
      Seq("planes", "plan")).foreach { g =>
      val stems = g.map(es).distinct
      assert(stems.size == 1, s"$g stemmed to $stems")
    }
    // short words, non-Latin tokens and consonant-final stems pass through
    assert(es("los") == "los")
    assert(es("x123") == "x123")
    assert(es("mujer") == "mujer")
  }

  test("Italian light stemmer conflates vowel-alternation plurals") {
    val it = Analyzer.ItalianLightStem
    Seq(
      Seq("amico", "amici", "amica", "amiche"), // -he orthographic plural too
      Seq("gatto", "gatti", "gatta"),
      Seq("libri", "libro")).foreach { g =>
      val stems = g.map(it).distinct
      assert(stems.size == 1, s"$g stemmed to $stems")
    }
    assert(it("con") == "con")
    assert(it("x123") == "x123")
  }

  test("French stemmed build+query end-to-end: 'fenêtres' retrieves 'fenêtre'") {
    val texts = Seq(
      "la fenêtre donne sur le jardin du voisin",
      "les chevaux galopent dans la prairie verte",
      "texte sans rapport sur les montagnes lointaines")
    val dir = TestSpark.tmpDir("idxstemfr")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dir,
      IndexBuilder.Config(shards = 2, language = "fr", normalizer = Analyzer.FrenchLightStem))
    val s = new Searcher(spark, dir, language = "fr", normalizer = Analyzer.FrenchLightStem)
    val hits = s.topK("fenêtres", 3).select("turn_idx").as[Int].collect()
    assert(hits.sameElements(Array(0)), s"expected doc 0 only, got ${hits.mkString(",")}")
    val hits2 = s.topK("cheval", 3).select("turn_idx").as[Int].collect()
    assert(hits2.sameElements(Array(1)), s"expected doc 1 only, got ${hits2.mkString(",")}")
  }

  test("rank-identity vs oracle running the same Norm (F3 corpus)") {
    val dir = TestSpark.tmpDir("idxstemf3")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", Transcripts.F3).toDF(), dir,
      IndexBuilder.Config(shards = 4, normalizer = Analyzer.EnglishStem))
    val p = Bm25.RefDefaults
    val s = new Searcher(spark, dir, p, normalizer = Analyzer.EnglishStem)
    for (q <- Seq("quick brown foxes", "learning machines", "information processing")) {
      val oracle = OracleBm25
        .scoreAll(q, Transcripts.F3, StopWords.english,
          OracleBm25.Params(p.k1, p.b, p.k3), norm = Analyzer.EnglishStem)
        .filter(_._2 > 0.0)
        .sortBy { case (i, sc) => (-sc, i) }
        .take(5)
      val got = s.topK(q, 5).select("turn_idx", "score").as[(Int, Double)].collect()
      assert(got.length == oracle.length, s"'$q': ${got.length} vs ${oracle.length}")
      got.zip(oracle).foreach { case ((gi, gs), (oi, os)) =>
        assert(math.abs(gs - os) <= 1e-12 * math.max(1.0, math.abs(os)), s"'$q' score")
        if (gi != oi) assert(math.abs(gs - os) <= 1e-12, s"'$q' doc $gi vs $oi")
      }
    }
  }
}
