package graft

import graft.analysis.StopWords
import graft.build.IndexBuilder
import graft.query.{Bm25, Searcher}
import graft.ref.OracleBm25
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: build the index over the reference fixture corpora, query
  * through both paths (WAND kernel and relational exhaustive), assert
  * rank-identity against the pure-Scala oracle (SURVEY.md §5). */
class IndexEndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Engine top-k on a fixture corpus vs oracle; both parameterizations. */
  private def checkRankIdentity(texts: Seq[String], query: String, k: Int): Unit = {
    for (p <- Seq(Bm25.RefDefaults, Bm25.NorthStar)) {
      val dir = TestSpark.tmpDir("idx")
      val turns = Transcripts.fixture(spark, "c0", texts)
      IndexBuilder.build(spark, turns.toDF(), dir, IndexBuilder.Config(shards = 4))
      val searcher = new Searcher(spark, dir, p)

      val oracle = OracleBm25
        .scoreAll(query, texts, StopWords.english,
          OracleBm25.Params(p.k1, p.b, p.k3))
        .filter(_._2 > 0.0)
        .sortBy { case (i, s) => (-s, i) }
        .take(k)

      for (path <- Seq("wand", "exhaustive-kernel", "relational")) {
        val got = (path match {
          case "wand"              => searcher.topK(query, k)
          case "exhaustive-kernel" => searcher.topK(query, k, exhaustiveKernel = true)
          case "relational"        => searcher.topKExhaustive(query, k)
        }).select("turn_idx", "score").as[(Int, Double)].collect()

        assert(got.length == oracle.length,
          s"[$path,k1=${p.k1}] size ${got.length} vs oracle ${oracle.length} for '$query'")
        got.zip(oracle).zipWithIndex.foreach { case (((gi, gs), (oi, os)), r) =>
          assert(math.abs(gs - os) <= 1e-12 * math.max(1.0, math.abs(os)),
            s"[$path,k1=${p.k1}] rank $r score $gs vs oracle $os ('$query')")
          // identical doc unless an exact-tie permutation (D2)
          if (gi != oi) assert(math.abs(gs - os) <= 1e-12,
            s"[$path,k1=${p.k1}] rank $r doc $gi vs oracle $oi with differing scores")
        }
      }
    }
  }

  test("rank-identity: F3 + reference query set") {
    checkRankIdentity(Transcripts.F3, "quick brown fox", 5)
    checkRankIdentity(Transcripts.F3, "machine learning", 5)
    checkRankIdentity(Transcripts.F3, "information processing", 3)
    checkRankIdentity(Transcripts.F3, "quick brown", 10)
  }

  test("rank-identity: F1 'cat' and F2 'machine learning'") {
    checkRankIdentity(Transcripts.F1, "cat", 3)
    checkRankIdentity(Transcripts.F2, "machine learning", 3)
  }

  test("F1 contract: cat docs strictly outscore dog doc through the engine") {
    val dir = TestSpark.tmpDir("idx")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", Transcripts.F1).toDF(), dir,
      IndexBuilder.Config(shards = 2))
    val s = new Searcher(spark, dir)
    val scores = s.scoreAll("cat", keepZeros = true)
      .orderBy("turn_idx").select("score").as[Double].collect()
    assert(scores(0) > scores(1) && scores(2) > scores(1))
    assert(scores(1) == 0.0)
  }

  test("empty query: scoreAll keeps every doc at exactly 0; topK empty") {
    val dir = TestSpark.tmpDir("idx")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", Transcripts.F3).toDF(), dir,
      IndexBuilder.Config(shards = 2))
    val s = new Searcher(spark, dir)
    val all = s.scoreAll("", keepZeros = true).collect()
    assert(all.length == Transcripts.F3.size)
    assert(all.forall(_.getAs[Double]("score") == 0.0))
    assert(s.topK("", 5).count() == 0)
  }

  test("per-turn text equality invariant vs source (stable conv_id, turn_idx order)") {
    val dir = TestSpark.tmpDir("idx")
    val turns = Transcripts.synth(spark, 2000, turnsPerConv = 7)
    IndexBuilder.build(spark, turns.toDF(), dir, IndexBuilder.Config(shards = 8))
    val docs = graft.query.Searcher.docMeta(spark, dir)
    // every source turn appears exactly once with a unique docId
    assert(docs.count() == 2000)
    assert(docs.select("docId").distinct().count() == 2000)
    val joined = turns.toDF().join(docs, Seq("conv_id", "turn_idx"), "full_outer")
    assert(joined.filter($"docId".isNull || $"text".isNull).count() == 0)
    // doc length equals analyzer token count of the source text
    val an = spark.read.parquet(s"$dir/analyzed").select($"conv_id", $"turn_idx", $"len")
    val src = turns.toDF().withColumn("explen",
      udf((t: String) => graft.analysis.Analyzer.tokenizeEn(t).length).apply($"text"))
    assert(src.join(an, Seq("conv_id", "turn_idx")).filter($"len" =!= $"explen").count() == 0)
  }

  test("docIds and top-k identical when built at different parallelism (N vs 4N evidence)") {
    val turns = Transcripts.synth(spark, 3000, turnsPerConv = 11)
    val dirA = TestSpark.tmpDir("idxA")
    val dirB = TestSpark.tmpDir("idxB")
    IndexBuilder.build(spark, turns.toDF().repartition(2), dirA, IndexBuilder.Config(shards = 8, buildPartitions = 2))
    IndexBuilder.build(spark, turns.toDF().repartition(16), dirB, IndexBuilder.Config(shards = 8, buildPartitions = 8))
    val a = graft.query.Searcher.docMeta(spark, dirA).select("conv_id", "turn_idx", "docId")
    val b = graft.query.Searcher.docMeta(spark, dirB).select("conv_id", "turn_idx", "docId")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    val qa = new Searcher(spark, dirA).topK("quick brown fox tok0", 10)
      .select("conv_id", "turn_idx", "score").collect().toSeq
    val qb = new Searcher(spark, dirB).topK("quick brown fox tok0", 10)
      .select("conv_id", "turn_idx", "score").collect().toSeq
    assert(qa == qb)
  }

  test("WAND ≡ exhaustive on a random synthetic corpus") {
    val dir = TestSpark.tmpDir("idx")
    val turns = Transcripts.synth(spark, 5000, turnsPerConv = 13)
    IndexBuilder.build(spark, turns.toDF(), dir, IndexBuilder.Config(shards = 8))
    val s = new Searcher(spark, dir)
    for (q <- Seq("quick brown fox", "tok0", "machine learning datasets",
                  "posting lists variable bytes", "tok0 rare1000")) {
      val w = s.topK(q, 20).select("docId", "score").as[(Long, Double)].collect()
      val e = s.topK(q, 20, exhaustiveKernel = true).select("docId", "score").as[(Long, Double)].collect()
      assert(w.map(_._1).sameElements(e.map(_._1)), s"docs differ for '$q'")
      w.zip(e).foreach { case ((_, ws), (_, es)) =>
        assert(math.abs(ws - es) <= 1e-9 * math.max(1.0, math.abs(es)))
      }
    }
  }

  test("resume: completed stages are not recomputed; second build is a no-op") {
    val dir = TestSpark.tmpDir("idx")
    val turns = Transcripts.fixture(spark, "c0", Transcripts.F3).toDF()
    IndexBuilder.build(spark, turns, dir, IndexBuilder.Config(shards = 2))
    val manifests = graft.build.Manifests.all(dir)
      .filter(m => Set("analyzed", "stats", "df", "postings").contains(m.stage))
    assert(manifests.map(_.stage).toSet ==
      Set("analyzed", "stats", "df", "postings"))
    assert(manifests.forall(_.status == "done"))
    assert(manifests.forall(_.bytes > 0))
    // tamper: record analyzed mtime, rebuild, nothing rewritten
    val analyzedDir = new java.io.File(s"$dir/analyzed")
    val postingsDir = new java.io.File(s"$dir/postings")
    val beforeA = analyzedDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    IndexBuilder.build(spark, turns, dir, IndexBuilder.Config(shards = 2))
    val afterA = analyzedDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(beforeA == afterA)
    // clear one manifest → only that stage reruns
    graft.build.Manifests.clear(dir, "postings")
    IndexBuilder.build(spark, turns, dir, IndexBuilder.Config(shards = 2))
    assert(graft.build.Manifests.isDone(dir, "postings"))
    val afterA2 = analyzedDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(beforeA == afterA2)
    // simulated crash mid-stage: manifest absent + corrupt partial output →
    // rebuild overwrites and produces a correct stage
    graft.build.Manifests.clear(dir, "postings")
    postingsDir.listFiles().foreach(_.delete())
    java.nio.file.Files.writeString(postingsDir.toPath.resolve("part-garbage.parquet"), "corrupt")
    IndexBuilder.build(spark, turns, dir, IndexBuilder.Config(shards = 2))
    assert(spark.read.parquet(s"$dir/postings").count() > 0)
    val s = new graft.query.Searcher(spark, dir)
    assert(s.topK("quick brown fox", 3).count() == 3)
  }

  test("stopword-only corpus builds an empty postings table without error") {
    // regression (ADVICE r1): a slice whose docs all analyze to zero terms
    // must not break the chunk iterator's hasNext/next contract
    val dir = TestSpark.tmpDir("idxstop")
    val texts = Seq.fill(50)("the and of a is are was")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dir,
      IndexBuilder.Config(shards = 2))
    assert(spark.read.parquet(s"$dir/postings").count() == 0)
    assert(spark.read.parquet(s"$dir/analyzed").count() == 50)
    val s = new graft.query.Searcher(spark, dir)
    assert(s.topK("anything", 5).count() == 0)
  }

  test("multi-language analyzers: fr/de stopwords drop, en fallback") {
    import graft.analysis.{Analyzer, StopWords}
    val fr = Analyzer.tokenize("Le chat est sur la table et les chiens sont là", StopWords.forLang("fr"))
    assert(fr.sameElements(Array("chat", "table", "chiens")))
    val de = Analyzer.tokenize("Die Katze ist auf dem Tisch und alle Hunde sind hier", StopWords.forLang("de"))
    assert(de.sameElements(Array("katze", "tisch", "hunde")))
    // unknown language → English fallback (reference: Unknown→English,
    // BM25Reranker.cs:453-456)
    assert(StopWords.forLang("xx") == StopWords.english)
    // fused analyze agrees for non-English too
    val (len, terms, _) = Analyzer.analyze("Le chat est sur la table", StopWords.french)
    assert(len == 2 && terms.sameElements(Array("chat", "table")))
  }
}
