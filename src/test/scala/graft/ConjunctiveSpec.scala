package graft

import graft.analysis.{Analyzer, StopWords}
import graft.build.IndexBuilder
import graft.query.{Bm25, Searcher}
import graft.ref.OracleBm25
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Conjunctive (AND-mode) and phrase query semantics:
  *  - topKAnd ≡ brute-force "docs containing every analyzed term" with
  *    OR-mode scores, fuzzed over random corpora/queries;
  *  - matchAllDocs enumerates exactly that doc set;
  *  - phraseTopK requires raw-token ADJACENCY (same-order, gap-free), not
  *    mere co-occurrence. */
class ConjunctiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force AND oracle: docs containing every analyzed query term,
    * scored by the reference-math scorer (score of a full match is the
    * OR-mode score by definition). */
  private def andOracle(q: String, texts: Seq[String]): Seq[(Int, Double)] = {
    val qterms = Analyzer.tokenizeEn(q).distinct
    if (qterms.isEmpty) return Seq.empty
    OracleBm25.scoreAll(q, texts, StopWords.english).filter { case (i, s) =>
      s > 0.0 && {
        val toks = Analyzer.tokenizeEn(texts(i)).toSet
        qterms.forall(toks.contains)
      }
    }
  }

  test("fuzz: AND-mode top-k ≡ brute-force all-terms oracle") {
    val rnd = new Random(20260817L)
    val vocab = (Array("the", "a", "of", "and") ++
      (0 until 30).map(i => s"w$i")).toIndexedSeq
    for (trial <- 0 until 2) {
      val texts = Seq.fill(150 + rnd.nextInt(80)) {
        Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val dir = TestSpark.tmpDir(s"andfuzz$trial")
      IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dir,
        IndexBuilder.Config(shards = 4))
      val s = new Searcher(spark, dir, Bm25.RefDefaults)
      for (qi <- 0 until 6) {
        val q = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val k = 1 + rnd.nextInt(10)
        val got = s.topKAnd(q, k).select("turn_idx", "score").as[(Int, Double)].collect()
        val want = andOracle(q, texts).sortBy { case (i, sc) => (-sc, i) }.take(k)
        assert(got.length == want.length,
          s"[$trial/$qi] size for '$q' k=$k: ${got.length} vs ${want.length}")
        got.zip(want).foreach { case ((gi, gs), (oi, os)) =>
          assert(math.abs(gs - os) <= 1e-12 * math.max(1.0, math.abs(os)),
            s"[$trial/$qi] score $gs vs $os for '$q'")
          if (gi != oi) assert(math.abs(gs - os) <= 1e-12,
            s"[$trial/$qi] doc $gi vs $oi for '$q' (non-tie permutation)")
        }
      }
    }
  }

  test("fuzz: NOT-mode top-k ≡ brute-force exclusion oracle") {
    val rnd = new Random(20260820L)
    val vocab = (Array("the", "a", "of", "and") ++
      (0 until 30).map(i => s"w$i")).toIndexedSeq
    for (trial <- 0 until 2) {
      val texts = Seq.fill(150 + rnd.nextInt(80)) {
        Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val dir = TestSpark.tmpDir(s"notfuzz$trial")
      IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dir,
        IndexBuilder.Config(shards = 4))
      val s = new Searcher(spark, dir, Bm25.RefDefaults)
      for (qi <- 0 until 6) {
        val q = Seq.fill(2 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val e = Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val k = 1 + rnd.nextInt(10)
        val eterms = Analyzer.tokenizeEn(e).toSet
        // the engine drops query terms that are also excluded; mirror that
        // by scoring only the kept raw tokens (vocab words analyze to
        // themselves or to nothing, so token-level removal is exact)
        val qKept = q.split(" ").filterNot(w => eterms.contains(w)).mkString(" ")
        val got = s.topKNot(q, e, k).select("turn_idx", "score").as[(Int, Double)].collect()
        val want = OracleBm25.scoreAll(qKept, texts, StopWords.english)
          .filter { case (i, sc) =>
            sc > 0.0 && Analyzer.tokenizeEn(texts(i)).toSet.intersect(eterms).isEmpty
          }.sortBy { case (i, sc) => (-sc, i) }.take(k)
        assert(got.length == want.length,
          s"[$trial/$qi] size for '$q' NOT '$e' k=$k: ${got.length} vs ${want.length}")
        got.zip(want).foreach { case ((gi, gs), (oi, os)) =>
          assert(math.abs(gs - os) <= 1e-12 * math.max(1.0, math.abs(os)),
            s"[$trial/$qi] score $gs vs $os for '$q' NOT '$e'")
          if (gi != oi) assert(math.abs(gs - os) <= 1e-12,
            s"[$trial/$qi] doc $gi vs $oi for '$q' NOT '$e' (non-tie permutation)")
        }
      }
    }
  }

  test("matchAllDocs enumerates exactly the all-terms docs with OR-identical scores") {
    val dir = TestSpark.tmpDir("matchall")
    IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", Transcripts.F3).toDF(),
      dir, IndexBuilder.Config(shards = 4))
    val s = new Searcher(spark, dir, Bm25.RefDefaults)
    val got = s.matchAllDocs("brown fox")
      .join(Searcher.docMeta(spark, dir), "docId")
      .select("turn_idx", "score").as[(Int, Double)].collect().sortBy(_._1)
    val want = andOracle("brown fox", Transcripts.F3).sortBy(_._1)
    assert(got.map(_._1).toSeq == want.map(_._1))
    got.zip(want).foreach { case ((_, gs), (_, os)) =>
      assert(math.abs(gs - os) <= 1e-12 * math.max(1.0, math.abs(os)))
    }
    // a query with a corpus-absent term matches nothing (strict AND)
    assert(s.matchAllDocs("brown zebrahorse").count() == 0)
    assert(s.topKAnd("brown zebrahorse", 5).count() == 0)
  }

  test("phrase requires adjacency: co-occurring but non-adjacent docs excluded") {
    val dir = TestSpark.tmpDir("phrasedocs")
    Seq(
      (0L, "alpha beta gamma", "en"),
      (1L, "alpha gamma beta", "en"),   // both terms, not adjacent
      (2L, "delta alpha beta", "en"),
      (3L, "beta alpha", "en"),         // wrong order
      (4L, "alphax beta alpha betaz", "en"), // substring tokens must not match
      (5L, "Alpha beta!", "en")          // case/punct-insensitive tokenization
    ).toDF("doc_id", "text", "lang")
      // the driver-surface index build materializes these into the
      // doc-meta sidecar, so any documents table needs them
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = graft.ops.DocQueries.phraseTopK(spark, dir, "alpha beta", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(res == Set(0L, 2L, 5L), s"got $res")
  }
}
