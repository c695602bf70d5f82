package graft

import graft.analysis.Analyzer
import graft.build.{IndexBuilder, Manifests, PositionIndex}
import graft.codec.PosPostings
import graft.model.{StageManifest, Turn}
import graft.query.{PosSearcher, Searcher}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Positional sidecar: codec roundtrip + encoded-piece merge, phrase
  * matching vs a brute-force containsSlice oracle over the raw token
  * stream (stopword-gap, stopword-only, repeated-token, boundary and
  * absent phrases), flush-path equivalence, and the base-build guard. */
class PositionIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- codec ---------------------------------------------------------------

  test("codec: encode/decode roundtrip and concatEncoded == whole encode") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val docIds = Array.iterate(3L, n)(d => d + 1 + rnd.nextInt(50))
    val positions = Array.fill(n) {
      val k = 1 + rnd.nextInt(6)
      Array.iterate(rnd.nextInt(4), k)(p => p + 1 + rnd.nextInt(9))
    }
    val whole = PosPostings.encode(5, "t", docIds, positions)
    val (d2, p2) = PosPostings.decode(whole)
    assert(d2.toSeq == docIds.toSeq)
    assert(p2.map(_.toSeq).toSeq == positions.map(_.toSeq).toSeq)

    // split into 3 pieces, encode each independently, merge encoded
    val cuts = Seq(0 -> 70, 70 -> 71, 71 -> n)
    val pieces = cuts.map { case (a, b) =>
      val pp = PosPostings.encode(5, "t", docIds.slice(a, b), positions.slice(a, b))
      PosPostings.Piece(docIds(a), docIds(b - 1), b - a,
        pp.docsBlob, pp.cntsBlob, pp.posBlob)
    }
    val merged = PosPostings.concatEncoded(5, "t", pieces)
    assert(merged.count == whole.count)
    assert(merged.docsBlob.toSeq == whole.docsBlob.toSeq)
    assert(merged.cntsBlob.toSeq == whole.cntsBlob.toSeq)
    assert(merged.posBlob.toSeq == whole.posBlob.toSeq)
  }

  test("codec: docId 0 in the first piece is accepted") {
    val one = PosPostings.encode(0, "z", Array(0L, 4L), Array(Array(1), Array(0, 2)))
    val (d, p) = PosPostings.decode(one)
    assert(d.toSeq == Seq(0L, 4L) && p(1).toSeq == Seq(0, 2))
  }

  // ---- phrase matching vs brute force ---------------------------------------

  /** Deterministic word-salad corpus over a vocab heavy in stopwords. */
  private lazy val corpus: Seq[(String, String)] = {
    val vocab = Array("a", "the", "of", "batch", "data", "merge", "scan",
      "sort", "fast", "is")
    val rnd = new scala.util.Random(7)
    (0 until 60).map { i =>
      val n = 5 + rnd.nextInt(25)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      (f"doc-$i%04d", words.mkString(" "))
    } ++ Seq(
      ("doc-9000", "the batch data the batch"), // phrase at start + repeat
      ("doc-9001", "merge a the"),              // stopword-only phrase at end
      ("doc-9002", "batch the data"),           // near-miss permutation
      ("doc-9003", "the the the"))              // repeated stopword
  }

  private def buildDirs(flushPositions: Int): String = {
    val dir = TestSpark.tmpDir("posidx")
    val turns = corpus.map { case (id, text) =>
      Turn(id, 0, "user", text, "", new Timestamp(Transcripts_BaseEpochMs))
    }.toDS()
    IndexBuilder.build(spark, turns.toDF(), dir, IndexBuilder.Config(shards = 4))
    PositionIndex.build(spark, turns.toDF(), dir, flushPositions = flushPositions)
    dir
  }
  private val Transcripts_BaseEpochMs = graft.sources.Transcripts.BaseEpochMs

  private def matchedIds(dir: String, phrase: String): Set[String] = {
    val ps = new PosSearcher(spark, dir)
    val toks = Analyzer.tokenizeRaw(phrase).toSeq
    ps.matchDocs(toks)
      .join(Searcher.docMeta(spark, dir), "docId")
      .select("conv_id").as[String].collect().toSet
  }

  private def bruteIds(phrase: String): Set[String] = {
    val toks = Analyzer.tokenizeRaw(phrase).toSeq
    corpus.collect {
      case (id, text) if Analyzer.tokenizeRaw(text).toSeq.containsSlice(toks) => id
    }.toSet
  }

  private val phrases = Seq(
    "the batch",            // stopword + content
    "the batch data",       // trigram with stopword head
    "a the",                // stopword-only
    "the the",              // repeated stopword
    "batch",                // single token
    "the batch data the",   // repeated token across the phrase
    "fast sort merge scan", // likely-rare conjunction
    "data of is the batch a merge") // almost surely absent

  test("phrase matches == brute-force containsSlice over raw tokens") {
    val dir = buildDirs(PositionIndex.DefaultFlushPositions)
    for (ph <- phrases)
      assert(matchedIds(dir, ph) == bruteIds(ph), s"phrase '$ph'")
  }

  test("tiny flush cap (multi-chunk merge path) gives identical matches") {
    val dir = buildDirs(flushPositions = 8)
    for (ph <- phrases)
      assert(matchedIds(dir, ph) == bruteIds(ph), s"phrase '$ph' under flush=8")
  }

  /** Min ORDERED span by full combination enumeration (independent of the
    * kernel's greedy sweep); Int.MaxValue when no ordered selection. */
  private def bruteSlopIds(phrase: String, slop: Int): Set[String] = {
    val toks = Analyzer.tokenizeRaw(phrase).toSeq
    corpus.map { case (id, text) =>
      val tt = Analyzer.tokenizeRaw(text).toIndexedSeq
      val posPer = toks.map(t => tt.indices.filter(i => tt(i) == t).toIndexedSeq)
      def combos(j: Int, prev: Int, first: Int): Seq[Int] =
        if (j == toks.length) Seq(prev - first + 1)
        else posPer(j).filter(_ > prev).flatMap(p =>
          combos(j + 1, p, if (j == 0) p else first))
      val sp = combos(0, -1, 0)
      (id, if (sp.isEmpty) Int.MaxValue else sp.min)
    }.collect { case (id, s) if s != Int.MaxValue && s - toks.length <= slop => id }.toSet
  }

  test("ordered sloppy phrase ≡ brute enumeration; slop 0 ≡ exact phrase; monotone") {
    val dir = buildDirs(flushPositions = 1 << 20)
    def slopIds(phrase: String, slop: Int): Set[String] = {
      val ps = new PosSearcher(spark, dir)
      ps.phraseSlopDocs(Analyzer.tokenizeRaw(phrase).toSeq, slop)
        .join(Searcher.docMeta(spark, dir), "docId")
        .select("conv_id").as[String].collect().toSet
    }
    for (phrase <- Seq("the batch", "batch data", "sort merge",
           "the batch data", "the the"); // repeated token: strictly increasing
         slop <- Seq(0, 2, 5))
      assert(slopIds(phrase, slop) == bruteSlopIds(phrase, slop),
        s"mismatch for '$phrase' slop $slop")
    // slop 0 over a trigram == exact containsSlice adjacency
    assert(slopIds("the batch data", 0) == bruteIds("the batch data"))
    // monotone in slop
    assert(slopIds("sort merge", 0).subsetOf(slopIds("sort merge", 4)))
  }

  test("sidecar refuses an index with streamed/appended documents") {
    val dir = TestSpark.tmpDir("posidx_hwm")
    val turns = corpus.take(5).map { case (id, text) =>
      Turn(id, 0, "user", text, "", new Timestamp(Transcripts_BaseEpochMs))
    }.toDS()
    IndexBuilder.build(spark, turns.toDF(), dir, IndexBuilder.Config(shards = 2))
    Manifests.write(dir, StageManifest("stream_hwm_max", 1L, 0L, "done", 0L))
    val ex = intercept[IllegalArgumentException] {
      PositionIndex.build(spark, turns.toDF(), dir)
    }
    assert(ex.getMessage.contains("compact first"))
  }
}
