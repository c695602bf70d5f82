package graft

import graft.ops.{BpeOps, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Pins BpeOps.bpeTrain to a from-scratch driver-side reference of the
  * classic algorithm (count corpus-weighted adjacent pairs with overlaps,
  * merge the argmax with UTF-8 (cnt, l, r) tie-break, replace greedily
  * left-to-right, stop under minCount) — the distributed version must
  * reproduce the merge SEQUENCE exactly, not just the final vocabulary. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Classic in-memory BPE over a word-count map. */
  private def refTrain(words: Map[String, Long], numMerges: Int,
                       minCount: Long): Seq[(Int, String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq.sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
          if (c1 != c2) c1 > c2
          else if (l1 != l2) TextOps.utf8Less(l1, l2)
          else TextOps.utf8Less(r1, r2)
        }.head
        if (cnt < minCount) done = true
        else {
          out += ((rank, l, r, cnt))
          rank += 1
          vocab = vocab.map { case (syms, n) => (BpeOps.applyMerge(syms, l, r), n) }
        }
      }
    }
    out.toSeq
  }

  private def docsOf(words: Map[String, Long]) =
    words.toSeq.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, (Seq.fill(n.toInt)(w)).mkString(" "))
    }.toDF("doc_id", "text")

  test("Sennrich fixture: merge sequence matches the classic reference") {
    // the canonical BPE example corpus
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val want = refTrain(words, 10, 2L)
    assert(want.nonEmpty && want.head._2 == "e" && want.head._3 == "s" && want.head._4 == 9L,
      s"reference sanity: first merge should be (e,s,9), got ${want.headOption}")
    val got = BpeOps.bpeTrainOver(docsOf(words), 10, 2L)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("greedy replacement and overlap counting: character runs") {
    // "aaaa"×3: (a,a) counts 9 (overlaps included); after the merge each
    // word is [aa, aa]; next round (aa,aa) counts 3
    val words = Map("aaaa" -> 3L)
    val want = refTrain(words, 3, 1L)
    val got = BpeOps.bpeTrainOver(docsOf(words), 3, 1L)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want, s"\n got: $got\nwant: $want")
    assert(got.head == ((0, "a", "a", 9L)), s"overlap count wrong: ${got.head}")
    assert(got(1)._2 == "aa" && got(1)._3 == "aa" && got(1)._4 == 3L)
  }

  test("fuzz: distributed ≡ reference merge sequence on random corpora") {
    val rnd = new scala.util.Random(20260819L)
    val alphabet = "abcdeé"
    for (trial <- 0 until 4) {
      val nWords = 5 + rnd.nextInt(15)
      val words = (0 until nWords).map { _ =>
        val len = 2 + rnd.nextInt(6)
        val w = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1L + rnd.nextInt(8))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      val want = refTrain(words, 12, 2L)
      val got = BpeOps.bpeTrainOver(docsOf(words), 12, 2L)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(got == want, s"trial $trial (words=$words)\n got: $got\nwant: $want")
    }
  }

  test("q_bpe_pieces ≡ from-scratch train + encode, row for row (real corpus, driver params)") {
    // independent greedy encoder: apply the ranked merges in order, each
    // replacing adjacent (l, r) pairs left-to-right — written from the
    // classic algorithm, sharing no code with BpeOps.segmentWord
    def refSegment(word: String, merges: Seq[(String, String)]): Int = {
      var syms = word.map(_.toString).toList
      for ((l, r) <- merges) {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: tail if a == l && b == r => out += (a + b); rest = tail
          case a :: tail => out += a; rest = tail
          case Nil =>
        }
        syms = out.toList
      }
      syms.length
    }
    val sf = "/root/testdata/sf0.001"
    val (numMerges, minCount) = (30, 2L) // the driver's q_bpe_pieces params
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val words = texts.flatMap { case (_, t) =>
      graft.analysis.Analyzer.tokenizeRaw(t).toSeq }
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val refMerges = refTrain(words, numMerges, minCount).map(m => (m._2, m._3))
    assert(refMerges.nonEmpty)
    val want = texts.map { case (id, t) =>
      (id, graft.analysis.Analyzer.tokenizeRaw(t)
        .map(w => refSegment(w, refMerges).toLong).sum)
    }.sortBy(_._1)
    val got = BpeOps.bpePieceCount(spark, sf, numMerges, minCount)
      .as[(Long, Long)].collect().toSeq
    assert(got == want,
      s"piece counts diverge: ${got.zip(want).filter(p => p._1 != p._2).take(5)}")
  }

  test("segmentWord round-trips and bpePieceCount is bounded by chars and tokens") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = refTrain(words, 10, 2L).map(m => (m._2, m._3))
    for (w <- words.keys) {
      val pieces = BpeOps.segmentWord(w, merges)
      assert(pieces.mkString("") == w, s"round-trip broke: $w -> ${pieces.mkString("|")}")
    }
    val sf = "/root/testdata/sf0.001"
    val n = BpeOps.bpePieceCount(spark, sf, numMerges = 8, minCount = 2L)
    val toks = TextOps.tokenCount(spark, sf)
    val joined = n.join(toks, "doc_id")
      .select($"doc_id", $"n_bpe", $"n_tokens").as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    // a doc's BPE piece count is at least its token count (merges cannot
    // cross token boundaries) and strictly below its character count for
    // any non-degenerate merge table
    assert(joined.forall { case (_, nb, nt) => nb >= nt })
  }
}
