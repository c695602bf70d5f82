package graft

import graft.codec.Postings
import graft.query.{Bm25, Wand}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Block-max WAND must actually PRUNE (score far fewer docs than the
  * exhaustive path) while returning identical top-k. */
class WandPruningSpec extends AnyFunSuite {

  test("WAND scores a small fraction of candidates on a skewed synthetic shard") {
    val rnd = new Random(5)
    val nDocs = 200000
    val lens = Array.fill(nDocs)(20 + rnd.nextInt(100))
    // head term: in every 2nd doc, tf 1-2 (low scores)
    val headDocs = (0 until nDocs by 2).map(_.toLong).toArray
    val headTfs = headDocs.map(_ => 1 + rnd.nextInt(2))
    // rare term: 200 docs, high tf (the real top-k drivers)
    val rareDocs = (0 until 200).map(i => (i * 997L) % nDocs).distinct.sorted.toArray
    val rareTfs = rareDocs.map(_ => 5 + rnd.nextInt(5))
    val terms = Seq(
      Wand.TermInput(Postings.encode(0, "head", headDocs, headTfs,
        headDocs.map(d => lens(d.toInt))), 1, headDocs.length.toLong),
      Wand.TermInput(Postings.encode(0, "rare", rareDocs, rareTfs,
        rareDocs.map(d => lens(d.toInt))), 1, rareDocs.length.toLong))
    val n = nDocs.toLong
    val avgdl = lens.map(_.toLong).sum.toDouble / nDocs

    val w = Wand.topK(terms, n, avgdl, 10, Bm25.RefDefaults)
    val scored = Wand.lastScoredCount.get
    val e = Wand.topKExhaustive(terms, n, avgdl, 10, Bm25.RefDefaults)

    assert(w.map(_.docId).sameElements(e.map(_.docId)), "WAND top-k != exhaustive top-k")
    w.zip(e).foreach { case (a, b) => assert(math.abs(a.score - b.score) < 1e-9) }
    val candidates = headDocs.length + rareDocs.length
    assert(scored < candidates / 5,
      s"WAND scored $scored of $candidates candidate postings — no real pruning")
  }
}
