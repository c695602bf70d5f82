package graft.ref

import graft.analysis.Analyzer
import scala.collection.mutable

/** Pure-Scala, single-threaded oracle reproducing the reference's exact BM25
  * semantics, used by the rank-identity tests (SURVEY.md §5):
  *
  *  - scoring math of BM25Reranker.cs:398-418 (including the Lucene-style
  *    non-negative idf `ln(1 + (N-df+0.5)/(df+0.5))` — divergence D7 — and
  *    the k3 query-term saturation);
  *  - corpus statistics of BM25Reranker.cs:318-346 (df counts distinct terms
  *    per doc once; avgdl = mean token count);
  *  - top-N semantics of BM25Reranker.cs:223-256 (bounded min-heap over
  *    scores downcast to float, strict `>` keeps first-seen on ties,
  *    results yielded descending — D2/D3).
  *
  * Everything is driver-side and O(corpus) — it exists only to pin the
  * distributed engine's results on small fixtures.
  */
object OracleBm25 {

  final case class Params(k1: Double = 1.5, b: Double = 0.75, k3: Double = 1000.0)
  /** North-star parameterization (BASELINE.json: Okapi k1=1.2, b=0.75). */
  val NorthStar: Params = Params(k1 = 1.2, b = 0.75, k3 = 1000.0)
  /** Reference constructor defaults (BM25Reranker.cs:57-62). */
  val RefDefaults: Params = Params(k1 = 1.5, b = 0.75, k3 = 1000.0)

  final case class Stats(n: Long, avgdl: Double, df: Map[String, Long])

  /** Analyzer with the same pluggable normalizer seam as the engine
    * (stopword checked on the normalized form, like the reference's
    * stopword-on-lemma) — rank-identity tests must run the SAME Norm on
    * both sides. */
  def analyze(text: String, stop: Set[String],
              norm: Analyzer.Norm = Analyzer.Identity): Array[String] =
    Analyzer.tokenize(text, stop, norm)

  def computeStats(docs: Seq[Array[String]]): Stats = {
    val df = mutable.HashMap.empty[String, Long]
    var totalLen = 0L
    docs.foreach { terms =>
      totalLen += terms.length
      terms.toSet.foreach((t: String) => df.update(t, df.getOrElse(t, 0L) + 1L))
    }
    val n = docs.size.toLong
    Stats(n, if (n == 0) 0.0 else totalLen.toDouble / n, df.toMap)
  }

  /** BM25Reranker.cs:398-418, verbatim math. */
  def score(queryTf: Map[String, Int], docTf: Map[String, Int], docLen: Int,
            stats: Stats, p: Params): Double = {
    var s = 0.0
    queryTf.foreach { case (term, qf) =>
      (docTf.get(term), stats.df.get(term)) match {
        case (Some(f), Some(df)) if f != 0 =>
          val idf = math.log(1 + (stats.n - df + 0.5) / (df + 0.5))
          val tf = f * (p.k1 + 1) / (f + p.k1 * (1 - p.b + p.b * docLen / stats.avgdl))
          val qtf = qf * (p.k3 + 1) / (qf + p.k3)
          s += idf * tf * qtf
        case _ => ()
      }
    }
    s
  }

  /** Score every doc in input order (≅ ScoreAsync two-pass mode,
    * BM25Reranker.cs:170-210). Returns (docIndex, score). */
  def scoreAll(query: String, docs: Seq[String], stop: Set[String],
               p: Params = RefDefaults,
               norm: Analyzer.Norm = Analyzer.Identity): Seq[(Int, Double)] = {
    val analyzed = docs.map(analyze(_, stop, norm))
    val stats = computeStats(analyzed)
    val qTf = Analyzer.termFreqs(analyze(query, stop, norm))
    analyzed.zipWithIndex.map { case (terms, i) =>
      (i, score(qTf, Analyzer.termFreqs(terms), terms.length, stats, p))
    }
  }

  /** Top-N with the reference's heap semantics (BM25Reranker.cs:223-256):
    * float downcast (D3), strict `>` so first-seen wins ties (D2),
    * descending output. */
  def rank(query: String, docs: Seq[String], topN: Int, stop: Set[String],
           p: Params = RefDefaults,
           norm: Analyzer.Norm = Analyzer.Identity): Seq[(Int, Float)] = {
    val scored = scoreAll(query, docs, stop, p, norm)
    // Bounded min-heap keyed by float score; on equal-to-min we keep the
    // incumbent (the reference only replaces when strictly greater, :236).
    val heap = mutable.PriorityQueue.empty[(Float, Int)](
      Ordering.by[(Float, Int), Float](_._1).reverse) // min-heap on score
    scored.foreach { case (i, d) =>
      val f = d.toFloat
      if (heap.size < topN) heap.enqueue((f, i))
      else if (f > heap.head._1) { heap.dequeue(); heap.enqueue((f, i)) }
    }
    heap.dequeueAll.toSeq.reverse.map { fi: (Float, Int) => (fi._2, fi._1) }
  }
}
