package graft

import graft.analysis.Analyzer
import graft.ops.DocQueries
import org.scalatest.funsuite.AnyFunSuite

/** Driver-recompute contracts for the round-3 retrieval/profile ops:
  * span-near proximity, more-like-this, Zipf coverage, length histogram. */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val texts = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").as[(Long, String)].collect().toMap

  /** Brute-force minimal window covering one occurrence of each term. */
  private def bruteSpan(toks: Array[String], terms: Seq[String]): Option[Int] = {
    val poss = terms.map(t => toks.indices.filter(i => toks(i) == t))
    if (poss.exists(_.isEmpty)) return None
    // product over occurrence choices (fixture docs are small)
    def combos(ls: Seq[Seq[Int]]): Seq[Seq[Int]] = ls match {
      case Seq() => Seq(Seq.empty)
      case h +: t => for (x <- h; rest <- combos(t)) yield x +: rest
    }
    Some(combos(poss).map(c => c.max - c.min + 1).min)
  }

  test("spanNearTopK ≡ brute-force min-span + conjunctive BM25 cut") {
    val (query, window, k) = ("sort join", 4, 10)
    val terms = Analyzer.tokenizeRaw(query).distinct.toSeq
    val wantDocs = texts.collect {
      case (id, t) if bruteSpan(Analyzer.tokenizeRaw(t), terms).exists(_ <= window) => id
    }.toSet
    assert(wantDocs.nonEmpty, "fixture should contain span matches")
    val got = DocQueries.spanNearTopK(spark, sf, query, window, k)
      .as[(Long, Double, Long)].collect()
    assert(got.nonEmpty && got.length <= k)
    // every hit is a true span match with the true minimal span
    got.foreach { case (id, score, span) =>
      val bs = bruteSpan(Analyzer.tokenizeRaw(texts(id)), terms)
      assert(bs.contains(span.toInt), s"doc $id span $span vs brute $bs")
      assert(span <= window && score > 0.0)
      assert(wantDocs.contains(id))
    }
    // k or fewer hits only when the match set itself is smaller
    assert(got.length == math.min(k, wantDocs.size))
  }

  test("moreLikeThis excludes the target and uses its top-TFIDF terms") {
    val (target, n, k) = (0L, 5, 10)
    val got = DocQueries.moreLikeThis(spark, sf, target, n, k)
      .as[(Long, Double)].collect()
    assert(got.nonEmpty && got.length <= k)
    assert(!got.exists(_._1 == target), "target doc must be excluded")
    assert(got.forall(_._2 > 0.0))
    // scores are the ranking keys: non-increasing, ties broken by doc_id
    val pairs = got.sliding(2).filter(_.length == 2)
    pairs.foreach { case Array((d1, s1), (d2, s2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2))
    }
    // the selected query terms really are terms of the target doc
    val tgtToks = Analyzer.tokenizeEn(texts(target)).toSet
    // recompute selection through the same public keywords rule
    val kw = DocQueries.keywords(spark, sf, 1L, n)
      .select("term").as[String].collect().toSet
    assert(kw.subsetOf(tgtToks))
  }

  test("zipfCoverage: shares cumulative, bounded, recomputable from docTf") {
    val limit = 20
    val got = DocQueries.zipfCoverage(spark, sf, limit)
      .as[(String, Long, Double)].collect()
    assert(got.length == limit)
    // recompute ctf ranking from the public per-doc TF surface
    val tf = DocQueries.docTf(spark, sf).as[(Long, String, Long)].collect()
    val ctf = tf.groupBy(_._2).map { case (t, rs) => (t, rs.map(_._3).sum) }
    val total = ctf.values.sum
    val wantHead = ctf.toSeq.sortBy { case (t, c) => (-c, t) }.take(limit)
    assert(got.map(r => (r._1, r._2)).toSeq == wantHead)
    var cum = 0L
    got.foreach { case (_, c, share) =>
      cum += c
      val want = graft.ops.TextOps.r4(cum, total)
      assert(share == want, s"share $share vs $want")
    }
    assert(got.last._3 <= 1.0 && got.map(_._3).sliding(2)
      .filter(_.length == 2).forall(a => a(0) <= a(1)))
  }

  test("fuzzyTopK('past', 1) ≡ topK over the expanded variants 'fast part'") {
    // the sf0.001 dictionary has exactly {fast, part} within distance 1
    val got = DocQueries.fuzzyTopK(spark, sf, "past", 1, 50, 10)
      .as[(Long, Double)].collect().toSeq
    val want = DocQueries.topK(spark, sf, "fast part", 10, relational = false)
      .as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == want)
    // no dictionary term in range → empty result, not an error
    assert(DocQueries.fuzzyTopK(spark, sf, "zzzzzzzz", 1, 50, 10).count() == 0L)
  }

  test("wildcardTopK('s*a*') ≡ topK over the glob-expanded variants") {
    // the dictionary terms matching s*a* are exactly {scan, small, spark, stream}
    val got = DocQueries.wildcardTopK(spark, sf, "s*a*", 10, 10)
      .as[(Long, Double)].collect().toSeq
    val want = DocQueries.topK(spark, sf, "scan small spark stream", 10,
      relational = false).as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == want)
    // '?' matches exactly one char
    val one = DocQueries.wildcardTopK(spark, sf, "sc?n", 10, 10)
      .as[(Long, Double)].collect().toSeq
    val scan = DocQueries.topK(spark, sf, "scan", 10, relational = false)
      .as[(Long, Double)].collect().toSeq
    assert(one == scan)
    // no matching dictionary term → empty result, not an error
    assert(DocQueries.wildcardTopK(spark, sf, "zz*q", 10, 10).count() == 0L)
  }

  test("convJoinTopK: every winner holds a full A-turn AND a full B-turn") {
    val (a, b) = ("spark stream", "customer order")
    val got = DocQueries.convJoinTopK(spark, sf, a, b, 8)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.nonEmpty)
    // brute conv sets from raw text (independent of the engine's kernels)
    def termSet(s: String) = graft.analysis.Analyzer.termFreqs(
      graft.analysis.Analyzer.tokenizeEn(s)).keySet
    val docTerms = texts.map { case (id, t) => id -> termSet(t) }
    def convsMatching(clause: String): Set[Long] = {
      val must = termSet(clause)
      docTerms.collect { case (id, ts) if must.subsetOf(ts) =>
        id / DocQueries.TurnsPerConv }.toSet
    }
    val eligible = convsMatching(a) intersect convsMatching(b)
    assert(got.map(_._1).forall(eligible.contains),
      "a winner lacks an A-turn or a B-turn")
    // scores descend with conv tiebreak
    assert(got == got.sortBy(r => (-r._2, r._1)))
  }

  test("mmrTopK ≡ independent greedy MMR recompute over the top-m pool") {
    val (query, m, k, lam) = ("fast query join", 20, 10, 0.7)
    val pool = DocQueries.topK(spark, sf, query, m, relational = false)
      .as[(Long, Double)].collect().toSeq
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e.map(_.toDouble)) }.toMap
    def cos(a: Long, b: Long): Double = (embs.get(a), embs.get(b)) match {
      case (Some(x), Some(y)) =>
        val dot = x.zip(y).map { case (p, q) => p * q }.sum
        val nx = math.sqrt(x.map(v => v * v).sum)
        val ny = math.sqrt(y.map(v => v * v).sum)
        if (nx == 0 || ny == 0) 0.0 else dot / (nx * ny)
      case _ => 0.0
    }
    var rem = pool
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    while (want.size < k && rem.nonEmpty) {
      val scoredRem = rem.map { case (id, sc) =>
        val ms = if (want.isEmpty) 0.0 else want.map(s => cos(id, s._1)).max
        (id, sc, lam * sc - (1 - lam) * ms)
      }
      val best = scoredRem.minBy { case (id, _, v) => (-v, id) }
      want += ((best._1, best._2, want.size + 1L))
      rem = rem.filterNot(_._1 == best._1)
    }
    val got = DocQueries.mmrTopK(spark, sf, query, m, k, lam)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == want.toSeq)
    // diversification is real: MMR order differs from pure-score order
    // whenever any pool similarity is positive (fixture embeddings are)
    assert(got.map(_._1) != pool.take(k).map(_._1) ||
      pool.combinations(2).forall(p => cos(p(0)._1, p(1)._1) <= 0.0))
  }

  test("lenHist: buckets partition the corpus and match docLens") {
    val width = 16
    val lens = DocQueries.docLens(spark, sf).as[(Long, Long)].collect()
    val want = lens.groupBy { case (_, l) => (l / width) * width }
      .map { case (b, rs) => (b, rs.length.toLong) }.toSeq.sortBy(_._1)
    val got = DocQueries.lenHist(spark, sf, width).as[(Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._2).sum == lens.length)
  }
}
