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
