package graft

import graft.build.IndexBuilder
import graft.ops.DocQueries
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** minimum_should_match (Searcher.topKMsm) and search_after deep
  * pagination (Searcher.topKAfter / DocQueries.searchAfter): msm
  * interpolates between OR and AND without changing any qualifying doc's
  * score; pagination partitions the ranking into disjoint, order-preserving
  * pages with the page gate applied inside the kernel heap. */
class PagingMsmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("pagemsmidx")
    IndexBuilder.build(spark, Transcripts.synth(spark, 3000, 7).toDF(), d,
      IndexBuilder.Config(shards = 8))
    d
  }
  private lazy val s = new Searcher(spark, dir)

  // terms from different synth sentences so match counts genuinely vary
  private val Q = "learning retrieval streaming"

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The engine's pinned comparison contract (same as the DuckDB oracle):
    * round-4 scores, ties broken by docId — raw-double association order
    * legitimately differs across plan shapes by a few ulps. */
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select($"docId".cast("long"), $"score").as[(Long, Double)].collect()
      .map { case (id, sc) => (id, r4(sc)) }
      .sortBy { case (id, sc) => (-sc, id) }.toSeq

  test("msm = 1 is plain OR top-k, msm = |terms| is AND top-k, scores intact") {
    // +30 slack absorbs raw-score boundary ties before the round-4 cut
    assert(rows(s.topKMsm(Q, 1, 50)).take(20) == rows(s.topK(Q, 50)).take(20))
    assert(rows(s.topKMsm(Q, 3, 50)).take(20) == rows(s.topKAnd(Q, 50)).take(20))
  }

  test("msm = 2 ≡ brute count-filtered ranking") {
    val termDocs = Q.split(" ").map(t =>
      s.scoreAll(t).select($"docId").as[Long].collect().toSet)
    val expect = s.scoreAll(Q)
      .collect().map(r => (r.getAs[Long]("docId"), r4(r.getAs[Double]("score"))))
      .filter { case (id, _) => termDocs.count(_.contains(id)) >= 2 }
      .sortBy { case (id, sc) => (-sc, id) }.take(20).toSeq
    assert(expect.nonEmpty && expect.size == 20)
    assert(rows(s.topKMsm(Q, 2, 50)).take(20) == expect)
  }

  test("msm above the live term count is unsatisfiable") {
    assert(s.topKMsm(Q, 4, 10).count() == 0)
  }

  test("msm rides the tombstone (NOT-mode) kernel path identically") {
    val d2 = TestSpark.tmpDir("pagemsmdel")
    IndexBuilder.build(spark, Transcripts.synth(spark, 2000, 11).toDF(), d2,
      IndexBuilder.Config(shards = 4))
    assert(IndexBuilder.delete(spark, d2, col("turn_idx") % 7 === 3) > 0)
    val sd = new Searcher(spark, d2)
    assert(rows(sd.topKMsm(Q, 1, 45)).take(15) == rows(sd.topK(Q, 45)).take(15))
    // every msm=2 hit of the deleted index matches ≥2 terms and survives
    val termDocs = Q.split(" ").map(t =>
      sd.scoreAll(t).select($"docId").as[Long].collect().toSet)
    rows(sd.topKMsm(Q, 2, 15)).foreach { case (id, _) =>
      assert(termDocs.count(_.contains(id)) >= 2) }
  }

  test("search_after pages partition the ranking (driver surface, sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val q = "spark stream window"
    val full = DocQueries.topK(spark, sf, q, 20, relational = false)
      .as[(Long, Double)].collect().toSeq
    assert(full.size == 20)
    val page2 = DocQueries.searchAfter(spark, sf, q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(page2 == full.drop(10), "page 2 must be ranks 11..20 exactly")
  }

  test("kernel page gate: nothing above the cursor's round-4 score returns") {
    val top = rows(s.topK(Q, 5))
    val cursor = BigDecimal(top.last._2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val after = rows(s.topKAfter(Q, 50, cursor))
    assert(after.nonEmpty)
    after.foreach { case (_, sc) =>
      val r4 = BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r4 <= cursor, s"hit rounding to $r4 is above the $cursor cursor")
    }
  }

  test("did-you-mean suggestion: df-ranked edit-distance neighborhood") {
    val sf = "/root/testdata/sf0.001"
    val got = DocQueries.suggest(spark, sf, "spak", 2, 10)
      .as[(String, Long)].collect().toSeq
    assert(got.map(_._1).toSet == Set("spark", "scan"))
    assert(got == got.sortBy(t => (-t._2, t._1)), "must be (df desc, term) ordered")
    // exact dictionary term suggests itself at distance 0
    assert(DocQueries.suggest(spark, sf, "spark", 1, 10)
      .as[(String, Long)].collect().map(_._1).contains("spark"))
  }
}
