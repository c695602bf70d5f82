package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query-time per-term boosts (Searcher.topKBoosted — Lucene's term^w):
  * each term's contribution scales by its boost inside the kernel, the
  * pruning upper bound scales with it, and boost-free calls degenerate to
  * plain OR top-k. */
class BoostSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("boostidx")
    IndexBuilder.build(spark, Transcripts.synth(spark, 3000, 7).toDF(), d,
      IndexBuilder.Config(shards = 8))
    d
  }
  private lazy val s = new Searcher(spark, dir)
  private val Q = "learning retrieval streaming"

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select($"docId".cast("long"), $"score").as[(Long, Double)].collect()
      .map { case (id, sc) => (id, r4(sc)) }
      .sortBy { case (id, sc) => (-sc, id) }.toSeq

  test("no boosts ≡ plain OR top-k") {
    assert(rows(s.topKBoosted(Q, Map.empty, 50)).take(20) ==
      rows(s.topK(Q, 50)).take(20))
    // all-ones boosts too (explicit 1.0 must be a true no-op)
    assert(rows(s.topKBoosted(Q, Q.split(" ").map(_ -> 1.0).toMap, 50)).take(20) ==
      rows(s.topK(Q, 50)).take(20))
  }

  test("boosted score = Σ boost_t · single-term contribution") {
    val boosts = Map("learning" -> 2.5, "retrieval" -> 0.5, "streaming" -> 1.0)
    // per-term contributions from single-term scorings (qtf = 1 each)
    val contribs = Q.split(" ").map(t =>
      t -> s.scoreAll(t).select($"docId", $"score")
        .as[(Long, Double)].collect().toMap).toMap
    val got = s.topKBoosted(Q, boosts, 20)
      .select($"docId".cast("long"), $"score").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, sc) =>
      val expect = contribs.map { case (t, m) => boosts(t) * m.getOrElse(id, 0.0) }.sum
      assert(math.abs(sc - expect) < 1e-9, s"doc $id: $sc vs $expect")
    }
  }

  test("up-boosting a term promotes its documents") {
    val streamingDocs = s.scoreAll("streaming").select($"docId").as[Long].collect().toSet
    val plainTop = rows(s.topK(Q, 10)).map(_._1)
    val boostedTop = rows(s.topKBoosted(Q, Map("streaming" -> 50.0), 10)).map(_._1)
    // under a 50x boost every winner must contain the boosted term
    assert(boostedTop.forall(streamingDocs.contains))
    assert(boostedTop != plainTop, "a 50x boost must reshape the top-10")
  }

  test("boost keys are raw tokens run through the index analyzer") {
    // an uppercase key must hit the same analyzed term as its lowercase form
    assert(rows(s.topKBoosted(Q, Map("STREAMING" -> 3.0), 30)) ==
      rows(s.topKBoosted(Q, Map("streaming" -> 3.0), 30)))
  }

  test("non-positive boosts are rejected (Lucene's BoostQuery contract)") {
    // a zero/negative upper bound would silently break WAND's pivot logic
    intercept[IllegalArgumentException] {
      s.topKBoosted(Q, Map("streaming" -> 0.0), 10)
    }
    intercept[IllegalArgumentException] {
      s.topKBoosted(Q, Map("streaming" -> -1.5), 10)
    }
    intercept[IllegalArgumentException] {
      graft.query.Wand.TermInput(
        graft.model.Posting(0, "t", 0, 0, Array.emptyByteArray,
          Array.emptyByteArray, Array.emptyByteArray, Array.empty[Long],
          Array.empty[Int], Array.empty[Int], Array.empty[Int], Array.empty[Int]),
        1, 1L, boost = -2.0)
    }
  }
}
