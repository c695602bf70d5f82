package graft

import graft.build.IndexBuilder
import graft.query.{Federated, Searcher}
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Federated (MultiReader) search: members score against the COMBINED
  * collection statistics, so the merged top-k is score-identical to a
  * query over one physically-merged/full index — federation as the
  * zero-copy alternative to IndexBuilder.merge. */
class FederatedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Transcripts.synth(spark, 3000, 7).toDF().cache()
  private def build(df: org.apache.spark.sql.DataFrame): String = {
    val d = TestSpark.tmpDir("fed")
    IndexBuilder.build(spark, df, d, IndexBuilder.Config(shards = 8))
    d
  }
  private lazy val dirA = build(corpus.filter(pmod(hash(col("conv_id")), lit(2)) === 0))
  private lazy val dirB = build(corpus.filter(pmod(hash(col("conv_id")), lit(2)) === 1))
  private lazy val dirF = build(corpus)
  private lazy val fed = new Federated(spark, Seq(dirA, dirB))
  private lazy val full = new Searcher(spark, dirF)

  private val Q = "learning retrieval streaming"

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (conv_id, turn_idx, round4) under the deterministic cut order. */
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, Double)] =
    df.select($"conv_id", $"turn_idx", $"score").as[(String, Int, Double)]
      .collect().map { case (c, t, s) => (c, t, r4(s)) }
      .sortBy { case (c, t, s) => (-s, c, t) }.toSeq

  test("combined stats equal the full build's exactly") {
    assert(fed.n == full.n)
    assert(fed.avgdl == full.avgdl) // integer sums + one division: bit-equal
    // and the override genuinely bites: a member alone has different stats
    assert(new Searcher(spark, dirA).n != fed.n)
  }

  test("federated top-k ≡ full-index top-k, scores comparable across members") {
    val gotAll = rows(fed.topK(Q, 50))
    val wantAll = rows(full.topK(Q, 50))
    val (got, want) = (gotAll.take(20), wantAll.take(20))
    assert(got.nonEmpty)
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)))
    got.zip(want).foreach { case (g, w) => assert(g._3 == w._3) }
    // both halves actually contribute to the winners
    val aDocs = new Searcher(spark, dirA).scoreAll(Q)
      .select($"conv_id").as[String].collect().toSet
    assert(got.exists(r => aDocs.contains(r._1)) &&
      got.exists(r => !aDocs.contains(r._1)))
  }

  test("a query term living in only one member still scores globally") {
    // every hit's score must equal the full index's for the same doc
    val fedHits = fed.topK(Q, 10)
      .select($"conv_id", $"turn_idx", $"score").as[(String, Int, Double)].collect()
    val fullScores = full.scoreAll(Q)
      .select($"conv_id", $"turn_idx", $"score").as[(String, Int, Double)]
      .collect().map { case (c, t, s) => (c, t) -> s }.toMap
    fedHits.foreach { case (c, t, s) =>
      assert(math.abs(s - fullScores((c, t))) < 1e-9) }
  }
}
