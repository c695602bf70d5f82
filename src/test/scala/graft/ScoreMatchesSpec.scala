package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-backed match-set scoring (Searcher.scoreMatches): the streaming
  * OR-mode postings kernel must emit exactly scoreAll's positive-score set
  * — same docs, same scores (to cross-plan float slack) — under every
  * lifecycle state the relational twin supports. */
class ScoreMatchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val dir: String = {
    val d = TestSpark.tmpDir("scorematch")
    IndexBuilder.build(spark, Transcripts.synth(spark, 3000, 7).toDF(), d,
      IndexBuilder.Config(shards = 8))
    d
  }

  private def both(s: Searcher, q: String): (Map[Long, Double], Map[Long, Double]) = {
    val kernel = s.scoreMatches(q).as[(Long, Double)].collect().toMap
    val rel = s.scoreAll(q).select($"docId".cast("long"), $"score")
      .as[(Long, Double)].collect().toMap
    (kernel, rel)
  }

  private def assertSame(kernel: Map[Long, Double], rel: Map[Long, Double]): Unit = {
    assert(kernel.keySet == rel.keySet,
      s"match sets differ: kernel-only=${(kernel.keySet -- rel.keySet).take(5)} " +
        s"rel-only=${(rel.keySet -- kernel.keySet).take(5)}")
    val maxD = kernel.map { case (d, sc) => math.abs(sc - rel(d)) }
      .foldLeft(0.0)(math.max)
    assert(maxD <= 1e-9, s"scores diverge by $maxD")
  }

  test("scoreMatches ≡ scoreAll's positive set (multi-term OR query)") {
    val s = new Searcher(spark, dir)
    for (q <- Seq("fast query join", "streaming window", "tok0"))
      { val (k, r) = both(s, q); assert(k.nonEmpty); assertSame(k, r) }
  }

  test("empty analyzed query and corpus-absent terms yield empty") {
    val s = new Searcher(spark, dir)
    assert(s.scoreMatches("").count() == 0)
    assert(s.scoreMatches("zzzznowhere qqqabsent").count() == 0)
  }

  test("a partially-absent query still scores the present terms") {
    val s = new Searcher(spark, dir)
    val (k, r) = both(s, "streaming zzzznowhere")
    assert(k.nonEmpty)
    assertSame(k, r)
  }

  test("tombstoned docs are excluded inside the kernel") {
    val d = TestSpark.tmpDir("scorematchdel")
    IndexBuilder.build(spark, Transcripts.synth(spark, 1500, 11).toDF(), d,
      IndexBuilder.Config(shards = 4))
    assert(IndexBuilder.delete(spark, d, col("turn_idx") % 3 === 1) > 0)
    val s = new Searcher(spark, d)
    val (k, r) = both(s, "fast query join")
    assert(k.nonEmpty)
    assertSame(k, r)
  }
}
