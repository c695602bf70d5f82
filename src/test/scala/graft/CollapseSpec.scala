package graft

import graft.ops.DocQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Field-collapsed top-k (DocQueries.collapseTopK — ES's collapse): one
  * best doc per group value, groups ranked by their representative; the
  * collapse is a single group-keyed partial aggregate over the hit table,
  * never a corpus sort. */
class CollapseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Q = "fast query join"

  test("collapse ≡ brute per-group argmax then group ranking") {
    val hits = DocQueries.searcher(spark, sf).scoreAll(Q)
      .select($"conv_id".cast("long"), round($"score", 4))
      .as[(Long, Double)].collect().toMap
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val expect = hits.toSeq.map { case (id, s) => (meta(id), id, s) }
      .groupBy(_._1).map { case (_, xs) => xs.minBy(x => (-x._3, x._2)) }
      .toSeq.sortBy(x => (-x._3, x._2)).take(5)
    assert(expect.size == 5, "query must match docs in ≥5 source groups")
    val got = DocQueries.collapseTopK(spark, sf, Q, "source", 5)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == expect)
  }

  test("winners are distinct groups and each is its group's best hit") {
    val got = DocQueries.collapseTopK(spark, sf, Q, "source", 8)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1).distinct.size == got.size, "one row per group")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "score-descending")
  }

  test("plan: collapse aggregates map-side (partial) before the shuffle") {
    val plan = DocQueries.collapseTopK(spark, sf, Q, "source", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      s"expected a partial max aggregate in:\n$plan")
  }
}
