package graft

import graft.ops.{DocQueries, EventOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-recompute contracts for the conversation/transcript ops:
  * conversation rollup, RAG context stitch, recency rerank, and event
  * sessionization. */
class TranscriptOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Tpc = DocQueries.TurnsPerConv

  test("sessionizeOver: exact-gap boundary stays in-session; ties order by event_id") {
    val gapM = 10
    val gapUs = gapM * 60000000L
    val rows = Seq(
      (1L, 0L, 1L), (1L, gapUs, 2L),  // gap == limit → SAME session (test is strict >)
      (1L, 2 * gapUs + 1, 3L),        // gap == limit+1 → new session
      (2L, 5L, 4L), (2L, 5L, 5L),     // us tie broken by event_id
      (3L, 7L, 6L))
    val got = EventOps.sessionizeOver(rows.toDF("user_id", "us", "event_id"), gapM)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 3L, 2L, 2L), (2L, 2L, 1L, 2L), (3L, 1L, 1L, 1L)))
  }

  test("sessionize on testdata ≡ driver-side gap split") {
    val gapM = 360
    val gapUs = gapM * 60000000L
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("us"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).toSeq.map { case (u, xs) =>
      val sorted = xs.sortBy(e => (e._2, e._3)).toList
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._2 - acc.head.head._2 > gapUs) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }
      (u, xs.size.toLong, sessions.size.toLong, sessions.map(_.size).max.toLong)
    }.sortBy(_._1)
    val got = EventOps.sessionize(spark, sf, gapM)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("convTopK ≡ driver rollup of scoreAll (sum of top-t turn micros)") {
    val (q, t, k) = ("fast query join", 3, 5)
    val scored = DocQueries.scoreAll(spark, sf, q).as[(Long, Double)].collect()
    val want = scored.map { case (d, s) => (d, math.round(s * 10000)) }
      .groupBy(_._1 / Tpc).toSeq.map { case (c, xs) =>
        val top = xs.sortBy { case (d, m) => (-m, d) }.take(t)
        (c, top.map(_._2).sum, top.size.toLong)
      }.sortBy { case (c, m, _) => (-m, c) }.take(k)
      .map { case (c, m, n) => (c, m.toDouble / 10000, n) }
    val got = DocQueries.convTopK(spark, sf, q, t, k)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == want)
  }

  test("timeTopK ≡ driver recompute of the integer-rational recency boost") {
    val (q, k) = ("fast query join", 10)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val scored = DocQueries.scoreAll(spark, sf, q).as[(Long, Double)].collect()
    val want = scored.map { case (d, s) =>
      (d, math.round(s * 10000) * (n + d) / (2 * n))
    }.sortBy { case (d, b) => (-b, d) }.take(k)
      .map { case (d, b) => (d, b.toDouble / 10000) }.toSeq
    val got = DocQueries.timeTopK(spark, sf, q, k)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    // the boost is a genuine rerank at fixture scale, not a no-op
    val plain = DocQueries.topK(spark, sf, q, k, relational = true)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(got.map(_._1) != plain, "recency boost should reorder the top-k")
  }

  test("asOfOver ≡ driver scan: last prior right-type event, ties by event_id, -1/0 when none") {
    // user 1: interleaved trades/quotes incl. a same-us tie; user 2: no quotes at all
    val rows = Seq(
      (1L, 1L, 100L, "q", 11L), (2L, 1L, 100L, "t", 0L), // same us: event 1 orders first
      (3L, 1L, 200L, "q", 22L), (4L, 1L, 200L, "q", 33L), // same-us quote tie → max event_id wins later
      (5L, 1L, 300L, "t", 0L),
      (6L, 2L, 100L, "t", 0L))
    val df = rows.toDF("event_id", "user_id", "us", "event_type", "mv")
    val got = EventOps.asOfOver(df, "q")
      .as[(Long, Long, Long, Double, Long)].collect().toList
    val want = List(
      (1L, 1L, -1L, 0.0, -1L),          // first event: nothing prior
      (2L, 1L, 1L, 0.0011, 0L),         // same-us quote IS prior (arrival order)
      (3L, 1L, 1L, 0.0011, 100L),
      (4L, 1L, 3L, 0.0022, 0L),         // the earlier same-us quote
      (5L, 1L, 4L, 0.0033, 100L),       // tie resolved to the larger event_id
      (6L, 2L, -1L, 0.0, -1L))          // user without right-side events
    assert(got == want)
  }

  test("funnel ≡ driver recompute: strictly-after step ordering, monotone counts") {
    val steps = Seq("signup", "click", "purchase")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("us"),
        $"event_type").as[(Long, Long, String)].collect()
    val byUser = ev.groupBy(_._1)
    // frontier recompute: earliest time of step k strictly after frontier(k-1)
    var want = List.empty[(Int, String, Long)]
    var frontier: Map[Long, Long] =
      byUser.flatMap { case (u, xs) =>
        val ts = xs.collect { case (_, t, ty) if ty == steps.head => t }
        if (ts.isEmpty) None else Some(u -> ts.min)
      }.toMap
    want ::= (1, steps.head, frontier.size.toLong)
    for ((s, i) <- steps.zipWithIndex.drop(1)) {
      frontier = frontier.flatMap { case (u, prev) =>
        val ts = byUser(u).collect { case (_, t, ty) if ty == s && t > prev => t }
        if (ts.isEmpty) None else Some(u -> ts.min)
      }
      want ::= (i + 1, s, frontier.size.toLong)
    }
    val got = EventOps.funnel(spark, sf, steps)
      .as[(Int, String, Long)].collect().toList
    assert(got == want.reverse)
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "counts must be monotone")
  }

  test("empty inputs: sessionize/asOf on zero events, conv ops on a no-hit query") {
    val emptyEv = Seq.empty[(Long, Long, Long)].toDF("user_id", "us", "event_id")
    assert(EventOps.sessionizeOver(emptyEv, 10).count() == 0)
    val emptyAsOf = Seq.empty[(Long, Long, Long, String, Long)]
      .toDF("event_id", "user_id", "us", "event_type", "mv")
    assert(EventOps.asOfOver(emptyAsOf, "q").count() == 0)
    // a query of only out-of-vocabulary terms scores nothing anywhere
    val noHit = "zzzzunseen qqqqabsent"
    assert(DocQueries.convTopK(spark, sf, noHit, 3, 5).count() == 0)
    assert(DocQueries.timeTopK(spark, sf, noHit, 10).count() == 0)
    assert(DocQueries.turnContext(spark, sf, noHit, 10).count() == 0)
  }

  test("turnContext: arithmetic neighbor ids, boundary -1/0, true char sizes") {
    val (q, k) = ("spark stream window", 10)
    val got = DocQueries.turnContext(spark, sf, q, k)
      .as[(Long, Double, Long, Long, Long, Long)].collect()
    val hits = DocQueries.topK(spark, sf, q, k, relational = true)
      .as[(Long, Double)].collect().toMap
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"n_chars".cast("long")).as[(Long, Long)].collect().toMap
    val maxId = chars.keys.max
    assert(got.map(_._1).toSet == hits.keys.toSet)
    got.foreach { case (d, s, p, pc, nx, nc) =>
      assert(s == hits(d), s"doc $d score $s vs exhaustive ${hits(d)}")
      if (d % Tpc == 0) assert(p == -1L && pc == 0L)
      else assert(p == d - 1 && pc == chars(d - 1))
      if (d % Tpc == Tpc - 1 || d == maxId) assert(nx == -1L && nc == 0L)
      else assert(nx == d + 1 && nc == chars(d + 1))
    }
  }
}
