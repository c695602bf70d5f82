package graft

import graft.streaming.SessionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization ≡ batch gap-split, across micro-batch
  * boundaries, with both close paths (newer-event gap and event-time
  * timeout) exercised. */
class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val GapMin = 10
  private val GapUs = GapMin * 60000000L

  /** Driver-side gap split of (user, us) events → closed sessions. */
  private def batchSessions(evs: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    evs.groupBy(_._1).flatMap { case (u, xs) =>
      val ts = xs.map(_._2).sorted.toList
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head > GapUs) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      sessions.map(s => (u, s.min, s.max, s.size.toLong))
    }.toSet

  test("closed sessions across micro-batches ≡ batch gap-split; state drains on timeout") {
    val base = 1700000000000000L // µs, ≈ 2023-11 — any fixed epoch works
    // user 1: two sessions split by a 3-gap; user 2: one session whose
    // second event arrives in a LATER micro-batch (state must carry over)
    val b1 = Seq((1L, base), (1L, base + GapUs),            // session A (gap == limit merges)
                 (2L, base + GapUs / 2))
    val b2 = Seq((1L, base + GapUs + 3 * GapUs + 1),        // > gap after A → closes A
                 (2L, base + GapUs / 2 + GapUs))            // extends user 2's session
    // sentinel far past everything: advances the watermark so the open
    // tails of users 1 and 2 close by EVENT-TIME TIMEOUT, not by a gap
    val flush = Seq((99L, base + 100 * GapUs))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("user_id", "us")
      .selectExpr("user_id", "timestamp_micros(us) AS ts")
    val out = SessionStream.closedSessions(spark, events, GapMin)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(flush: _*); q.processAllAvailable()
      // one more micro-batch so timeouts armed after the watermark advance fire
      mem.addData((99L, base + 101 * GapUs)); q.processAllAvailable()

      val got = spark.table("sess_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = batchSessions(b1 ++ b2) // users 1 and 2 fully closed by flush
      assert(got == want, s"got $got\nwant $want")
      // both close paths ran: user 1's first session closed by a gap
      // event, everything else by timeout — and nothing was emitted twice
      assert(got.size == 3)
    } finally q.stop()
  }

  test("streaming windowed counts: closed windows ≡ batch tumbling rollup") {
    val base = 1700000000000000L
    val WinMin = 5
    val WinUs = WinMin * 60000000L
    val evs = Seq( // (us offset, type, value): spans three 5-min windows
      (0L, "a", 1.00011), (30000000L, "b", 2.5), (WinUs, "a", 0.77777),
      (WinUs + 1, "a", 3.0), (2 * WinUs, "b", 1.25))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val events = mem.toDF().toDF("us", "event_type", "value")
      .selectExpr("timestamp_micros(us) AS ts", "event_type", "value")
    val out = SessionStream.windowedCounts(spark, events, WinMin, lateMinutes = WinMin)
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData(evs.map { case (o, t, v) => (base + o, t, v) }: _*)
      q.processAllAvailable()
      // watermark flush: every real window closes
      mem.addData((base + 10 * WinUs, "zz", 0.0)); q.processAllAvailable()
      mem.addData((base + 11 * WinUs, "zz", 0.0)); q.processAllAvailable()

      val got = spark.table("win_out")
        .as[(Long, String, Long, Double)].collect().toSet
      // driver recompute with the batch rule: w_start = us − us mod width,
      // values as floor(v·1e4) units
      val want = evs.map { case (o, t, v) =>
        ((base + o) - (base + o) % WinUs, t, math.floor(v * 10000).toLong) }
        .groupBy(e => (e._1, e._2)).map { case ((w, t), xs) =>
          (w, t, xs.size.toLong, xs.map(_._3).sum.toDouble / 10000) }.toSet
      assert(got == want, s"got $got\nwant $want")
    } finally q.stop()
  }
}
