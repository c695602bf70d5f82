package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the continuous twin of
  * [[graft.ops.EventOps.sessionize]]. Events arrive on a stream; a
  * per-user open session lives in `GroupState`; a session CLOSES — and is
  * emitted exactly once, in append mode — when either a later event of the
  * same user arrives more than `gapMinutes` after its end, or the event-time
  * watermark passes end + gap (event-time timeout), whichever the stream
  * sees first. Late events beyond the watermark are dropped by the
  * watermark operator itself, so state is bounded: ONE open session per
  * user whose last event is within the watermark horizon.
  *
  * Scale shape: the stream shuffles once on user_id (the same key as the
  * batch op's only Exchange); state is O(active users), not O(events) —
  * each user's state is three longs regardless of event volume. At
  * 10^12-turn scale the same job runs unchanged with a durable checkpoint
  * dir; throughput is bounded by the state store, which partitions with
  * the shuffle.
  *
  * Batch parity: for any prefix of the stream whose sessions are closed
  * (watermark has passed end + gap), the emitted (user, start, end, n)
  * rows equal the batch gap-split of the same events — pinned by
  * SessionStreamSpec against [[graft.ops.EventOps.sessionizeOver]]'s
  * session boundaries.
  */
object SessionStream {

  /** One closed session. `*_us` are unix microseconds of the first/last
    * event in the session. */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  /** `ts` rides along only because the analyzer requires the
    * watermark-tagged event-time column to be present in the stateful
    * operator's input; the logic reads `us`. */
  private[streaming] case class Ev(user_id: Long, us: Long,
                                   ts: java.sql.Timestamp)
  private[streaming] case class Open(startUs: Long, endUs: Long, n: Long)

  /** Wire the sessionizer onto a streaming frame with columns
    * (user_id: long, ts: timestamp). Returns the append-mode stream of
    * closed sessions; the caller starts the sink. */
  def closedSessions(spark: SparkSession, events: DataFrame,
                     gapMinutes: Int): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      // the watermark delay IS the session gap: once the watermark passes
      // an open session's end + gap, no on-time event can extend it
      .withWatermark("ts", s"$gapMinutes minutes")
      .select($"user_id".cast("long").as("user_id"),
        unix_micros($"ts".cast("timestamp")).as("us"), $"ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          step(user, evs, state, gapUs))
  }

  /** Watermarked streaming twin of [[graft.ops.EventOps.eventWindows]]:
    * tumbling event-time windows per (window, event_type), emitted in
    * append mode once the watermark passes window end (each window row is
    * final — exactly-once per window, late data beyond `lateMinutes`
    * dropped by the watermark operator). Uses Spark's native streaming
    * window aggregation — state is one row per open (window, type), and
    * the plan is the same partial-agg hash aggregate as the batch op with
    * a state store behind it. Values are summed as floor(value·10⁴)
    * integer units exactly like the batch twin, so a closed streaming
    * window row equals the batch row for the same events — pinned by
    * SessionStreamSpec. */
  def windowedCounts(spark: SparkSession, events: DataFrame,
                     windowMinutes: Int, lateMinutes: Int): DataFrame = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$lateMinutes minutes")
      .groupBy(window($"ts", s"$windowMinutes minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(floor($"value" * 10000).cast("long")).cast("double") / 10000)
          .as("sum_value"))
      .select(unix_micros($"window.start").as("w_start"), $"event_type",
        $"n_events", $"sum_value")
  }

  /** Per-trigger transition: fold this batch's events (sorted — a
    * micro-batch has no intra-batch order guarantee) into the open
    * session, emitting every session that closes; arm the event-time
    * timeout for the still-open tail. Pure function of (events, state) —
    * unit-testable without a stream. */
  private[streaming] def step(user: Long, evs: Iterator[Ev],
                              state: GroupState[Open],
                              gapUs: Long): Iterator[ClosedSession] = {
    if (!evs.hasNext) {
      // timeout path: the watermark passed end + gap — the session is final
      val out = state.getOption.map(o =>
        ClosedSession(user, o.startUs, o.endUs, o.n)).iterator.toList
      state.remove()
      return out.iterator
    }
    val sorted = evs.map(_.us).toArray.sorted
    val closed = List.newBuilder[ClosedSession]
    var open = state.getOption.getOrElse(Open(sorted(0), sorted(0) - 1, 0))
    for (us <- sorted) {
      if (us - open.endUs > gapUs && open.n > 0) {
        closed += ClosedSession(user, open.startUs, open.endUs, open.n)
        open = Open(us, us, 1)
      } else {
        // min() guards the cross-batch out-of-order case: an event older
        // than the open session's end (but inside the watermark) must not
        // leave start_us > its own timestamp
        open = Open(math.min(open.startUs, us), math.max(open.endUs, us), open.n + 1)
      }
    }
    state.update(open)
    // fires once the event-time watermark passes this instant
    state.setTimeoutTimestamp((open.endUs + gapUs) / 1000 + 1)
    closed.result().iterator
  }
}
