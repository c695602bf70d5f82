package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ops over the `events` stream table — the behavioral side of a
  * transcript corpus (what the reference's async streams would look like
  * landed in a table). The first op is classic sessionization, the
  * canonical stateful-window job of a large-scale log pipeline.
  *
  * Parity rules match OracleSql: all outputs integer-typed or rounded
  * via tie-free integer arithmetic; ordering keys are unique.
  */
object EventOps {

  /** Gap-based sessionization + per-user rollup: events of one user,
    * ordered by (ts, event_id), split into sessions wherever the gap to
    * the previous event exceeds `gapMinutes`; output one row per user —
    * (user_id, n_events, n_sessions, max_session_events).
    *
    * Timestamps are compared as unix MICROSECONDS (both Spark and DuckDB
    * store TIMESTAMP at µs precision, so the gap test is exact integer
    * arithmetic — no calendar math, no timezone sensitivity); the window
    * order key (us, event_id) is unique, making the lag/running-sum
    * deterministic in both engines.
    *
    * Scale shape: ONE hash shuffle keyed by user_id; the lag window, the
    * session-id running sum, the per-session count and the per-user
    * rollup all evaluate inside that partitioning (Catalyst plans the
    * two windows + two aggregates over a single Exchange — pinned by
    * PlanSpec). Skewed users are bounded by their own event counts, and
    * the output is one row per user regardless of event volume. */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame =
    sessionizeOver(
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("user_id"),
          // the parquet column is TIMESTAMP_NTZ; the cast reinterprets it in
          // the session zone (Verify/Bench pin UTC), shifting all values by
          // one constant — the gap test below only sees differences, so the
          // session split is zone-independent within a fixed-offset window
          unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id")),
      gapMinutes)

  /** [[sessionize]] over any (user_id, us, event_id) frame — the test seam. */
  private[graft] def sessionizeOver(ev: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60000000L
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val sessions = ev
      .withColumn("new_s",
        when(lag("us", 1).over(w).isNull ||
          col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(w))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("se"))
    sessions.groupBy("user_id")
      .agg(sum("se").as("n_events"), count(lit(1)).as("n_sessions"),
        max("se").as("max_session_events"))
      .orderBy("user_id")
  }

  /** Tumbling event-time windows: per (window, event_type) event count and
    * value sum over `windowMinutes`-wide buckets — the standing rollup
    * behind every event-volume dashboard. Window identity is integer
    * arithmetic on unix µs (`us − us mod width`), which is exactly what
    * Spark's `window($"ts", ...)` assigns for tumbling windows, but stays
    * engine-portable for the DuckDB mirror; values are summed as integer
    * 1e-4 units so the aggregate is exact and order-independent. The unit
    * cut uses floor(value·10⁴), not round: both engines run the same IEEE
    * multiply, and floor of an identical double is identical — no
    * half-way-tie semantics to disagree on (the round(x,4) trap of
    * VERDICT r2).
    *
    * Scale shape: ONE partial-agg hash aggregate — map-side combine
    * shrinks each task to (#windows × #types) rows before the only
    * shuffle; output is bounded by time range, not event volume. */
  def eventWindows(spark: SparkSession, sfDir: String,
                   windowMinutes: Int): DataFrame = {
    val wUs = windowMinutes * 60000000L
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"),
        floor(col("value") * 10000).cast("long").as("mv"))
      .withColumn("w_start", col("us") - col("us") % wUs)
      .groupBy("w_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum("mv").cast("double") / 10000).as("sum_value"))
      .orderBy("w_start", "event_type")
  }
}
