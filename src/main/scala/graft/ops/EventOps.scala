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
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60000000L
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"),
        // the parquet column is TIMESTAMP_NTZ; the cast reinterprets it in
        // the session zone (Verify/Bench pin UTC), shifting all values by
        // one constant — the gap test below only sees differences, so the
        // session split is zone-independent within a fixed-offset window
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
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
}
