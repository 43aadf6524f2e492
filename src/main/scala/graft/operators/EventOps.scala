package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream operators over the `events` table.
  *
  * The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects; we read it as raw nanos (legacy long) and truncate to
  * microseconds — the exact same truncation the DuckDB oracle applies via
  * `make_timestamp(epoch_ns(ts)//1000)`, so both engines see identical
  * instants.
  *
  * Scale notes: every operator here shuffles at most once, on `user_id`
  * (sessionize, as-of) or on the coarse window key (window agg). The as-of
  * join is the union/last-value pattern — one shuffle, no range cross-join,
  * which survives arbitrarily large fact tables as long as a single user's
  * history fits a partition (salt by time-bucket if it ever doesn't).
  */
object EventOps {

  /** events with `ts` as a proper microsecond timestamp.
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` in the session
    * (set once at session build — Verify/Bench/test base all do), NOT
    * mutated here: operators must not side-effect session config.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 1-hour window aggregation — batch/stream parity: this IS
    * [[graft.streaming.StreamOps.windowCounts]] applied to the static
    * table (withWatermark is a no-op on batch). `hour_start` is emitted
    * as TIMESTAMP_NTZ: the oracle's `make_timestamp` is tz-naive, and the
    * session runs UTC, so the NTZ wall-clock equals the oracle instant.
    */
  def qEventsWindowAgg(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.windowCounts(events(s, dir))
      .orderBy("hour_start", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap) per user.
    * lag → new-session flag → running sum = session id → per-session agg.
    */
  def qEventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tsSec  = col("ts").cast("double")
    val newSess = when(
      lag(tsSec, 1).over(byUser).isNull ||
        tsSec - lag(tsSec, 1).over(byUser) > 1800d, 1).otherwise(0)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        newSess.as("new_sess"))
      .withColumn("sess_id",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(max(col("ts").cast("double")) - min(col("ts").cast("double")), 6).as("duration_sec"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "sess_id")
  }

  /** As-of join: for every purchase, the most recent prior-or-equal view by
    * the same user. Spark-first: tag + union + last_value(ignoreNulls) over
    * an event-time window — one shuffle on user_id, no range cross join.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
        lit(null).cast("long").as("purchase_id"), lit(0).as("is_purchase"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("view_id"),
        col("event_id").as("purchase_id"), lit(1).as("is_purchase"))
    // At equal ts a view sorts before the purchase (inclusive as-of).
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_purchase"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("last_view_id", last("view_id", ignoreNulls = true).over(w))
      .withColumn("last_view_ts",
        last(when(col("view_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(
        col("purchase_id"),
        col("user_id"),
        col("last_view_id").as("view_id"),
        round(col("ts").cast("double") - col("last_view_ts").cast("double"), 6).as("lag_sec"))
      .orderBy("purchase_id")
  }
}
