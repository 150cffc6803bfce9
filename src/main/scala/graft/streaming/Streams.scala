package graft.streaming

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured-Streaming surface (SURVEY.md §2.9).
  *
  * Each transform is written against a plain `DataFrame`, so the SAME
  * function runs in batch mode (for the DuckDB oracle) and on a
  * `readStream` source (exercised in the streaming specs) — the
  * batch/streaming unification Spark gives for free.
  *
  * The reference has no true streaming (full refresh per run); these
  * give its event-time story: watermarked tumbling/sliding windows,
  * session windows, and `_id`-upsert dedup as
  * `dropDuplicatesWithinWatermark`.
  */
object Streams {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Tumbling 1-hour windowed counts + exact value sums per event type. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  def hourlyTypeCountsBatch(spark: SparkSession, dir: String): DataFrame =
    hourlyTypeCounts(Tables.events(spark, dir))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding windows: 2-hour window every 1 hour, per event type. */
  def slidingTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  def slidingTypeCountsBatch(spark: SparkSession, dir: String): DataFrame =
    slidingTypeCounts(Tables.events(spark, dir))
      .orderBy(col("win_start"), col("event_type"))

  /** Session windows (30-minute inactivity gap) per user: one row per
    * session. Batch-mode `session_window` plans a dedicated
    * SessionWindowing aggregation; in streaming it is state-store backed.
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Per-user session stats: number of sessions + total events. */
  def userSessionStatsOf(events: DataFrame): DataFrame =
    userSessions(events)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))

  def userSessionStats(spark: SparkSession, dir: String): DataFrame =
    userSessionStatsOf(Tables.events(spark, dir))

  /** Streaming variants with watermarks (used by the streaming specs;
    * not oracle-checked — DuckDB has no watermark semantics).
    */
  def hourlyTypeCountsStream(events: DataFrame): DataFrame =
    hourlyTypeCounts(events.withWatermark("ts", "2 hours"))

  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
}
