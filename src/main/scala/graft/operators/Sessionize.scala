package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based sessionization of an event log in batch: consecutive events
  * of one user belong to the same session while the time gap between them
  * stays <= `gapMicros`; a strictly larger gap starts a new session.
  * Session ids are 0-based per user in event order.
  *
  * Generalizes the reference's per-user recent-activity feed
  * (frontend/src/App.jsx realtime event polling) to the standard
  * sessionization operator of analytics warehouses; the streaming
  * equivalent is EventWindows.sessionWindows (session_window + watermark).
  *
  * Scale: ONE hash shuffle on the user key; both window passes (lag flag,
  * running-sum session id) and the final (user, session) aggregation all
  * run inside that partitioning, and the aggregation keeps map-side
  * partial combine. Per-user data is bounded by that user's event count —
  * a power-user key skews a task but never the driver; AQE skew handling
  * splits it. The tie-break column makes the ordering total so session
  * assignment is deterministic under equal timestamps.
  */
object Sessionize {

  /** Events + `_ts_us` (the resolved event time) + `session_id`. */
  def sessions(events: DataFrame, userCol: String, tsMicros: Column,
               tieBreak: Column, gapMicros: Long): DataFrame = {
    val ordered = Window.partitionBy(col(userCol)).orderBy(col("_ts_us"), tieBreak)
    val prev = lag(col("_ts_us"), 1).over(ordered)
    // first event of a user: prev is NULL, comparison is false -> flag 0
    val newSession = when(col("_ts_us") - prev > gapMicros, 1L).otherwise(0L)
    events.withColumn("_ts_us", tsMicros)
      .withColumn("_new_session", newSession)
      .withColumn("session_id",
        sum(col("_new_session")).over(
          ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Per-session rollup: bounds, event count, value sum (decimal-summed
    * for a deterministic double, same trick as the oracle queries). */
  def sessionStats(events: DataFrame, userCol: String, tsMicros: Column,
                   tieBreak: Column, gapMicros: Long, valueCol: String): DataFrame =
    sessions(events, userCol, tsMicros, tieBreak, gapMicros)
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col("_ts_us")).as("session_start"),
        max(col("_ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
}
