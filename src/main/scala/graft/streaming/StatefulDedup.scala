package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming deduplication via `flatMapGroupsWithState` —
  * the custom-state streaming surface (SURVEY.md §2.9 superset; the
  * reference's consumer is stateless at-least-once, so replayed Kafka
  * messages produce duplicate eligibility rows — this closes that gap
  * exactly-once-per-key).
  *
  * State per key is a single boolean ("seen"), so state size is
  * O(distinct keys); with a processing-time timeout keys expire after
  * `stateTtl`, bounding state for unbounded key domains (the trade:
  * a key re-arriving after the TTL is emitted again — the standard
  * watermark-style contract).
  *
  * Scale: Spark partitions state by key across executors; each
  * micro-batch touches only the keys it carries.
  */
object StatefulDedup {

  /** Event-time-bounded streaming dedup on Spark's built-in state store:
    * rows sharing `keyCols` within `delay` of each other collapse to the
    * first arrival, and state is evicted by the WATERMARK rather than a
    * processing-time TTL — the deterministic replay-safe contract
    * (re-running the same input produces the same survivors, which a
    * wall-clock TTL cannot promise). Prefer this when the dedup horizon
    * is an event-time window; use [[firstOccurrence]] when dedup must
    * span the whole stream or carry custom per-key logic. */
  def withinWatermark(df: DataFrame, keyCols: Seq[String], tsCol: String,
                      delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** The per-group state transition behind [[firstOccurrence]], exposed
    * so the TTL-eviction contract is unit-testable with Spark's
    * `TestGroupState` (a live ProcessingTimeTimeout query never goes
    * quiescent — `shouldRunAnotherBatch` is unconditionally true for
    * that timeout mode, so `processAllAvailable` cannot be used to
    * drive it deterministically in a test). */
  private[graft] def firstOccurrenceUpdate(stateTtl: Option[String])(
      key: String, rows: Iterator[(String, String)],
      state: GroupState[Boolean]): Iterator[(String, String)] =
    if (state.hasTimedOut) {
      state.remove() // TTL eviction: state stays O(keys-live-in-window)
      Iterator.empty
    } else if (state.exists) {
      Iterator.empty // key already emitted in an earlier batch
    } else {
      state.update(true)
      stateTtl.foreach(state.setTimeoutDuration)
      rows.take(1) // first occurrence within this batch, drop the rest
    }

  /** Keep only the FIRST row per key across the whole stream. Input rows
    * are carried as (key, payload-json); emitted rows keep that shape —
    * join back or `from_json` downstream as needed.
    *
    * OPERATIONAL NOTE on `stateTtl`: processing-time timeouts make the
    * query schedule timeout-sweep batches forever (even with
    * Trigger.AvailableNow), so `StreamingQuery.processAllAvailable`
    * never returns on such a query — drive it with its sink output (or
    * awaitTermination + stop), the periodic-restart deployment shape. */
  def firstOccurrence(df: DataFrame, keyCol: String,
                      stateTtl: Option[String] = None): Dataset[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(keyCol).cast("string").as("k"),
        to_json(struct(df.columns.map(col): _*)).as("payload"))
      .as[(String, String)]

    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, String)](
        OutputMode.Append, timeoutConf)(firstOccurrenceUpdate(stateTtl))
  }
}
