package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the capability
  * superset SURVEY.md §2.9 calls for (the reference has no event-time
  * windows; Structured Streaming provides them natively, so the engine
  * exposes them over the `events` table).
  *
  * All three helpers work identically on batch and streaming frames;
  * with a streaming input the watermark bounds state and admits late data
  * up to `lateness`.
  */
object EventWindows {

  /** Tumbling window aggregate: count + sum(value) per (window, key). */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
               width: String, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Sliding window aggregate. */
  def sliding(events: DataFrame, tsCol: String, keyCol: String,
              width: String, slide: String,
              lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Session window aggregate (gap-based). */
  def session(events: DataFrame, tsCol: String, keyCol: String,
              gap: String, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Approximate distinct `valueCol` per tumbling window, as a
    * STREAMING-SAFE HyperLogLog register table: one stateful
    * aggregation — `max(rho)` per (window, register) — whose state is
    * bounded by 256 rows per open window and evicted by the watermark.
    *
    * The emitted register table IS the sketch
    * ([[graft.operators.Sketches]]): feed the sink (or any union of
    * sinks/shards/backfills — `max` per register merges them) through
    * `Sketches.hllEstimate(_, Seq("window_start", "window_end"))` for
    * the cardinality estimate, bit-identical to running
    * `Sketches.hllDistinct` over the same events in batch. Splitting
    * sketch-update (streaming) from estimation (read time) keeps the
    * stream to ONE stateful operator — no chained-aggregation support
    * needed — and is exactly how a register table would live in a
    * 100 TB pipeline: appended per micro-batch, re-aggregated on read. */
  def approxDistinctRegisters(events: DataFrame, tsCol: String,
                              valueCol: String, width: String,
                              lateness: String = "10 minutes"): DataFrame = {
    val (reg, rho) = graft.operators.Sketches.regRho(col(valueCol))
    events.withWatermark(tsCol, lateness)
      .filter(col(valueCol).isNotNull)
      .select(col(tsCol), reg.as("_hll_reg"), rho.as("_hll_rho"))
      .groupBy(window(col(tsCol), width), col("_hll_reg"))
      .agg(max(col("_hll_rho")).as("_hll_rho"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("_hll_reg"), col("_hll_rho"))
  }

  /** Per-window Count-Min register table — the frequency twin of
    * [[approxDistinctRegisters]], on the same split: sketch-UPDATE is
    * the stream (ONE stateful aggregation, state bounded by
    * depth x width rows per open window, watermark-evicted), estimation
    * happens at read time by probing the emitted table
    * ([[graft.operators.Sketches.cmsEstimate]]).
    *
    * OUTPUT-MODE CAVEAT, where this differs from the HLL twin: CMS
    * registers merge by ADDITION, which is NOT idempotent — run the
    * sink in APPEND mode so each (window, register) row is emitted
    * exactly once when the watermark closes the window (cross-batch
    * accumulation happens inside the state store). Update-mode
    * re-emissions would double-count under a sum-merge. Addition
    * remains the correct merge across DISJOINT inputs: shards, days,
    * backfills, or separate streams. (The HLL table tolerates update
    * mode because max-merge is idempotent.)
    *
    * Per-window heavy hitters / hot keys / frequency caps over an
    * unbounded stream, with no custom state and no unbounded key
    * domain in the state store. */
  def frequencyRegisters(events: DataFrame, tsCol: String, valueCol: String,
                         width: String, lateness: String = "10 minutes",
                         depth: Int = graft.operators.Sketches.CmsDepth,
                         cmsWidth: Int = graft.operators.Sketches.CmsWidth): DataFrame = {
    val rows = explode(array((0 until depth).map(d =>
      struct(lit(d).as("_cms_d"),
        graft.operators.Sketches.cmsBucket(col(valueCol), d, cmsWidth)
          .as("_cms_b"))): _*))
    events.withWatermark(tsCol, lateness)
      .filter(col(valueCol).isNotNull)
      .select(col(tsCol), rows.as("_r"))
      .select(col(tsCol), col("_r._cms_d").as("_cms_d"), col("_r._cms_b").as("_cms_b"))
      .groupBy(window(col(tsCol), width), col("_cms_d"), col("_cms_b"))
      .agg(count(lit(1)).as("_cms_n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("_cms_d"), col("_cms_b"), col("_cms_n"))
  }

  /** T6 — recent-N feed: latest n rows by `tsCol` (livestream.jsx:36-40's
    * last-5 history; the streaming side unions new appends in the sink). */
  def recentN(df: DataFrame, tsCol: String, n: Int, tieBreak: String): DataFrame =
    df.orderBy(col(tsCol).desc, col(tieBreak).desc).limit(n)

  /** Stream-stream interval join: each left event matched to right
    * events of the same key whose timestamp falls within
    * [left.ts - before, left.ts + after]. Both sides carry watermarks, so
    * with streaming inputs Spark bounds the join state to the interval +
    * lateness window and evicts it as the watermark advances — the
    * standard enrich-clicks-with-impressions shape. Works identically on
    * batch frames (plain conditioned join, no state). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   before: String = "10 minutes", after: String = "10 minutes",
                   lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $after"))
  }
}
