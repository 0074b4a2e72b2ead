package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Forward-fill and id-repair operators (SURVEY.md §2.5 W2/W3).
  *
  * The reference repairs non-numeric transaction ids with
  * `pd.to_numeric(errors='coerce')` + `ffill()` + `+1`
  * (cleaning.py:554-569). That is order-dependent; here the order is an
  * explicit column.
  *
  * Scale: a naive global-order ffill is a one-partition window — the
  * whole dataset funnels through a single task. Instead this implements
  * the distributed prefix-scan: range-partition on the order column,
  * forward-fill WITHIN each partition in parallel, aggregate one
  * (partition, last-non-null) row per partition, prefix-scan that tiny
  * summary on the driver, and broadcast the carry-in back. Two parallel
  * shuffles, no single-task stage, bit-identical to the global window.
  */
object FfillRepair {

  private val Pid = "_ffill_pid"
  private val Carry = "_ffill_carry"

  /** df + `out` column = last non-null `value` over the global order of
    * `orderCol` (inclusive of the current row when `inclusive`). The core
    * scalable prefix-scan shared by [[ffill]] and [[repairIds]]. */
  private def prefixLast(df: DataFrame, value: Column, orderCol: String,
                         inclusive: Boolean, out: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)

    // Eager localCheckpoint, NOT persist (the Pack.prefixSum pattern):
    // the summary branch and the carry-join branch must see the SAME
    // physical partitioning for the pids to line up, and a persist can
    // be evicted under pressure — whereupon AQE may read the recomputed
    // Exchange with different partition coalescing per branch (observed
    // in Pack: wrong offsets). The checkpoint freezes pids once, cuts
    // lineage, and its blocks are ContextCleaner-released when the frame
    // becomes unreachable — no CacheManager entry to leak per call.
    // Executor-loss trade-off centralized in [[Pin]].
    val parted = Pin.data(df
      .repartitionByRange(n, col(orderCol))
      .withColumn(Pid, spark_partition_id())
      .withColumn("_ffill_v", value))

    // one row per partition: the last non-null value it holds
    val summary = parted
      .filter(col("_ffill_v").isNotNull)
      .groupBy(col(Pid))
      .agg(max_by(col("_ffill_v"), col(orderCol)).as("_last"))
      .collect()
      .map(r => r.getInt(0) -> r.get(1))
      .toMap

    // driver-side prefix scan over ≤ numShufflePartitions entries:
    // carry(p) = last non-null value of any partition before p
    val valueType = parted.schema("_ffill_v").dataType
    var running: Any = null
    val carries = (0 until n).map { p =>
      val c = running
      summary.get(p).foreach(v => running = v)
      Row(p, c)
    }
    val carryDf = spark.createDataFrame(
      spark.sparkContext.parallelize(carries, 1),
      StructType(Seq(StructField(Pid, IntegerType, nullable = false),
                     StructField(Carry, valueType, nullable = true))))

    val frameEnd = if (inclusive) 0L else -1L
    val w = Window.partitionBy(col(Pid)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    parted
      .join(broadcast(carryDf), Pid)
      .withColumn(out,
        coalesce(last(col("_ffill_v"), ignoreNulls = true).over(w), col(Carry)))
      .drop(Pid, Carry, "_ffill_v")
  }

  /** W2 — pandas ffill(): last non-null value up to the current row.
    * With `partitionBy` the fill restarts per group (one parallel window);
    * without it, the scalable global prefix-scan above. */
  def ffill(df: DataFrame, c: String, orderCol: String,
            partitionBy: Seq[String] = Nil): DataFrame =
    if (partitionBy.nonEmpty) {
      val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    } else {
      prefixLast(df, col(c), orderCol, inclusive = true, out = "_ffill_out")
        .withColumn(c, col("_ffill_out")).drop("_ffill_out")
    }

  /** W3 — id repair with the reference's exact quirk: every non-numeric id
    * becomes (previous NUMERIC id) + 1, so CONSECUTIVE bad rows get the SAME
    * repaired id (cleaning.py:566-569 — ffill runs over the coerced column,
    * not the repaired one). Seed fills leading bad rows (reference: max-id
    * fallback 40000, cleaning.py:560-564). */
  def repairIds(df: DataFrame, idCol: String, orderCol: String,
                seed: Long = 40000L, out: String = "id_repaired"): DataFrame = {
    val numeric = when(col(idCol).rlike("^[0-9]+$"), col(idCol).cast(LongType))
    prefixLast(df, numeric, orderCol, inclusive = false, out = "_ffill_prev")
      .withColumn(out,
        when(numeric.isNotNull, numeric)
          .otherwise(coalesce(col("_ffill_prev"), lit(seed)) + 1))
      .drop("_ffill_prev")
  }
}
