package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.4 A4/A5, §2.5 W1).
  *
  * The reference deduplicates with pandas `duplicated(keep='first')`
  * (cleaning.py:384,439,492,594-595) — file-order-sensitive. Spark-first
  * restatement: a `row_number` window over an explicit ingest-order column,
  * which shuffles once on the dedup key and scales linearly; `keep='first'`
  * is defined relative to `orderCol`, not physical row order.
  */
object Dedup {

  /** W1 — keep the first row per key by `orderCol` (pandas
    * duplicated(keep='first') parity; cleaning.py:384). */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** W1 as a flag column — marks every row after the first per key, so a
    * caller can split clean/quarantine in one pass (P3). */
  def dupFlag(df: DataFrame, keys: Seq[String], orderCol: String,
              flag: String = "_is_dup"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn(flag, row_number().over(w) > 1)
  }

  /** A5 — whole-row exact duplicate detection (cleaning.py:594): keeps the
    * first occurrence of every full-row value by `orderCol`. */
  def exactDedup(df: DataFrame, orderCol: String): DataFrame =
    keepFirst(df, df.columns.filter(_ != orderCol).toSeq, orderCol)

  /** A4 — duplicate key report: keys occurring more than once with their
    * counts (functions.py:359-376). Map-side partial aggregation makes this
    * one shuffle of (key, partialCount) pairs — scale-safe. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
}
