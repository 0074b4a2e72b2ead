package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — the temporal lookup the reference's eligibility path
  * approximates with its latest-row-then-join dance (server.js:237-242
  * "most recent flight row", SURVEY.md §2.3 notes as-of as explicitly
  * absent from the reference and from Spark's built-ins).
  *
  * `backward(l, r, …)`: for every left row, the LATEST right row of the
  * same key with rightTime <= leftTime (inclusive); null-filled when no
  * prior right row exists — i.e. DuckDB/kdb `ASOF LEFT JOIN` semantics.
  *
  * Implementation is the union-scan formulation, not a range join: tag
  * both sides, union, and forward-fill the right payload over a
  * (key, time, side) window. ONE hash shuffle on the key, no per-row
  * range probe, no skew beyond the key distribution itself — at 100 TB
  * this is a single sort-based window over the combined stream, the same
  * cost as any keyed window.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPrefix: String = "r_"): DataFrame = {
    val lPayloadCols = left.columns.filterNot(keys.contains)
    val rPayloadCols = right.columns.filterNot(keys.contains)
    val lType = StructType(left.schema.fields.filter(f => lPayloadCols.contains(f.name)))
    val rType = StructType(right.schema.fields.filter(f => rPayloadCols.contains(f.name)))

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_asof_t"),
        lit(1).as("_asof_side"),
        struct(lPayloadCols.map(col): _*).as("_asof_l"),
        lit(null).cast(rType).as("_asof_r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_asof_t"),
        lit(0).as("_asof_side"),
        lit(null).cast(lType).as("_asof_l"),
        struct(rPayloadCols.map(col): _*).as("_asof_r")): _*)

    // right sorts BEFORE left at equal time -> inclusive (<=) semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_asof_match", last(col("_asof_r"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(
        keys.map(col) ++
          lPayloadCols.map(c => col("_asof_l").getField(c).as(c)) ++
          rPayloadCols.map(c => col("_asof_match").getField(c).as(rightPrefix + c)): _*)
  }
}
