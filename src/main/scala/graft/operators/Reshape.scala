package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide <-> long reshape — the pandas `pivot_table` / `melt` pair the
  * reference's cleaning notebooks lean on for report shaping
  * (staging_script works on pandas frames throughout; pivot/melt are the
  * standard reshape verbs of that toolchain), expressed as Spark
  * relational operators.
  *
  * Scale: `pivotWide` passes an EXPLICIT pivot-value list so the plan is
  * static — no eager distinct-scan job to discover column values, and a
  * deterministic output schema (on a 100 TB table an implicit pivot first
  * runs a full distinct over the pivot column on the driver). The pivot
  * itself compiles to ONE hash aggregation with FILTER-style conditional
  * aggregates — one shuffle on the row keys, map-side partial combine.
  * `meltLong` is Spark's native `unpivot` (Expand operator) — a map-only
  * row multiplication, no shuffle at all.
  */
object Reshape {

  /** Group by `rowKeys`, pivot `pivotCol` over the explicit `values`,
    * computing each aggregate in `aggs` (alias -> expression) per cell.
    * Output columns follow Spark's pivot naming: `<value>_<alias>` for
    * multiple aggregates, `<value>` for a single one. Cells with no rows
    * are NULL for EVERY aggregate, counts included — the multi-aggregate
    * pivot materializes per-cell structs rather than rewriting to FILTER
    * aggregates, so an absent cell has nothing to count. */
  def pivotWide(df: DataFrame, rowKeys: Seq[String], pivotCol: String,
                values: Seq[String], aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "pivotWide needs at least one aggregate")
    val named = aggs.map { case (alias, c) => c.as(alias) }
    df.groupBy(rowKeys.map(col): _*)
      .pivot(pivotCol, values)
      .agg(named.head, named.tail: _*)
  }

  /** Long form of `df`: one output row per (input row, value column),
    * with the column name in `varCol` and its value in `valueCol`.
    * Value columns must share a common type (cast before melting). */
  def meltLong(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
               varCol: String = "variable", valueCol: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varCol, valueCol)
}
