package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Forward-fill and id-repair operators (SURVEY.md §2.5 W2/W3).
  *
  * The reference repairs non-numeric transaction ids with
  * `pd.to_numeric(errors='coerce')` + `ffill()` + `+1`
  * (cleaning.py:554-569). That is order-dependent; here the order is an
  * explicit column.
  *
  * Scale note: an unpartitioned ffill is a single global ordering — on a
  * real cluster that is one task. Callers with a natural partition key
  * should pass `partitionBy` so the window parallelizes; the global form
  * exists only for exact pandas parity on modest inputs.
  */
object FfillRepair {

  private def w(orderCol: String, partitionBy: Seq[String]) = {
    val base =
      if (partitionBy.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderCol))
    base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** W2 — pandas ffill(): last non-null value up to the current row. */
  def ffill(df: DataFrame, c: String, orderCol: String,
            partitionBy: Seq[String] = Nil): DataFrame =
    df.withColumn(c, last(col(c), ignoreNulls = true).over(w(orderCol, partitionBy)))

  /** W3 — id repair with the reference's exact quirk: every non-numeric id
    * becomes (previous NUMERIC id) + 1, so CONSECUTIVE bad rows get the SAME
    * repaired id (cleaning.py:566-569 — ffill runs over the coerced column,
    * not the repaired one). Seed fills leading bad rows (reference: max-id
    * fallback 40000, cleaning.py:560-564). */
  def repairIds(df: DataFrame, idCol: String, orderCol: String,
                seed: Long = 40000L, out: String = "id_repaired"): DataFrame = {
    val numeric = when(col(idCol).rlike("^[0-9]+$"), col(idCol).cast(LongType))
    val prev = last(numeric, ignoreNulls = true)
      .over(w(orderCol, Nil).rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn(out,
      when(numeric.isNotNull, numeric)
        .otherwise(coalesce(prev, lit(seed)) + 1))
  }
}
