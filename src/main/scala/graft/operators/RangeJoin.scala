package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval (range) join: left rows whose point value falls inside a
  * right-side [start, end] interval (SURVEY.md §2.3 lists range joins as
  * absent from both the reference and Spark's equi-join machinery —
  * Spark plans a point-in-interval join as BroadcastNestedLoop, O(L×R)).
  *
  * Scale path: quantize the value domain into `bucketWidth` cells. Each
  * left row lands in exactly one cell; each interval explodes into the
  * cells it covers. An equi-join on the cell plus the exact BETWEEN
  * refilter gives identical results with a hash shuffle instead of a
  * nested loop: O(|L| + Σ cells-per-interval) join input. Pick
  * bucketWidth near the median interval length so intervals explode into
  * ~1-3 cells.
  *
  * A left row meets a given interval in at most one cell (its own), so
  * no dedup pass is needed.
  */
object RangeJoin {

  /** Inner point-in-interval join on numeric (castable-to-long) columns. */
  def intervalJoin(left: DataFrame, leftValue: String,
                   right: DataFrame, startCol: String, endCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("_cell",
      floor(col(leftValue).cast(LongType) / bucketWidth))
    val rb = right.withColumn("_cell",
      explode(sequence(
        floor(col(startCol).cast(LongType) / bucketWidth),
        floor(col(endCol).cast(LongType) / bucketWidth))))
    lb.join(rb, Seq("_cell"))
      .filter(col(leftValue).between(col(startCol), col(endCol)))
      .drop("_cell")
  }
}
