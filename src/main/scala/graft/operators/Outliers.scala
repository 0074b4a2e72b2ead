package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group-wise z-score outlier detection — the statistical cousin of the
  * reference's fixed-threshold quarantine rules (cleaning.py clips fares
  * at hard bounds; a warehouse also wants "flag rows k sigma from their
  * group's mean" where the bound is data-driven per group).
  *
  * Determinism across engines: the group moments are computed from EXACT
  * decimal sums (sum x, sum x^2 as DECIMAL — order-independent, no
  * floating-point drift across partitionings), converted to DOUBLE only
  * for the final mean / variance / z arithmetic, which is a fixed IEEE
  * expression tree both engines evaluate identically.
  *
  * Scale: one hash aggregation over the group keys (map-side partial
  * combine) produces a moments frame with one row per group; joining it
  * back is a broadcast when groups are few (the usual case) or a shuffle
  * join on the same keys otherwise — Spark's size-based planning picks.
  * No windows: a per-group window formulation would sort the fact table;
  * the agg+join formulation never sorts and never materializes per-group
  * row lists.
  */
object Outliers {

  /** Rows of `df` whose `valueCol` lies strictly more than `k` population
    * standard deviations from their group mean, annotated with the group
    * moments (`grp_n`, `grp_mean`, `grp_std`) and the score `z`
    * (round 6). Zero-variance groups produce no outliers. */
  def zscore(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Double): DataFrame = {
    // DECIMAL(18,6): the square stays DECIMAL(37,12) <= 38 digits, so both
    // the sum and the sum of squares are EXACT (a wider input decimal
    // would make v*v overflow precision 38 and round — engine-divergent).
    val v = col(valueCol).cast(DecimalType(18, 6))
    val moments = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("grp_n"),
        sum(v).as("_sum"),
        sum(v * v).as("_sumsq"))
    val n = col("grp_n").cast(DoubleType)
    val mean = col("_sum").cast(DoubleType) / n
    val varPop = col("_sumsq").cast(DoubleType) / n - mean * mean
    val stats = moments
      .withColumn("grp_mean", mean)
      .withColumn("grp_std", sqrt(greatest(varPop, lit(0.0))))
      .drop("_sum", "_sumsq")
    df.join(stats, groupCols)
      .withColumn("z",
        round((col(valueCol).cast(DoubleType) - col("grp_mean")) / col("grp_std"), 6))
      .filter(col("grp_std") > 0 && abs(col("z")) > k)
      .withColumn("grp_mean", round(col("grp_mean"), 6))
      .withColumn("grp_std", round(col("grp_std"), 6))
  }
}
