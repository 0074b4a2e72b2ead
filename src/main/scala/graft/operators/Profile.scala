package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Data profiling — the per-column quality summary every warehouse
  * ingest step wants (the reference eyeballs these in its cleaning
  * notebooks; here it is one operator).
  *
  * One aggregation pass over the table produces every column's stats
  * simultaneously; the result is then unpivoted to one row per column.
  * Distinct counts are exact (Catalyst plans the multi-DISTINCT
  * aggregation via Expand — one shuffled pass per distinct column);
  * for ultra-wide tables at 100 TB swap `count_distinct` for
  * `approx_count_distinct` (HLL, single pass) — the operator takes the
  * aggregation function as a parameter for exactly that switch.
  */
object Profile {

  /** (column, n_rows, n_nonnull, n_nulls, n_distinct, min, max) per
    * profiled column. min/max are rendered as strings so one schema fits
    * all column types; profile numeric columns separately if numeric
    * stats are needed. */
  def describe(df: DataFrame, cols: Seq[String],
               distinctFn: String => org.apache.spark.sql.Column =
                 c => count_distinct(col(c))): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        distinctFn(c).as(s"__d_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    row.select(col("__total"), explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          col(s"__n_$c").as("n_nonnull"),
          col(s"__d_$c").as("n_distinct"),
          col(s"__min_$c").as("min"),
          col(s"__max_$c").as("max"))
      }: _*)).as("p"))
      .select(col("p.column"), col("__total").as("n_rows"),
        col("p.n_nonnull"), (col("__total") - col("p.n_nonnull")).as("n_nulls"),
        col("p.n_distinct"), col("p.min"), col("p.max"))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets over
    * [lo, hi), out-of-range values clamped into the edge buckets (so
    * every non-null row is counted — a distribution check must not
    * silently drop the outliers it exists to reveal). Emits one row per
    * NON-EMPTY bucket: (bin, bin_lo, bin_hi, n, share).
    *
    * Scale: one codegen'd bin projection + one hash aggregation whose
    * shuffle carries at most `bins` rows per upstream partition
    * (map-side combine); per-bin counts from shards/days merge by
    * addition, making the histogram incrementally maintainable. */
  def histogram(df: DataFrame, value: org.apache.spark.sql.Column,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1),
      greatest(lit(0), floor((value - lit(lo)) / lit(width)).cast("int")))
    // total from the aggregated bins themselves — ONE scan of the data;
    // the unpartitioned window is safe: it runs over <= `bins` rows (a
    // parameter, not a function of data volume)
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // NaN would survive isNotNull, ride (NaN-lo)/width to a non-ANSI int
    // cast, and silently land in bin 0 — exclude it like NULL (the cast
    // to double makes the guard a no-op for integral inputs)
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        bround(lit(lo) + col("bin") * lit(width), 6).as("bin_lo"),
        bround(lit(lo) + (col("bin") + 1) * lit(width), 6).as("bin_hi"),
        col("n"),
        bround(col("n").cast("double")
          / sum(col("n")).over(w).cast("double"), 6).as("share"))
  }

  /** Approximate quantiles AT READ TIME from an equi-width bin table —
    * [[histogram]]'s (bin, n) rows, possibly merged across shards /
    * days / deltas by `groupBy(bin).sum(n)` (bin counts merge by
    * ADDITION, the same register-table pattern as the HLL and CMS
    * sketches). For each requested q: target rank = q x N, the first
    * bin whose cumulative count reaches it is selected, and the
    * estimate interpolates linearly inside that bin — error bounded by
    * one bin width, deterministically. Every frame here is <= bins x
    * |qs| rows (parameters, not data), so the unpartitioned windows are
    * config-bounded exactly like histogram's share denominator. */
  def histogramQuantiles(binTable: DataFrame, lo: Double, hi: Double,
                         bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins > 0 && hi > lo, s"bad bin spec [$lo, $hi) / $bins")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1], got $qs")
    val width = (hi - lo) / bins
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = binTable.select(col("bin"), col("n"))
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
    val probes = cum
      .select(col("*"), explode(typedLit(qs)).as("q"))
      .withColumn("target", col("q") * col("total").cast("double"))
      // first bin whose cumulative count reaches the target rank;
      // q = 0 (target 0) picks the first bin and interpolates to its lo
      .filter(col("cum").cast("double") >= col("target"))
    val first = Window.partitionBy(col("q")).orderBy(col("bin"))
    // bround (half-even) here matches the q103 oracle's round_even
    // exactly — the INTERPOLATED estimate was the one place the repo's
    // bround-vs-round rounding convention could in principle hash-flake
    // on a .xxxxxx5 tie, so that oracle (and q93's) uses DuckDB
    // round_even and the tie class is closed rather than merely unobserved
    probes.withColumn("_rn", row_number().over(first))
      .filter(col("_rn") === 1)
      .select(col("q"),
        bround(lit(lo) + col("bin") * lit(width) +
          (col("target") - (col("cum") - col("n")).cast("double"))
            / col("n").cast("double") * lit(width), 6).as("estimate"),
        col("total").as("n_rows"))
  }
}
