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
    // NaN would survive isNotNull, ride (NaN-lo)/width to a non-ANSI int
    // cast, and silently land in bin 0 — exclude it like NULL (the cast
    // to double makes the guard a no-op for integral inputs).
    // The bin table is pinned (<= `bins` rows — a parameter, not data)
    // so the share denominator reads the SAME materialized aggregate
    // instead of re-scanning the data, and the total rides back as a
    // broadcast one-row frame rather than an unpartitioned WindowExec
    // (whose "No Partition Defined" warning was noise masking real
    // unbounded-window regressions).
    val binsDf = Pin.param(
      df.filter(value.isNotNull && !isnan(value.cast("double")))
        .groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("n")))
    val total = binsDf.agg(sum(col("n")).as("_total"))
    binsDf.crossJoin(broadcast(total))
      .select(col("bin"),
        bround(lit(lo) + col("bin") * lit(width), 6).as("bin_lo"),
        bround(lit(lo) + (col("bin") + 1) * lit(width), 6).as("bin_hi"),
        col("n"),
        bround(col("n").cast("double")
          / col("_total").cast("double"), 6).as("share"))
  }

  /** Approximate quantiles AT READ TIME from an equi-width bin table —
    * [[histogram]]'s (bin, n) rows, possibly merged across shards /
    * days / deltas by `groupBy(bin).sum(n)` (bin counts merge by
    * ADDITION, the same register-table pattern as the HLL and CMS
    * sketches). For each requested q: target rank = q x N, the first
    * bin whose cumulative count reaches it is selected, and the
    * estimate interpolates linearly inside that bin — error bounded by
    * one bin width, deterministically. Every frame here is <= bins x
    * |qs| rows (parameters, not data), so the triangular self-join and
    * broadcast total below are config-bounded work. */
  def histogramQuantiles(binTable: DataFrame, lo: Double, hi: Double,
                         bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins > 0 && hi > lo, s"bad bin spec [$lo, $hi) / $bins")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1], got $qs")
    val width = (hi - lo) / bins
    // pin the (bin, n) table once (<= bins rows — parameters, not data),
    // then build the inclusive cumulative count by exploding each row's
    // count onto every bin index at or above it (<= bins² rows of a
    // config-bounded table, all equi-joins — no non-equi join for the
    // audit to squint at) and the total via a broadcast one-row
    // aggregate — no unpartitioned WindowExec, so the "No Partition
    // Defined" warning keeps its signal value for real unbounded-window
    // regressions. The pre-group also makes duplicate bin rows (shards
    // merged by union without the documented groupBy) well-defined
    // instead of physical-order-dependent.
    val binsDf = Pin.param(binTable.groupBy(col("bin"))
      .agg(sum(col("n")).as("n")))
    val total = binsDf.agg(sum(col("n")).as("total"))
    val cum = binsDf
      .select(explode(sequence(col("bin").cast("int"), lit(bins - 1)))
        .as("_tb"), col("n").as("_pn"))
      .groupBy(col("_tb")).agg(sum(col("_pn")).as("cum"))
      .join(binsDf.select(col("bin"), col("n")),
        col("_tb") === col("bin"))
      .drop("_tb")
      .crossJoin(broadcast(total))
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
