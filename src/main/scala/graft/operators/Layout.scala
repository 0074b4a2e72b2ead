package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data layout: Morton (z-order) clustering keys.
  *
  * At warehouse scale, scan pruning on ONE sort column is free (min/max
  * file stats) but queries filter on several; interleaving the key bits
  * of k columns into one z-value and range-clustering on it keeps every
  * file's min/max tight on ALL k dimensions at once — the technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`. The operators here are the
  * engine-side pieces: the z-value expression (pure integer bit algebra,
  * so any engine reproduces it), the range repartition that makes writers
  * emit z-clustered files, and the per-bucket stats frame that shows the
  * bounds a pruning scan would use.
  *
  * Everything is built-in expressions (shiftleft/shiftright via
  * `call_function`, HOF aggregate) — codegen'd, no UDF, no shuffle for
  * the z-value itself.
  */
object Layout {

  /** Morton z-value of `cols`: the low `bits` bits of each column,
    * bit-interleaved (column 0 owns output bit positions 0, k, 2k, …).
    * Callers own mapping values into [0, 2^bits) — pass already-discrete
    * keys, or bucketized continuous values. `bits * cols.size` must fit
    * a signed long (≤ 62 to stay clear of the sign bit). */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 2, s"z-order needs >= 2 columns, got $k")
    require(bits >= 1 && bits * k <= 62, s"bits*cols must be in [2,62], got ${bits * k}")
    cols.zipWithIndex.map { case (c, j) =>
      val x = c.cast(LongType).bitwiseAND((1L << bits) - 1L)
      // spread x's bit i to output bit i*k + j. `bits` is a plan-time
      // constant, so the loop UNROLLS into a flat sum of shift/mask
      // terms — pure codegen'd arithmetic, where the earlier
      // `aggregate(sequence(...))` formulation paid an interpreted
      // lambda walk per row per bit (and tripped PlanAuditSpec rule 4
      // when fed straight from a scan)
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Contiguous z-range bucket id in [0, numBuckets): the z-value's top
    * bits. `numBuckets` must be a power of two so buckets are exact
    * z-ranges (equal-width prefixes). */
  def zBucket(z: Column, bits: Int, k: Int, numBuckets: Int): Column = {
    require(numBuckets >= 1 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two, got $numBuckets")
    val shift = bits * k - (63 - java.lang.Long.numberOfLeadingZeros(numBuckets.toLong))
    // a negative distance would WRAP (shiftright takes distance mod 64)
    // and silently scatter bucket ids instead of failing fast
    require(shift >= 0,
      s"numBuckets=$numBuckets exceeds the z-value space 2^(bits*k)=2^${bits * k}")
    call_function("shiftright", z, lit(shift))
  }

  /** Range-repartition by z-value — the step before a clustered write.
    * Each output partition covers a contiguous z-range, so per-file
    * min/max stats are tight on every interleaved dimension. */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int = 16,
                 out: String = "_zval"): DataFrame =
    df.withColumn(out, zValue(cols, bits))
      .repartitionByRange(col(out))

  /** Per-bucket layout stats — the bounds a pruning scan consults:
    * (bucket, n_rows, min/max of every clustered column). Tight bounds
    * on all dimensions at once are the whole point of z-clustering;
    * this frame makes that measurable (and oracle-checkable). */
  def zBucketStats(df: DataFrame, colNames: Seq[String], bits: Int = 16,
                   numBuckets: Int = 64): DataFrame = {
    val z = zValue(colNames.map(c => col(c)), bits)
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.withColumn("_z", z)
      .groupBy(zBucket(col("_z"), bits, colNames.size, numBuckets).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
