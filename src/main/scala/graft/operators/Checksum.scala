package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-insensitive table checksum — cross-system reconciliation for
  * warehouse loads (the reference reconciles sales totals per airline in
  * analysis.py; a migration additionally wants "is the WHOLE table
  * byte-identical on both sides" without ordering either copy).
  *
  * Each row is rendered to a canonical '|'-joined string, hashed to a
  * 60-bit integer (first 15 hex digits of md5 — md5 so any SQL engine can
  * reproduce the hash), and folded per group with order-insensitive
  * combiners: XOR, exact decimal SUM, and COUNT. Two table copies agree
  * on all three per group iff they almost surely hold the same multiset
  * of rows (XOR alone is blind to duplicate pairs; SUM+COUNT close that
  * hole).
  *
  * Scale: map-side hash + one hash aggregation on the group keys — the
  * shuffle carries one row per group, each a fixed-width triple. No sort
  * anywhere; a 100 TB reconciliation is one pass per side.
  *
  * Caveat: render only types with a canonical cross-engine string form
  * (integers, strings, dates) — raw DOUBLE formatting differs between
  * engines; round/format doubles first.
  */
object Checksum {

  /** 60-bit row hash of the '|'-joined canonical rendering of `cols`.
    * NULLs render as the empty string (concat_ws skips them), so NULL and
    * '' collide — acceptable for a checksum, documented here. */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
      .cast(LongType)

  /** Per group: n_rows, xor_hash, sum_hash (exact decimal sum rendered
    * as DOUBLE — deterministic, both engines round the same exact value
    * to the nearest double). */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    cols: Seq[String]): DataFrame =
    df.withColumn("_h", rowHash(cols.map(col)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_h)").as("xor_hash"),
        sum(col("_h").cast(DecimalType(38, 0))).cast(DoubleType).as("sum_hash"))
}
