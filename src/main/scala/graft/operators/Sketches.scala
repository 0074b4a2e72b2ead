package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch expressed as RELATIONAL ALGEBRA —
  * two hash aggregations — instead of an opaque binary buffer.
  *
  * Why relational instead of `approx_count_distinct` (Spark's built-in
  * HLL++): the register table IS the sketch. `max` per register is
  * associative and commutative, so shards/partitions/days can each
  * publish their own register table and a later `groupBy(register).max`
  * merges them — the incremental-corpus pattern a 100 TB pipeline needs
  * (union last week's register table with today's delta; never rescan
  * history). It is also engine-portable and auditable: every step is
  * md5 + integer arithmetic, so the DuckDB oracle reproduces the
  * estimate bit-for-bit, which no binary-buffer sketch can offer.
  *
  * Hash layout (per value): `h = md5(value)`; register index = first
  * two hex digits (m = 256 registers); `rho` = leading-zero count of
  * the next 48 bits + 1 (both engines compute it as
  * `49 - length(bin(v48))`, since `bin` renders without leading zeros
  * in Spark and DuckDB alike).
  *
  * Estimator (Flajolet et al. 2007): `alpha_m * m^2 / sum(2^-rho)`,
  * with linear counting `m * ln(m/V)` when the raw estimate <= 2.5m
  * and V (empty registers) > 0. The indicator sum — present registers
  * contribute `2^(49-rho)`, empty ones `2^49` (= `2^-0` scaled) — is
  * computed EXACTLY as an integer (<= 256 * 2^49 < 2^63), so the
  * result is independent of partition/merge order; the only float ops
  * are the final division and `ln`, identical IEEE in both engines.
  *
  * Scale shape: stage 1 is a map-side-combinable hash agg keyed by
  * (group, register) — at most `m` rows per group survive the shuffle
  * regardless of input size; stage 2 aggregates those <= m rows per
  * group. No driver state, no UDAF buffer, nothing non-codegen.
  */
object Sketches {

  /** Number of HLL registers (first two md5 hex digits). */
  val HllM = 256

  private def hexVal(h: Column, from: Int, len: Int): Column =
    conv(substring(h, from, len), 16, 10).cast("long")

  /** Per-row (register, rho) pair for `value`; NULL values yield NULL
    * register and must be filtered by the caller (same as COUNT
    * DISTINCT semantics). Public so streaming aggregations
    * ([[graft.streaming.EventWindows.approxDistinctRegisters]]) can
    * build per-window register tables with the identical hash layout. */
  def regRho(value: Column): (Column, Column) = {
    val h = md5(value.cast("string"))
    val reg = hexVal(h, 1, 2)
    val v48 = hexVal(h, 3, 12)
    val rho = when(v48 === 0L, lit(49))
      .otherwise(lit(49) - length(bin(v48)))
    (reg, rho)
  }

  /** The sketch itself: one row per (group, register) with the max rho
    * observed. Mergeable: union register tables from any number of
    * shards and re-run `groupBy(keys :+ register).max(rho)`. */
  def hllRegisters(df: DataFrame, value: Column,
                   groupCols: Seq[String]): DataFrame = {
    val (reg, rho) = regRho(value)
    df.filter(value.isNotNull)
      .select(groupCols.map(col) ++ Seq(reg.as("_hll_reg"), rho.as("_hll_rho")): _*)
      .groupBy((groupCols :+ "_hll_reg").map(col): _*)
      .agg(max(col("_hll_rho")).as("_hll_rho"))
  }

  /** Collapse a register table (from [[hllRegisters]], possibly merged
    * across shards) into the cardinality estimate per group. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  out: String = "approx_distinct"): DataFrame = {
    val m = HllM
    // alpha written as its defining formula (not a rounded literal) so
    // both engines evaluate the identical double expression
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    // SQL form: the Scala `shiftleft` helper only accepts a literal
    // bit count, but the SQL function shifts by an expression
    val s = sum(expr("shiftleft(CAST(1 AS BIGINT), 49 - _hll_rho)")).as("_s")
    val nregs = count(lit(1)).as("_nregs")
    val grouped =
      if (groupCols.isEmpty) registers.groupBy().agg(s, nregs)
      else registers.groupBy(groupCols.map(col): _*).agg(s, nregs)
    val v = lit(m) - col("_nregs") // empty registers
    // every EMPTY register contributes 2^-0 = 1 to the indicator sum,
    // i.e. 2^49 in the integer scaling — still exact: <= 256 * 2^49 < 2^63
    val sTotal = (col("_s") + v.cast("long") * lit(1L << 49)).cast("double")
    val raw = alpha * lit(m.toDouble) * lit(m.toDouble) *
      lit(math.pow(2.0, 49)) / sTotal
    val est = when(raw <= lit(2.5 * m) && v > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
    grouped
      .withColumn(out, bround(est, 6))
      .drop("_s", "_nregs")
  }

  /** One-call grouped approximate distinct count. */
  def hllDistinct(df: DataFrame, value: Column, groupCols: Seq[String],
                  out: String = "approx_distinct"): DataFrame =
    hllEstimate(hllRegisters(df, value, groupCols), groupCols, out)

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005) in the same
    * relational-register style as the HLL above: the sketch is a
    * (depth, bucket, count) table — at most `depth * width` rows per
    * group regardless of input size — built by ONE map-side-combinable
    * hash aggregation over an exploded depth axis. Counts MERGE BY
    * ADDITION (shards/days/deltas union + re-sum), and the estimate for
    * any value is `min` over its depth rows — a one-sided bound
    * (estimate >= true count, always; over-count bounded by
    * collisions ~ N/width per row). Every step is md5 + integer
    * arithmetic, so a SQL oracle reproduces the registers AND the
    * estimates exactly — no floating point anywhere.
    *
    * The classic training-pipeline uses: heavy-hitter terms without a
    * full vocabulary shuffle (probe a candidate set against the tiny
    * register table), hot-key detection for salting decisions, and
    * frequency caps over unbounded streams (the register table is the
    * state, watermark/TTL-evictable like the HLL one). */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Bucket of `value` in depth row `d`: first 48 md5 bits of
    * "d:value" mod width. */
  def cmsBucket(value: Column, d: Int, width: Int = CmsWidth): Column =
    hexVal(md5(concat(lit(s"$d:"), value.cast("string"))), 1, 12) % width

  /** The sketch: one row per (group, depth, bucket) with the occurrence
    * count. NULL values are excluded (COUNT semantics). */
  def cmsRegisters(df: DataFrame, value: Column, groupCols: Seq[String],
                   depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    val rows = explode(array((0 until depth).map(d =>
      struct(lit(d).as("_cms_d"), cmsBucket(value, d, width).as("_cms_b"))): _*))
    df.filter(value.isNotNull)
      .select(groupCols.map(col) :+ rows.as("_r"): _*)
      .select(groupCols.map(col) ++ Seq(col("_r._cms_d").as("_cms_d"),
        col("_r._cms_b").as("_cms_b")): _*)
      .groupBy((groupCols ++ Seq("_cms_d", "_cms_b")).map(col): _*)
      .agg(count(lit(1)).as("_cms_n"))
  }

  /** Probe `probes(probeCol)` against a register table (possibly merged
    * across shards with `groupBy(..).sum(_cms_n)`): appends `out` =
    * min over depth of the matching bucket counts. Probes whose value
    * never occurred still get their collision floor (>= 0), preserving
    * the one-sided contract. The register table is at most
    * depth x width rows per group — broadcast-sized by construction.
    *
    * CONTRACT: `probes` rows must be DISTINCT — the final re-group keys
    * on ALL probe columns, so duplicate probe rows silently collapse to
    * one output row (a distinctness check would cost a full extra job,
    * so it stays a documented precondition). `_cms_d`/`_cms_b`/`_cms_n`/
    * `_r` are reserved internal names and ARE require()d, so a caller
    * outside q101/q102 fails loudly instead of losing rows. */
  def cmsEstimate(registers: DataFrame, probes: DataFrame, probeCol: String,
                  groupCols: Seq[String], depth: Int = CmsDepth,
                  width: Int = CmsWidth, out: String = "est_count"): DataFrame = {
    val reserved = Set("_cms_d", "_cms_b", "_cms_n", "_r")
    val clash = probes.columns.filter(reserved)
    require(clash.isEmpty,
      s"cmsEstimate: probe columns collide with internal names: ${clash.mkString(",")}")
    val probeRows = probes.withColumn("_r",
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("_cms_d"),
            cmsBucket(col(probeCol), d, width).as("_cms_b"))): _*)))
      .select(probes.columns.map(col) ++ Seq(col("_r._cms_d").as("_cms_d"),
        col("_r._cms_b").as("_cms_b")): _*)
    probeRows
      .join(broadcast(registers), groupCols ++ Seq("_cms_d", "_cms_b"), "left")
      .na.fill(0L, Seq("_cms_n"))
      .groupBy(probes.columns.map(col): _*)
      .agg(min(col("_cms_n")).as(out))
  }

  /** The DuckDB replay of [[hllDistinct]] over `table`, grouping by
    * `groupCol` and sketching `valueExpr` — kept HERE next to the Scala
    * definition so the two formulations evolve together. Pure SQL:
    * md5 + strpos digit arithmetic + bin(), the same estimator
    * constants, and the same exact-integer indicator sum. */
  def hllOracleSql(table: String, groupCol: String, valueExpr: String,
                   out: String = "approx_distinct"): String = {
    val d = (1 to 14).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)")
    val reg = s"${d(0)} * 16 + ${d(1)}"
    val v48 = (2 until 14).map(i =>
      s"${d(i)} * ${java.lang.Long.toString(1L << (4 * (13 - i)))}"
    ).mkString(" + ")
    s"""WITH h AS (
       |  SELECT $groupCol AS grp, md5(CAST($valueExpr AS VARCHAR)) AS h
       |  FROM $table WHERE $valueExpr IS NOT NULL),
       |bits AS (
       |  SELECT grp, $reg AS reg, $v48 AS v48 FROM h),
       |regs AS (
       |  SELECT grp, reg,
       |         max(CASE WHEN v48 = 0 THEN 49
       |                  ELSE 49 - length(bin(v48)) END) AS rho
       |  FROM bits GROUP BY grp, reg),
       |agg AS (
       |  SELECT grp,
       |         CAST(sum(1::BIGINT << (49 - rho)) AS BIGINT) AS s,
       |         count(*) AS nregs
       |  FROM regs GROUP BY grp),
       |est AS (
       |  SELECT grp, 256 - nregs AS v,
       |         (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
       |           * ${math.pow(2.0, 49)}
       |           / CAST(s + (256 - nregs) * ${1L << 49} AS DOUBLE) AS raw
       |  FROM agg)
       |SELECT grp AS $groupCol,
       |       round(CASE WHEN raw <= ${2.5 * HllM} AND v > 0
       |                  THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE))
       |                  ELSE raw END, 6) AS $out
       |FROM est""".stripMargin
  }
}
