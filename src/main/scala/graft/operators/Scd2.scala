package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type 2 dimension maintenance (SURVEY.md §2.10 M8).
  *
  * The reference declares the warehouse flow in
  * `backend/etl_scripts/table_configs.json` (staging → prefact → dim → fact,
  * `"scdType": 2`, natural key, on-conflict keys) and executes it inside
  * Postgres via the `start_passenger_etl_pipeline` stored procedure
  * (staging_script/cleaners/__init__.py:45-66). Spark-first restatement:
  * pure DataFrame algebra — one equi-join on the natural key between staging
  * and the current dimension slice, change detection on the tracked columns,
  * then a union of (unchanged ∪ closed-old ∪ opened-new) versions.
  *
  * Scale: the natural-key join is the only shuffle; with both sides bucketed
  * or pre-partitioned on the natural key it is co-located. Change detection
  * is a codegen'd row-local comparison, and the unions are free (no shuffle).
  */
object Scd2 {

  final case class Config(naturalKey: Seq[String], compareCols: Seq[String],
                          validFrom: String = "valid_from",
                          validTo: String = "valid_to",
                          isCurrent: String = "is_current")

  /** Build the next dimension state from `dim` (full history) + `staging`
    * (new snapshot). `asOf` stamps new versions' valid_from and old
    * versions' valid_to.
    *
    * Semantics (standard SCD2, matching the reference config's intent):
    *  - new natural key        -> insert open version
    *  - changed compare cols   -> close current version at asOf, insert open
    *  - unchanged              -> keep as-is
    *  - key absent in staging  -> keep as-is (no implicit deletes)
    */
  def apply(dim: DataFrame, staging: DataFrame, cfg: Config, asOf: Column): DataFrame = {
    val k = cfg.naturalKey
    val hist = dim.filter(!col(cfg.isCurrent))
    val cur  = dim.filter(col(cfg.isCurrent))

    val stagedHash = md5(concat_ws("\u0001",
      cfg.compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val s = staging.withColumn("_s_hash", stagedHash)
    val c = cur.withColumn("_c_hash", md5(concat_ws("\u0001",
      cfg.compareCols.map(cc => coalesce(col(cc).cast("string"), lit("\u0000"))): _*)))

    val joined = s.as("s").join(c.as("c"),
      k.map(n => col(s"s.$n") <=> col(s"c.$n")).reduce(_ && _), "full_outer")

    // 1. unchanged current rows (or keys untouched by this batch)
    val unchanged = joined
      .filter(col("_s_hash").isNull || (col("_c_hash").isNotNull && col("_s_hash") === col("_c_hash")))
      .select(cur.columns.map(n => col(s"c.$n")): _*)

    // 2. close changed current rows
    val closed = joined
      .filter(col("_s_hash").isNotNull && col("_c_hash").isNotNull && col("_s_hash") =!= col("_c_hash"))
      .select(cur.columns.map(n => col(s"c.$n")): _*)
      .withColumn(cfg.validTo, asOf)
      .withColumn(cfg.isCurrent, lit(false))

    // 3. open new versions (new keys + changed keys)
    val opened = joined
      .filter(col("_s_hash").isNotNull && (col("_c_hash").isNull || col("_s_hash") =!= col("_c_hash")))
      .select((k.map(n => coalesce(col(s"s.$n"), col(s"c.$n")).as(n)) ++
        cfg.compareCols.map(n => col(s"s.$n").as(n))): _*)
      .withColumn(cfg.validFrom, asOf)
      .withColumn(cfg.validTo, lit(null).cast("date"))
      .withColumn(cfg.isCurrent, lit(true))

    val cols = dim.columns.map(col).toSeq
    hist.select(cols: _*)
      .unionByName(unchanged.select(cols: _*))
      .unionByName(closed.select(cols: _*))
      .unionByName(opened.select(dim.columns.map(col): _*))
  }

  /** Point-in-time join — the query-side half of SCD2: each fact row
    * picks the dimension VERSION that was valid on its event date
    * (`valid_from <= date < valid_to`, open version = NULL valid_to).
    * Left join: facts with no valid version (early events, unknown
    * keys) survive with NULL dim columns rather than vanishing —
    * as-of-history queries must not silently drop facts.
    *
    * Scale: the key equality drives a plain hash/sort-merge join (the
    * validity predicates ride along as join residual — never a
    * BroadcastNestedLoop); per-key version counts are small by SCD2
    * construction, so the residual scans a handful of rows per match.
    * With facts and dim bucketed on the key the join is exchange-free. */
  def pitJoin(facts: DataFrame, dim: DataFrame,
              factKey: String, dimKey: String, dateCol: String,
              validFrom: String = "valid_from",
              validTo: String = "valid_to"): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        facts(dateCol) >= dim(validFrom) &&
        (dim(validTo).isNull || facts(dateCol) < dim(validTo)),
      "left")
}
