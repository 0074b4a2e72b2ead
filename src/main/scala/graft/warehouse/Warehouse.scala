package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.sources.UpsertSink

/** Config-driven warehouse layering (SURVEY.md §2.10 M8).
  *
  * The reference declares one entry per fact family in
  * `backend/etl_scripts/table_configs.json:1-13` — staging, pre-fact,
  * dimension and fact table names, a natural key, `"scdType": 2`, and an
  * on-conflict (upsert) key per layer — and executes the chain inside
  * Postgres via the `start_passenger_etl_pipeline` stored procedure
  * (staging_script/cleaners/__init__.py:45-66). The procedure body lives
  * in the reference's hosted DB, so the layer algebra here is the
  * standard warehouse reading of exactly those config keys:
  *
  *  1. staging   = upsert(cleaned batch) on stagingOnConflict
  *  2. pre-fact  = upsert(measure projection of staging) on preFactOnConflict
  *  3. dimension = SCD-2 merge of the staged attribute snapshot
  *     (scdType: 2 — close changed versions, open new ones)
  *  4. fact      = upsert(pre-fact measures joined to the CURRENT
  *     dimension version) on factOnConflict; the fact row points at its
  *     dimension version through (naturalKey, dim valid_from)
  *
  * Scale: every layer is key-partitioned algebra — two window shuffles
  * (per-key latest in the upserts), one natural-key join per downstream
  * layer. With the layer tables bucketed by natural key all joins are
  * co-located; nothing touches the driver.
  */
object Warehouse {

  /** Typed mirror of one `table_configs.json` entry (keys 1:1). */
  final case class Config(stagingTable: String,
                          preFactTable: String,
                          dimensionTable: String,
                          factTable: String,
                          naturalKey: Seq[String],
                          scdType: Int,
                          stagingOnConflict: Seq[String],
                          preFactOnConflict: Seq[String],
                          factOnConflict: Seq[String])

  /** The reference's single declared family (table_configs.json:2-12). */
  val bookingSales: Config = Config(
    stagingTable = "staging_booking_sales",
    preFactTable = "prefact_booking_sales",
    dimensionTable = "dim_booking_sales",
    factTable = "fact_booking_sales",
    naturalKey = Seq("booking_reference"),
    scdType = 2,
    stagingOnConflict = Seq("booking_reference"),
    preFactOnConflict = Seq("booking_reference"),
    factOnConflict = Seq("booking_reference"))

  /** Current state of the four layers (empty frames bootstrap a fresh
    * warehouse). */
  final case class Layers(staging: DataFrame, preFact: DataFrame,
                          dimension: DataFrame, fact: DataFrame)

  /** Run one batch through staging → pre-fact → dimension → fact.
    *
    * @param batch       cleaned rows (a CleaningPipelines `.clean` output)
    *                    carrying naturalKey ++ dimCols ++ measureCols ++
    *                    versionCol
    * @param dimCols     SCD-2-tracked attribute columns
    * @param measureCols fact measure columns
    * @param versionCol  intra-batch ordering for upserts (ingest order)
    * @param asOf        effective date stamped on opened/closed versions
    * @param materialize applied to each produced layer. The reference
    *                    writes every layer to its own table per batch;
    *                    lazily chaining batches instead re-evaluates each
    *                    upstream layer once per downstream consumer (and
    *                    compounds across batches). Pass `_.persist()` (or
    *                    a write-then-read-back) to pin each layer once —
    *                    the default keeps the algebra fully lazy.
    */
  def run(cfg: Config, batch: DataFrame, existing: Layers,
          dimCols: Seq[String], measureCols: Seq[String],
          versionCol: String, asOf: Column,
          materialize: DataFrame => DataFrame = identity): Layers = {
    require(cfg.scdType == 2,
      s"only scdType 2 is declared by the reference (got ${cfg.scdType})")
    val key = cfg.naturalKey

    // 1. staging: latest incoming version per conflict key wins
    val staging = materialize(UpsertSink.upsert(existing.staging, batch,
      cfg.stagingOnConflict, versionCol))

    // 2. pre-fact: measure projection of staging, upserted
    val preFactProj = staging.select(
      (key ++ measureCols :+ versionCol).distinct.map(col): _*)
    val preFact = materialize(UpsertSink.upsert(existing.preFact, preFactProj,
      cfg.preFactOnConflict, versionCol))

    // 3. dimension: SCD-2 merge of the staged attribute snapshot
    val dimSnapshot = staging.select((key ++ dimCols).distinct.map(col): _*)
    val dimension = materialize(Scd2(existing.dimension, dimSnapshot,
      Scd2.Config(key, dimCols), asOf))

    // 4. fact: measures + pointer to the current dimension version
    val curDim = dimension.filter(col("is_current"))
      .select((key :+ "valid_from").map(col): _*)
      .withColumnRenamed("valid_from", "dim_valid_from")
    val factRows = preFact.join(curDim, key)
      .select((key ++ measureCols ++ Seq("dim_valid_from", versionCol)).map(col): _*)
    val fact = materialize(UpsertSink.upsert(existing.fact, factRows,
      cfg.factOnConflict, versionCol))

    Layers(staging, preFact, dimension, fact)
  }

  /** Bootstrap layer frames with the right schemas from a batch sample. */
  def emptyLayers(cfg: Config, batch: DataFrame, dimCols: Seq[String],
                  measureCols: Seq[String], versionCol: String): Layers = {
    val key = cfg.naturalKey
    val none = batch.filter(lit(false))
    val staging = none
    val preFact = none.select((key ++ measureCols :+ versionCol).distinct.map(col): _*)
    val dimension = none.select((key ++ dimCols).distinct.map(col): _*)
      .withColumn("valid_from", lit(null).cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val fact = none.select(
      (key ++ measureCols).distinct.map(col) ++
        Seq(lit(null).cast("date").as("dim_valid_from"), col(versionCol)): _*)
    Layers(staging, preFact, dimension, fact)
  }
}
