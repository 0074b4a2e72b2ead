package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert sink semantics (SURVEY.md §2.1 S6/S7).
  *
  * The reference upserts row batches into Postgres with
  * `supabase.table(...).upsert(records)` and degrades to plain insert /
  * skip on failure (`safe_upsert`, cleaning.py:165-199;
  * staging_script/cleaners/__init__.py:99). There is no transactional
  * MERGE target in a plain-parquet world, so the Spark-first restatement
  * is MERGE-as-algebra + an idempotent overwrite:
  *
  *  - `upsert` computes the post-merge state: the latest incoming version
  *    per key wins over the existing row; existing keys untouched by the
  *    batch survive. Re-applying the same batch is a no-op (idempotent —
  *    the retry semantics `safe_upsert` approximates operationally).
  *  - `writeUpsert` materializes that state atomically
  *    (write-new-then-swap via overwrite mode).
  *
  * Scale: one shuffle for the per-key latest on the (small) incoming
  * batch, one key-join against existing; with existing bucketed by the
  * key the join is co-located and only changed partitions rewrite
  * (partition-overwrite mode on a partitioned sink).
  */
object UpsertSink {

  /** Post-merge state of `existing` after applying `incoming`.
    *
    * @param orderCol column ordering versions WITHIN the incoming batch;
    *                 the highest wins (a batch can carry several versions
    *                 of one key — the reference applies them in order).
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    val latest = incoming
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .select(existing.columns.map(col): _*)
    existing.join(latest, keys, "left_anti").unionByName(latest)
  }

  /** Idempotent parquet materialization of the merged state. */
  def writeUpsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                  orderCol: String, path: String): Unit =
    upsert(existing, incoming, keys, orderCol)
      .write.mode("overwrite").parquet(path)
}
