package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned-parquet ledger both streaming merge sinks share
  * ([[UpsertSink.applyBatch]] last-writer-wins, `Scd2Stream` dimension
  * history): a table is a directory of immutable version dirs
  * `v<batchId>`, each the FULL post-merge state after that batch.
  *
  * Exactly-once without a transactional format rests on two properties
  * this utility centralizes:
  *  - a batch always merges the latest version STRICTLY OLDER than its
  *    own id ([[latestBefore]]), so a foreachBatch replay (at-least-once
  *    delivery) recomputes from the SAME predecessor and its overwrite
  *    is bit-identical — idempotent apply upgrades the guarantee;
  *  - retention never deletes the newest `retain` versions
  *    ([[prune]]), so the predecessor a concurrent replay might still
  *    need survives at least one retained step.
  *
  * Readers take [[readLatest]] (max version) and never observe a
  * partial write (parquet overwrite is write-new-then-swap). At 100 TB
  * a version is a full-table rewrite — the honest merge-on-parquet
  * cost; a key-partitioned sink with partition-overwrite, or a
  * Delta/Iceberg MERGE target, keeps these semantics and shrinks the
  * write.
  */
object VersionedTable {

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  /** All version ids present under `tableDir` (creates the dir). */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val f = fs(spark, tableDir)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    f.mkdirs(root)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .flatMap(st => scala.util.Try(st.getPath.getName.drop(1).toLong).toOption)
  }

  /** The state a batch with `batchId` must merge against: the newest
    * version strictly older than it, or None on a fresh table. */
  def latestBefore(spark: SparkSession, tableDir: String,
                   batchId: Long): Option[DataFrame] =
    versions(spark, tableDir).filter(_ < batchId).sorted.lastOption
      .map(p => spark.read.parquet(s"$tableDir/v$p"))

  /** Overwrite version `batchId` with `state` (deterministic replay
    * target), then drop versions beyond the newest `retain`. */
  def write(state: DataFrame, tableDir: String, batchId: Long,
            retain: Int = 2): Unit = {
    val spark = state.sparkSession
    state.write.mode("overwrite").parquet(s"$tableDir/v$batchId")
    val f = fs(spark, tableDir)
    val keep = versions(spark, tableDir).sorted
      .takeRight(math.max(1, retain)).toSet
    versions(spark, tableDir).filterNot(keep).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/v$v"), true): Unit
    }
  }

  /** Current state (max version). */
  def readLatest(spark: SparkSession, tableDir: String): DataFrame = {
    val vs = versions(spark, tableDir)
    require(vs.nonEmpty, s"no versions under $tableDir")
    spark.read.parquet(s"$tableDir/v${vs.max}")
  }
}
