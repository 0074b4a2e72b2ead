package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins and aggregations (SURVEY.md §4
  * partitioning story; the reference's staging→warehouse loads re-shuffle
  * on every run — bucketing amortizes that shuffle into the write).
  *
  * Writing both sides of a recurring equi-join bucketed AND sorted by the
  * join key means Spark's sort-merge join reads both sides already
  * hash-partitioned and sorted: no Exchange, no per-query Sort, on any
  * later join or groupBy on those keys. At 100 TB this converts the
  * nightly fact⋈dim shuffle (the single largest cost in a star-schema
  * load) into a one-time layout decision.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); plain
  * `.parquet(path)` writes cannot carry it.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
