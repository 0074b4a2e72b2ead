package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 partitioning story).
  *
  * A hash join on a skewed key sends every row of the hot key to one
  * task. AQE's skew-join handles the sort-merge case at runtime; salting
  * is the static remedy that also covers aggregation-style fan-ins:
  * the large side scatters each key across `parts` salt buckets, the
  * small side replicates each row into all `parts` buckets, and the join
  * runs on (key, salt) — result-identical to the plain join, but the hot
  * key's rows now spread over `parts` tasks.
  *
  * The salt is drawn from a seeded `rand` — correctness does not depend
  * on WHICH bucket a row lands in, only that both sides agree on the
  * bucket space, which replication guarantees.
  */
object Skew {

  val SaltCol = "_salt"

  /** Equi-join `large ⋈ small` on `key`, salted `parts` ways. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 parts: Int = 16, joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn(SaltCol,
      floor(rand(42) * parts).cast("int"))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(parts - 1))))
    salted.join(replicated, Seq(key, SaltCol), joinType).drop(SaltCol)
  }

  /** Two-stage aggregation for skewed group keys where the aggregate is
    * algebraic (sum/count/min/max): partial per (key, salt), then merge.
    * (For those apps Catalyst's map-side partial aggregation usually
    * suffices; this helps when upstream partitioning defeats it.) */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                parts: Int = 16, out: String = "sum"): DataFrame =
    df.withColumn(SaltCol, floor(rand(42) * parts).cast("int"))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))
}
