package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines (SURVEY.md
  * north-star: a training-data engine needs stable train/val/test
  * assignment, not `randomSplit`).
  *
  * The assignment must be (a) a pure function of the row id — so a
  * re-run, a backfill, or another engine reproduces it exactly and no
  * document ever migrates between splits, and (b) uniform. Both come
  * from bucketing on the first hex digit of md5(id): 16 equal buckets,
  * portable to any engine with md5 (the DuckDB oracle reproduces it
  * verbatim). `randomSplit` satisfies neither — it is seed- and
  * partitioning-dependent.
  *
  * Scale: one codegen'd projection, no shuffle, no state.
  */
object Split {

  /** Hash bucket in [0, 16): position of the first md5 hex digit of the
    * id. Uniform for any id distribution (md5 avalanche). */
  def bucket16(id: Column): Column =
    (instr(lit("0123456789abcdef"), substring(md5(id.cast("string")), 1, 1)) - 1)
      .cast("long")

  /** Assign each row a split label from `weights` — (label, bucketCount)
    * pairs that must sum to 16, e.g. Seq("train" -> 12, "val" -> 2,
    * "test" -> 2) for a 75/12.5/12.5 split. Adds `bucket` and `split`. */
  def assign(df: DataFrame, id: Column,
             weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 16,
      s"bucket counts must sum to 16, got ${weights.map(_._2).sum}")
    require(weights.forall(_._2 > 0), "each split needs at least one bucket")
    val b = bucket16(id)
    val cuts = weights.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val label = weights.zip(cuts).init.foldRight(
      lit(weights.last._1)) { case (((name, _), hi), rest) =>
      when(b < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("bucket", b).withColumn("split", label)
  }
}
