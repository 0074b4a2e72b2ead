package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** Train/eval contamination detection — the decontamination step every
  * large-scale training-data pipeline runs before training: find training
  * documents that contain (verbatim or near-verbatim) pieces of an
  * evaluation set, so they can be dropped.
  *
  * Standard recipe (word-n-gram overlap, as popularized by the GPT-3 /
  * PaLM data cards): a train doc is contaminated by an eval doc when a
  * large-enough fraction of the eval doc's distinct word n-grams appears
  * in the train doc.
  *
  * 100 TB shape:
  *  - each side is reduced to (id, hashed n-gram) pairs — one exploded
  *    projection, no text on the shuffle;
  *  - the join is a hash equi-join on the 64-bit n-gram hash. The eval
  *    side is tiny relative to the corpus (benchmarks, not corpora), so
  *    Spark's size-based planning broadcasts it and the corpus never
  *    shuffles;
  *  - "stop n-grams" (boilerplate shared by half the corpus) would fan
  *    out quadratically; `maxDocFreq` drops n-grams occurring in more
  *    than that many TRAIN docs, the same posting-list cap production
  *    dedup/decontamination pipelines use. The cap is a count window
  *    over the gram partition — one Exchange of (train_id, gram_hash)
  *    pairs that the overlap join then reuses, and the shingle
  *    projection runs exactly once (no persist, no second pass).
  */
object Decontaminate {

  /** Distinct hashed word n-grams of a text column. Documents shorter
    * than `n` tokens contribute their full token sequence as one gram
    * (same contract as [[TextFunctions.wordShingles]]). */
  def ngramHashes(c: Column, n: Int): Column =
    array_distinct(transform(TextFunctions.wordShingles(c, n), g => xxhash64(g)))

  /** Contaminated (train_id, eval_id) pairs with the overlap fraction:
    * |train ∩ eval n-grams| / |eval n-grams| >= `threshold`.
    *
    * @param n          n-gram size (8 by default — long enough that random
    *                   prose never collides, short enough to catch edits)
    * @param threshold  minimum fraction of the eval doc's n-grams found
    * @param maxDocFreq drop n-grams present in more than this many train
    *                   docs (skew cap; lossy only for boilerplate grams)
    */
  def overlapPairs(train: DataFrame, eval: DataFrame, textCol: String,
                   idCol: String, n: Int = 8, threshold: Double = 0.5,
                   maxDocFreq: Int = 10000): DataFrame = {
    // the doc-frequency cap is a count window over the gram partition —
    // the same single-Exchange shape as TextDedup.crossDocDupGrams: the
    // exploded grams shuffle ONCE on _g, the cap filter reads the window
    // count in place, and the overlap join keys on _g so it reuses that
    // very partitioning (no second Exchange of the corpus side, no
    // persist to leak, no broadcast of a gram blacklist, and the
    // interpreted shingle projection runs exactly once)
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    // spread before the gram explode (CPU-heavy per byte, see Spread)
    val trCapped = Spread.toCores(train).select(col(idCol).as("train_id"),
        explode(ngramHashes(col(textCol), n)).as("_g"))
      .withColumn("_df", count(lit(1)).over(byGram))
      .filter(col("_df") <= maxDocFreq)
      .drop("_df")

    val ev = eval.select(col(idCol).as("eval_id"),
        ngramHashes(col(textCol), n).as("_gs"))
      .select(col("eval_id"), size(col("_gs")).as("_n_eval"),
        explode(col("_gs")).as("_g"))

    trCapped.join(ev, Seq("_g"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("_hits"), first(col("_n_eval")).as("_n_eval"))
      .withColumn("overlap_frac",
        col("_hits").cast(DoubleType) / col("_n_eval").cast(DoubleType))
      .filter(col("overlap_frac") >= threshold)
      .select(col("train_id"), col("eval_id"),
        bround(col("overlap_frac"), 6).as("overlap_frac"))
  }

  /** The decontaminated corpus: train rows minus every doc flagged by
    * [[overlapPairs]] — one anti-join on the train id. No broadcast hint:
    * a heavily contaminated corpus makes the flagged set corpus-sized,
    * and forcing a broadcast there overrides Spark's size-based planning
    * straight into the broadcast limit; AQE picks the right strategy. */
  def clean(train: DataFrame, eval: DataFrame, textCol: String,
            idCol: String, n: Int = 8, threshold: Double = 0.5,
            maxDocFreq: Int = 10000): DataFrame = {
    val flagged = overlapPairs(train, eval, textCol, idCol, n, threshold,
        maxDocFreq)
      .select(col("train_id")).distinct()
    train.join(flagged, train(idCol) === flagged("train_id"), "left_anti")
  }
}
