package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CleanFunctions

/** Fuzzy dictionary repair (SURVEY.md §2.3 J4/J5).
  *
  * The reference repairs near-miss codes with
  * `fuzzywuzzy.process.extractOne(value, valid_list, scorer=WRatio)` and
  * accepts matches scoring >= 85 (cleaning.py:262-270) — a per-value Python
  * loop over the whole dictionary. Spark-first restatement: broadcast the
  * (small) dictionary, join every DISTINCT dirty value against it, score with
  * the codegen'd `levenshtein` built-in, take the best candidate per value
  * with a top-1 window, then map results back onto the fact rows with a
  * second broadcast join. Scoring cost is O(|distinct dirty| x |dict|) — at
  * 100 TB the distinct-values projection keeps the cross product tiny, and
  * no per-row driver work ever happens.
  */
object FuzzyJoin {

  /** Similarity ratio in [0,100] — Levenshtein-based, equivalent to
    * fuzzywuzzy's simple `ratio` on normalized inputs:
    * 100 * (1 - dist / max(len)). */
  def similarityRatio(a: Column, b: Column): Column =
    when(length(a) === 0 && length(b) === 0, lit(100.0)).otherwise(
      lit(100.0) * (lit(1.0) -
        levenshtein(a, b).cast("double") / greatest(length(a), length(b)).cast("double")))

  /** Token-sort variant (WRatio-ish): sort whitespace tokens before scoring,
    * so "alliance star" matches "star alliance". */
  def tokenSortRatio(a: Column, b: Column): Column = {
    def norm(c: Column) =
      array_join(array_sort(split(CleanFunctions.normalizeWhitespace(lower(c)), " ")), " ")
    similarityRatio(norm(a), norm(b))
  }

  /** J4 — fuzzy_fix: replace `valueCol` with the best dictionary entry when
    * its score >= threshold, else keep the original (cleaning.py:262-270,
    * applied :427-428,434).
    *
    * @param dict single-column DataFrame of valid values (a dimension).
    */
  def fuzzyFix(df: DataFrame, valueCol: String, dict: DataFrame,
               dictCol: String, threshold: Double = 85.0,
               out: String = null): DataFrame = {
    val outCol = Option(out).getOrElse(valueCol)
    val dictVals = dict.select(col(dictCol).as("_dict_val")).distinct()
    val distinctVals = df.select(col(valueCol).as("_dirty_val")).distinct()

    // Exact hits skip scoring entirely; only misses pay the cross product.
    val misses = distinctVals.join(broadcast(dictVals),
      distinctVals("_dirty_val") === dictVals("_dict_val"), "left_anti")

    val scored = misses.crossJoin(broadcast(dictVals))
      .withColumn("_score", similarityRatio(upper(col("_dirty_val")), upper(col("_dict_val"))))
    val top1 = Window.partitionBy(col("_dirty_val"))
      .orderBy(col("_score").desc, col("_dict_val"))
    val repaired = scored
      .withColumn("_rn", row_number().over(top1))
      .filter(col("_rn") === 1 && col("_score") >= threshold)
      .select(col("_dirty_val"), col("_dict_val").as("_repaired_val"))

    df.join(broadcast(repaired), df(valueCol) === repaired("_dirty_val"), "left")
      .withColumn(outCol, coalesce(col("_repaired_val"), col(valueCol)))
      .drop("_dirty_val", "_repaired_val")
  }

  /** J5 — prefix repair: take the first-2-alphanumeric prefix, fuzzy-repair
    * it against the airline-key dictionary, splice it back
    * (cleaning.py:273-295). */
  def fixKeyPrefix(df: DataFrame, keyCol: String, dict: DataFrame,
                   dictCol: String, threshold: Double = 85.0): DataFrame = {
    val withPrefix = df.withColumn("_prefix", CleanFunctions.alnumPrefix(col(keyCol)))
      .withColumn("_suffix", substring(regexp_replace(col(keyCol), "[^A-Za-z0-9]", ""), 3, Int.MaxValue))
    fuzzyFix(withPrefix, "_prefix", dict, dictCol, threshold, "_prefix_fixed")
      .withColumn(keyCol, concat(col("_prefix_fixed"), col("_suffix")))
      .drop("_prefix", "_suffix", "_prefix_fixed")
  }
}
