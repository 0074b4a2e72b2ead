package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Count-based bigram language model for corpus quality filtering — the
  * CCNet-style "perplexity filter" stage of a training-data pipeline
  * (Wenzek et al. 2020 score documents with a KenLM n-gram model and drop
  * the worst tail; here the model is trained on the corpus itself, or any
  * reference corpus, as plain Spark aggregations).
  *
  * Model: Laplace-smoothed conditional bigram probabilities
  * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)` where `c` counts occurrences
  * in the training corpus's bigram stream and `V` is the unigram
  * vocabulary size. A document's score is its mean token log-probability
  * (nats); low scores = far from the reference distribution = the docs a
  * perplexity filter drops.
  *
  * Shape at scale:
  *  - training is one explode + two hash aggregations (gram counts and
  *    first-word context counts), both with map-side partial combine;
  *    model size is vocabulary-squared-bounded but Zipf-small in practice;
  *  - V rides along as a broadcast one-row frame — no driver-side action;
  *  - scoring explodes the scored corpus once and joins the two count
  *    frames size-adaptively (broadcast when the model fits, shuffle
  *    join otherwise — no hint);
  *  - per-doc aggregation sums DECIMAL(38,12)-cast log-probs, so the sum
  *    is exact and independent of partition order — the property that
  *    lets an external engine reproduce the score hash-for-hash.
  */
object NgramLM {

  /** Trained model: `grams` = (gram, c12), `contexts` = (w1, c1),
    * `vocab` = single-row (v = distinct-token count). All lazy frames —
    * persist or write them out when scoring many corpora. */
  final case class BigramLM(grams: DataFrame, contexts: DataFrame,
                            vocab: DataFrame)

  /** Consecutive (non-distinct) bigram stream of a document; empty for
    * docs with fewer than two tokens — unlike
    * [[TextFunctions.wordShingles]], which is distinct and emits a
    * degenerate shingle for short docs. */
  def bigrams(c: Column): Column = {
    val t = TextFunctions.tokens(c)
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Train on `docs(textCol)`: two aggregations over one exploded bigram
    * stream plus a distinct-token count for the vocabulary size. */
  def train(docs: DataFrame, textCol: String): BigramLM = {
    val bg = docs.select(explode(bigrams(col(textCol))).as("gram"))
    val grams = bg.groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    val contexts = bg
      .select(substring_index(col("gram"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    BigramLM(grams, contexts, vocab)
  }

  /** Score every document: (idCol, n_bigrams, avg_logprob) where
    * avg_logprob = mean over the doc's bigram occurrences of
    * `ln((c12+1)/(c1+V))`, rounded to 6 dp; NULL (not 0) for docs with no
    * bigrams, which keeps "too short to score" distinguishable from
    * "scored terribly". Unseen grams/contexts (cross-corpus scoring)
    * fall back to c=0 counts under the same smoothing.
    *
    * Each log-prob is rounded to 12 dp and summed as DECIMAL(38,12), so
    * the aggregate is exact and partition-order-independent. */
  def score(docs: DataFrame, textCol: String, idCol: String,
            lm: BigramLM): DataFrame = {
    val occ = docs.select(col(idCol), explode(bigrams(col(textCol))).as("gram"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
    val logp = log(
      (coalesce(col("c12"), lit(0L)) + lit(1L)).cast(DoubleType) /
        (coalesce(col("c1"), lit(0L)) + col("v")))
    val scored = occ
      .join(lm.grams, Seq("gram"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(logp, 12).cast(DecimalType(38, 12))).as("_lpsum"))
      .withColumn("avg_logprob",
        bround(col("_lpsum").cast(DoubleType) / col("n_bigrams"), 6))
      .drop("_lpsum")
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** The filter stage: score everything, compute the exact corpus
    * `tailFraction` quantile of the score (interpolated, NULL-scored docs
    * excluded — [[Quantiles.exact]]), and flag each doc with
    * `keep = avg_logprob > cutoff` (NULL for unscorable docs, so the
    * caller decides their fate explicitly). Output:
    * (idCol, n_bigrams, avg_logprob, cutoff, keep). */
  def perplexityFilter(docs: DataFrame, textCol: String, idCol: String,
                       lm: BigramLM, tailFraction: Double = 0.1): DataFrame = {
    val scored = score(docs, textCol, idCol, lm)
    val cut = Quantiles.exact(scored, Nil, "avg_logprob",
      Seq(tailFraction), Seq("cutoff"))
    scored.crossJoin(broadcast(cut))
      .select(col(idCol), col("n_bigrams"), col("avg_logprob"),
        bround(col("cutoff"), 6).as("cutoff"),
        (col("avg_logprob") > col("cutoff")).as("keep"))
  }
}
