package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words Naive Bayes text classifier — the fastText-style
  * quality/language gate of a training-data pipeline, restated so BOTH
  * training and inference are Spark-shaped aggregations:
  *
  *  - TRAIN: one pass over the corpus tokens → per-(bucket, class)
  *    occurrence counts. The hash-agg state is bounded by `buckets`
  *    (feature hashing: collisions are part of the model, not an error),
  *    so partial aggregation collapses the token stream map-side and the
  *    shuffle carries at most `buckets` rows per partition. Per-bucket
  *    log-odds weights are then QUANTIZED to integer micro-units, so
  *    every downstream sum is exact and aggregation-order-independent
  *    (the kmeans/q104 trick — float sums would pick up engine- and
  *    partition-order-specific rounding).
  *  - INFER: tokens → bucket → broadcast-join the (= `buckets`)-row
  *    weight table → integer sum per doc + prior. One doc-keyed shuffle;
  *    the corpus never joins anything bigger than the model.
  *
  * Tokens hash to buckets via the md5-prefix trick ([[Split]]'s
  * engine-portable convention), so a SQL oracle replays training
  * bit-exactly. The only float ops anywhere are the ln() calls — each
  * quantized at 1e-6 immediately, the same accepted cross-engine
  * convention as the q93/q103 bround rounding.
  *
  * Spark-first restatement of the classifier gate the reference's
  * cleaning layer implies (rule-based quality flags, `cleaning.py`) —
  * the learned twin of [[graft.functions.TextFunctions.qualityScore]].
  */
object TextClassifier {

  /** Lowercased alnum token stream: one row per occurrence. */
  private def tokenStream(df: DataFrame, textCol: String, keep: Column*): DataFrame =
    df.select(keep :+ explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("_tok"): _*)
      .filter(col("_tok") =!= "")

  /** Feature-hash bucket in [0, buckets): first 8 md5 hex digits of the
    * token, mod `buckets` — any engine with md5 replays it digit-for-digit. */
  def bucketOf(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** ln(x) in integer micro-units, half-up. */
  private def qln(x: Column): Column =
    floor(log(x.cast("double")) * 1e6 + 0.5).cast("long")

  /** Train on `labelCol` (boolean): returns the complete model — exactly
    * `buckets` rows of (bucket, weight_micro, prior_micro), where
    * weight_micro is the add-1-smoothed Naive Bayes log-odds of the
    * bucket and prior_micro the class-prior log-odds, both in 1e-6
    * units. Both classes must be non-empty (ln(0) otherwise — caller's
    * contract). The model is parameter-sized: it broadcasts. */
  def train(df: DataFrame, textCol: String, labelCol: String,
            buckets: Int = 512): DataFrame = {
    val tok = tokenStream(df, textCol, col(labelCol).cast("boolean").as("_y"))
      .select(col("_y"), bucketOf(col("_tok"), buckets).as("bucket"))
    // pinned (≤ buckets rows); the class token totals are the exact
    // integer sums of the per-bucket counts, so they fold over the
    // pinned table instead of re-running the tokenize pass
    val counts = Pin.param(tok.groupBy(col("bucket")).agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("_cpos"),
      sum(when(col("_y"), 0L).otherwise(1L)).as("_cneg")))
    val tokTotals = counts.groupBy().agg(
      sum(col("_cpos")).as("_tpos"),
      sum(col("_cneg")).as("_tneg"))
    val docTotals = df.groupBy().agg(
      sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("_npos"),
      sum(when(col(labelCol).cast("boolean"), 0L).otherwise(1L)).as("_nneg"))
    // the returned model is parameter-sized and every scorer consumes
    // it at least twice (prior + weights join) — pin it so scoring
    // never re-runs the training passes
    Pin.param(df.sparkSession.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("_cpos", "_cneg"))
      .crossJoin(broadcast(tokTotals))
      .crossJoin(broadcast(docTotals))
      .select(col("bucket"),
        (qln(col("_cpos") + 1) - qln(col("_tpos") + buckets)
          - qln(col("_cneg") + 1) + qln(col("_tneg") + buckets)).as("weight_micro"),
        (qln(col("_npos")) - qln(col("_nneg"))).as("prior_micro")))
  }

  /** Score every row of `df`: integer log-odds sum over its tokens'
    * bucket weights plus the prior; `predicted` = score > 0. Docs with
    * no alnum tokens score the prior alone. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int = 512): DataFrame = {
    val prior = model.agg(max(col("prior_micro")).as("_prior"))
    val tok = tokenStream(df, textCol, col(idCol))
      .select(col(idCol), bucketOf(col("_tok"), buckets).as("bucket"))
    val contrib = tok
      .join(broadcast(model.select(col("bucket"), col("weight_micro"))), Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("weight_micro")).as("_tok_sum"))
    df.select(col(idCol))
      .join(contrib, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .select(col(idCol),
        (coalesce(col("_tok_sum"), lit(0L)) + col("_prior")).as("score_micro"))
      .withColumn("predicted", col("score_micro") > 0L)
  }
}
