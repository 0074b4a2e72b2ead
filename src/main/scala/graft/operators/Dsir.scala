package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every document by the log-likelihood ratio of
  * its hashed bigram features under a TARGET bag-of-ngrams model vs the
  * RAW (non-target) model. Documents whose hashed-feature distribution
  * looks more like the target corpus than the raw pool get positive
  * scores — the standard "select web data that resembles the curated
  * set" stage of a pretraining pipeline. (Superset of the reference's
  * text-normalization surface, `cleaning.py:339-345` — same tokenization
  * contract as [[NgramLM]].)
  *
  * Model: both corpora are reduced to `nBuckets` hashed-bigram counts
  * (feature hashing — the trick that makes DSIR O(buckets), not
  * O(vocabulary²)). With add-1 smoothing,
  * `p_T(b) = (c_T(b)+1)/(N_T+nBuckets)` and likewise `p_R`; a document's
  * score is the mean over its bigram occurrences of
  * `ln p_T(bucket) − ln p_R(bucket)`.
  *
  * Determinism & portability: the bucket is the first four md5 hex
  * digits of the gram mod `nBuckets` (the [[Split.bucket65536]] recipe),
  * each per-occurrence log-ratio is rounded to 12 dp and summed as
  * DECIMAL(38,12) (the [[NgramLM]] exact-sum contract), so any engine
  * with md5 + IEEE doubles reproduces the scores hash-for-hash — the
  * q109 DuckDB oracle replays the whole pipeline.
  *
  * Shape at scale:
  *  - the model pass is one explode + a hash aggregation with map-side
  *    partial combine whose world is `nBuckets` rows — parameter-sized
  *    state, like the CMS/HLL sketches in [[Sketches]];
  *  - the count table is Pin.materialize'd (≤ nBuckets rows) and joined
  *    BROADCAST to the scoring stream — the corpus never shuffles on the
  *    bucket key;
  *  - the totals ride along as a broadcast one-row frame — no
  *    driver-side action;
  *  - per-doc aggregation is the only data-sized Exchange (on the doc
  *    id), exactly one.
  */
object Dsir {

  /** Hashed-feature bucket in [0, nBuckets): first four md5 hex digits
    * of the gram, mod nBuckets. Pure codegen'd projection. */
  def bucketOf(gram: Column, nBuckets: Int): Column =
    conv(substring(md5(gram), 1, 4), 16, 10).cast(LongType) % nBuckets

  /** Score `docs(textCol)` against the target/raw split given by
    * `isTarget` (a boolean column over `docs`). Output one row per doc:
    * (idCol, is_target, n_bigrams, avg_logratio, keep) where
    * `avg_logratio` is NULL for docs with fewer than two tokens (the
    * "too short to score" case stays distinguishable) and
    * `keep = avg_logratio > 0` — more target-like than raw-like. */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in (0, 65536] (bucket source is 16 bits), got $nBuckets")
    // one exploded occurrence stream definition, consumed by two passes:
    // the nBuckets-bounded count table and the per-doc scoring
    def occ: DataFrame = Spread.toCores(docs)
      .select(col(idCol), isTarget.as("_tgt"),
        explode(NgramLM.bigrams(col(textCol))).as("gram"))
      .select(col(idCol), col("_tgt"),
        bucketOf(col("gram"), nBuckets).as("b"))
    // model pass: ≤ nBuckets rows out, map-side combined. Pinned because
    // both the totals and the broadcast join consume it.
    val counts = Pin.materialize(occ.groupBy(col("b"))
      .agg(sum(when(col("_tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("_tgt"), 0L).otherwise(1L)).as("cr")))
    val totals = counts.agg(
      sum(col("ct")).cast(LongType).as("nt"),
      sum(col("cr")).cast(LongType).as("nr"))
    // scoring pass: broadcast the parameter-sized model, aggregate per doc
    val logratio = round(
      log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast(DoubleType) /
          (col("nt") + lit(nBuckets.toLong)).cast(DoubleType)) -
      log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast(DoubleType) /
          (col("nr") + lit(nBuckets.toLong)).cast(DoubleType)), 12)
    val perDoc = occ
      .join(broadcast(counts), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(logratio.cast(DecimalType(38, 12))).as("_lrsum"))
      .withColumn("avg_logratio",
        bround(col("_lrsum").cast(DoubleType) / col("n_bigrams"), 6))
      .drop("_lrsum")
    docs.select(col(idCol), isTarget.as("is_target"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("keep", col("avg_logratio") > lit(0.0))
  }

  /** The fitted model collapsed to literals — `nBuckets` counts each
    * side plus the two totals. Parameter-sized by construction, so it
    * embeds in an expression tree and ships inside the plan (no join at
    * scoring time at all). */
  final case class LiteralModel(ct: Map[Long, Long], cr: Map[Long, Long],
                                nt: Long, nr: Long, nBuckets: Int)

  /** Fit the hashed-bigram model and collect it (≤ nBuckets rows — a
    * parameter-sized collect, the k-means pattern). */
  def fitLiteralModel(docs: DataFrame, textCol: String, isTarget: Column,
                      nBuckets: Int = 4096): LiteralModel = {
    val rows = Spread.toCores(docs)
      .select(isTarget.as("_tgt"),
        explode(NgramLM.bigrams(col(textCol))).as("gram"))
      .select(col("_tgt"), bucketOf(col("gram"), nBuckets).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("_tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("_tgt"), 0L).otherwise(1L)).as("cr"))
      .collect()
    val ct = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cr = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    LiteralModel(ct, cr, ct.values.sum, cr.values.sum, nBuckets)
  }

  /** STATELESS scoring expression against a [[LiteralModel]]: the model
    * rides as two literal maps, so the score is one map-only projection
    * — usable unchanged on a STREAMING frame (no join, no stateful
    * aggregation; the per-doc sum runs inside the `aggregate` HOF with
    * the same round-12/DECIMAL(38,12) contract as the batch path, so
    * batch and stream scores are bit-identical — spec-asserted).
    * Returns a struct (n_bigrams, avg_logratio). */
  def scoreExpr(text: Column, m: LiteralModel): Column = {
    val ctLit = typedLit(m.ct)
    val crLit = typedLit(m.cr)
    val lr = (g: Column) => {
      val b = bucketOf(g, m.nBuckets)
      round(
        log((coalesce(element_at(ctLit, b), lit(0L)) + lit(1L)).cast(DoubleType) /
            lit((m.nt + m.nBuckets).toDouble)) -
        log((coalesce(element_at(crLit, b), lit(0L)) + lit(1L)).cast(DoubleType) /
            lit((m.nr + m.nBuckets).toDouble)), 12)
        .cast(DecimalType(38, 12))
    }
    val bg = NgramLM.bigrams(text)
    // decimal + decimal widens to (38,11); cast back so the lambda
    // returns the accumulator type exactly (values are round-12, so the
    // cast is lossless)
    val lrsum = aggregate(bg, lit(0).cast(DecimalType(38, 12)),
      (acc, g) => (acc + lr(g)).cast(DecimalType(38, 12)))
    struct(
      size(bg).cast(LongType).as("n_bigrams"),
      when(size(bg) > 0,
        bround(lrsum.cast(DoubleType) / size(bg), 6)).as("avg_logratio"))
  }
}
