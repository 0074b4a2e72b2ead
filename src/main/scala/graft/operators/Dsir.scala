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
  *  - the count table is Pin.param'd (≤ nBuckets rows) and joined
  *    BROADCAST to the scoring stream — the corpus never shuffles on the
  *    bucket key;
  *  - the totals ride along as a broadcast one-row frame — no
  *    driver-side action;
  *  - per-doc aggregation is the only data-sized Exchange (on the doc
  *    id), exactly one.
  *
  * DEVIATIONS from the paper, explicit:
  *  - [[importanceWeights]] hashes BIGRAM features only (the paper's
  *    released implementation hashes unigrams AND bigrams) and its
  *    `keep` is a hard `avg_logratio > 0` threshold, NOT the paper's
  *    importance resampling — use it as a cheap score/filter stage.
  *  - [[resampleKeep]] is the faithful selection rule: unigram+bigram
  *    features (`unigrams = true`) and Gumbel top-k resampling over the
  *    TOTAL log importance weight (sampling without replacement ∝ w_i;
  *    Kool et al. 2019, arXiv:1903.06059), with the Gumbel noise derived
  *    deterministically from md5(doc_id, seed) so the "sample" is
  *    reproducible across runs, partitionings, and engines.
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
                        isTarget: Column, nBuckets: Int = 4096): DataFrame =
    scoredFrame(docs, textCol, idCol, isTarget, nBuckets, unigrams = false)
      .drop("_lrsum")
      .withColumn("keep", col("avg_logratio") > lit(0.0))

  /** Feature stream of a document: hashed bigrams, plus unigrams when
    * `unigrams` (the paper's feature set). */
  private[graft] def features(text: Column, unigrams: Boolean): Column =
    if (unigrams) concat(graft.functions.TextFunctions.tokens(text),
      NgramLM.bigrams(text))
    else NgramLM.bigrams(text)

  /** Shared scoring pipeline: one row per doc with (idCol, is_target,
    * n_features (as n_bigrams for the bigram-only path's historical
    * name), `_lrsum` (exact DECIMAL(38,12) total log importance weight),
    * avg_logratio). */
  private def scoredFrame(docs: DataFrame, textCol: String, idCol: String,
                          isTarget: Column, nBuckets: Int,
                          unigrams: Boolean): DataFrame = {
    require(nBuckets > 0 && nBuckets <= 65536,
      s"nBuckets must be in (0, 65536] (bucket source is 16 bits), got $nBuckets")
    // one exploded occurrence stream definition, consumed by two passes:
    // the nBuckets-bounded count table and the per-doc scoring
    def occ: DataFrame = Spread.toCores(docs)
      .select(col(idCol), isTarget.as("_tgt"),
        explode(features(col(textCol), unigrams)).as("gram"))
      .select(col(idCol), col("_tgt"),
        bucketOf(col("gram"), nBuckets).as("b"))
    // model pass: ≤ nBuckets rows out, map-side combined. Pinned because
    // both the totals and the broadcast join consume it.
    val counts = Pin.param(occ.groupBy(col("b"))
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
    docs.select(col(idCol), isTarget.as("is_target"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Deterministic standard Gumbel noise from (id, seed): u = (first
    * four md5 hex digits of id‖seed + 0.5) / 65536 ∈ (0, 1), then
    * g = −ln(−ln u), rounded to 12 dp. A pure codegen'd projection any
    * md5+IEEE engine reproduces bit-for-bit. */
  def gumbel(id: Column, seed: String): Column =
    round(-log(-log(
      (Split.bucket65536(concat(id.cast(StringType), lit(seed)))
        .cast(DoubleType) + lit(0.5)) / lit(65536.0))), 12)

  /** Gumbel top-k importance resampling — the paper's actual selection
    * rule: sampling ~`fraction`·N docs without replacement with
    * probability ∝ importance weight w_i is equivalent to keeping the
    * top docs by `ln w_i + g_i` with i.i.d. standard Gumbel noise g_i
    * (Kool et al. 2019). Here `ln w_i` is the document's TOTAL log
    * importance ratio (`_lrsum` — the exact DECIMAL sum, not the mean)
    * and g_i comes from [[gumbel]], so the selection is a pure function
    * of (corpus, seed). The top-`fraction` cut is the exact interpolated
    * (1 − fraction) quantile of the perturbed key ([[Quantiles.exact]]
    * global prefix-scan path — no global sort, no SinglePartition), so
    * the kept fraction is ≈ fraction with quantile-threshold semantics.
    * Docs with zero features (fewer than two tokens when
    * `unigrams = false`) have no weight and are never kept.
    *
    * Output: (idCol, is_target, n_features, log_weight, gumbel, key,
    * cutoff, keep). */
  def resampleKeep(docs: DataFrame, textCol: String, idCol: String,
                   isTarget: Column, nBuckets: Int = 4096,
                   fraction: Double = 0.25, seed: String = "dsir",
                   unigrams: Boolean = true): DataFrame = {
    require(fraction > 0.0 && fraction < 1.0,
      s"fraction must be in (0, 1), got $fraction")
    // Pinned (one row per doc): the quantile cutoff AND the final
    // select both consume this frame, and the exact-quantile path
    // consumes its input twice more internally — without the cut the
    // whole tokenize→explode→model-join→per-doc-agg pipeline ran up to
    // 3× per execution (measured: 3 perDoc passes in the q119 plan).
    // LIFECYCLE: the returned frame references the pin — no explicit
    // unpersist possible here; blocks are ContextCleaner-released when
    // the result becomes unreachable (PinSpec repeated-invocation test).
    val scored = Pin.data(scoredFrame(docs, textCol, idCol, isTarget,
        nBuckets, unigrams)
      .withColumnRenamed("n_bigrams", "n_features")
      .withColumn("_g", gumbel(col(idCol), seed))
      // unrounded key: exact decimal log-weight + round-12 Gumbel —
      // IEEE-reproducible; display columns are rounded, the comparison
      // and the quantile run on the unrounded key (the q78 contract)
      .withColumn("_key", col("_lrsum").cast(DoubleType) + col("_g")))
    val cut = Quantiles.exact(scored, Nil, "_key", Seq(1.0 - fraction),
      Seq("cutoff"))
    scored.crossJoin(broadcast(cut))
      .select(col(idCol), col("is_target"), col("n_features"),
        bround(col("_lrsum").cast(DoubleType), 6).as("log_weight"),
        col("_g").as("gumbel"),
        bround(col("_key"), 6).as("key"),
        bround(col("cutoff"), 6).as("cutoff"),
        coalesce(col("_key") > col("cutoff"), lit(false)).as("keep"))
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

  /** The model collapsed to its per-bucket round-12 log-ratio table —
    * a pure function of the FITTED model, so it embeds as one
    * array<double> literal (or a native expression's constant).
    * Rounding replicates the expression arithmetic exactly — Scala
    * BigDecimal(double) round-12 HALF_UP is what Spark's
    * round(double, 12) computes — and the bit-parity spec (DsirSpec)
    * holds the precomputation to the batch path's bits. */
  private[graft] def lrTable(m: LiteralModel): Array[Double] =
    (0 until m.nBuckets).map { b =>
      val v = math.log((m.ct.getOrElse(b.toLong, 0L) + 1L).toDouble /
                (m.nt + m.nBuckets)) -
              math.log((m.cr.getOrElse(b.toLong, 0L) + 1L).toDouble /
                (m.nr + m.nBuckets))
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toArray

  /** STATELESS scoring expression against a [[LiteralModel]]: the model
    * rides as ONE per-bucket log-ratio table inside a fused native
    * expression ([[graft.plans.DsirScoreNative]]), so the score is one
    * map-only projection — usable unchanged on a STREAMING frame (no
    * join, no stateful aggregation), bit-identical to the batch path
    * AND to the interpreted-HOF formulation it replaced
    * (DsirSpec + DsirNativeParitySpec). Returns a struct
    * (n_bigrams, avg_logratio). */
  def scoreExpr(text: Column, m: LiteralModel): Column =
    graft.plans.DsirExpressions.dsirScore(text, lrTable(m), m.nBuckets)

  /** The pre-fusion higher-order-function formulation, kept as the
    * parity oracle for [[scoreExpr]]: per-occurrence
    * element_at-on-array-literal lookup + DECIMAL(38,12) `aggregate`
    * fold. Semantically identical; ~10-30× slower (interpreted lambda
    * walk + a BigDecimal box per expression step). */
  private[graft] def scoreExprHof(text: Column, m: LiteralModel): Column = {
    val lrLit = typedLit(lrTable(m).toSeq)
    val lr = (g: Column) =>
      element_at(lrLit, (bucketOf(g, m.nBuckets) + lit(1L)).cast("int"))
        .cast(DecimalType(38, 12))
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
