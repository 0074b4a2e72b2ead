package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Distributed linear classifier trained by full-batch gradient
  * descent — the margin-based quality gate of a training-data pipeline
  * (the fastText-regression style scorer used to rank documents for
  * pretraining mixes), complementing [[TextClassifier]]'s generative
  * Naive Bayes with a discriminative model over dense quality signals.
  *
  * The whole fit is restated as Spark aggregations with an EXACT,
  * engine-portable arithmetic contract so a SQL oracle can replay
  * training weight-for-weight:
  *
  *  - Features arrive as integer MICRO units (value × 1e6, rounded
  *    half-even at 6 dp — [[microFeature]]), so every per-row product
  *    below is integer and aggregation-order-independent.
  *  - The probability is a HARD sigmoid, p = clamp(0.5 + margin/4, 0, 1),
  *    carried in 1e-12 units: p_p12 = (clamp(margin_p12, ±2e12) + 2e12)
  *    floor-div 4 — pure integer arithmetic, so unlike exp()-based
  *    sigmoid there is NO libm call anywhere in the fit and two engines
  *    can never disagree by an ulp. (The piecewise-linear sigmoid is the
  *    standard quantized-training approximation; at the margins a
  *    quality gate acts on — |margin| ≥ 2 — it is exactly saturated
  *    logistic behavior.)
  *  - The gradient Σ (p − y)·x is summed per-row as a Long product
  *    (|p−y| ≤ 1e12, |x| ≤ ~1e6 ⇒ ≤ ~1e18, inside Long at ANY corpus
  *    size because the bound is per-row) into DECIMAL(38,0) — exact at
  *    100 TB, no silent Long wrap, no float drift.
  *  - The weight update w ← w − floor(lrNumer·g / (lrDenom·n·1e12)) is
  *    FLOOR division, done driver-side in BigInt on the parameter-sized
  *    (d+1)-value gradient collect — the same accepted driver-loop shape
  *    as [[graft.sources.AnnIndex]]'s rebalance policy (T iterations ×
  *    one distributed agg, each collecting d+1 values).
  *
  * Scale shape: the feature frame is computed once and pinned
  * ([[Pin.data]] — eager local checkpoint), so T training iterations
  * cost T scans of a slim (d+2)-column frame, each a partial+final hash
  * aggregation collapsing to ONE row; scoring is a codegen'd projection
  * with the weights inlined as literals (the model broadcasts by being
  * part of the plan, like [[Dsir]]'s LiteralModel). Nothing data-sized
  * ever reaches the driver.
  *
  * Spark-first restatement of the learned quality gate the reference's
  * cleaning layer implies (rule-based quality flags, cleaning.py) — the
  * discriminative twin of [[TextClassifier]].
  */
object LogReg {

  /** Probability/margin resolution: 1e-12 units (p12). */
  val P: Long = 1000000000000L

  /** Hard-sigmoid saturation bound: |margin| ≥ 2.0 pins p to {0, 1}. */
  private val MarginClamp: Long = 2L * P

  /** A feature value as integer micro units: bround-6 (half-even, the
    * q109 display convention — DuckDB `round_even` replays it), then an
    * EXACT decimal shift to 1e6. The two-step cast is deliberate:
    * `bround(x,6) * 1e6` in doubles can sit one ulp under the integer. */
  def microFeature(raw: Column): Column =
    (bround(raw, 6).cast(DecimalType(18, 6)) * 1000000).cast(LongType)

  /** margin_p12 = Σ w_j · x_j for literal weights — integer, codegen'd. */
  private def marginP12(featCols: Seq[String], weights: Array[Long]): Column =
    featCols.zip(weights).map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _)

  /** Hard-sigmoid probability in p12 units from a margin_p12 column.
    * The +2e12 offset makes the numerator non-negative, so truncating
    * division (Spark DIV, DuckDB //, Java >>) IS floor division and
    * every engine agrees; >> 2 is the non-negative floor-div-4. */
  private def probP12(marginP12: Column): Column =
    shiftright(greatest(least(marginP12, lit(MarginClamp)),
      lit(-MarginClamp)) + lit(MarginClamp), 2)

  /** Exact floor division for the driver-side update (BigInt — the
    * gradient exceeds Long range only via the SUM, which arrives as
    * DECIMAL(38,0), never via a per-row product). */
  private def floorDiv(a: BigInt, d: BigInt): BigInt = (a - a.mod(d)) / d

  /** Fit weights (micro units, one per feature column — include an
    * all-1e6 bias column) on `feats`: `iters` full-batch GD steps at
    * learning rate lrNumer/lrDenom, optionally with heavy-ball momentum
    * mNumer/mDenom (0/1 = plain GD; 9/10 converges ~3× faster on the
    * q171 task — fewer driver-loop round-trips is the whole latency
    * cost of an iterative fit, so momentum is a SCHEDULING optimization
    * as much as a numerical one). The velocity update is the same exact
    * floor-division arithmetic as the gradient step, so the momentum
    * path keeps the bit-replayable contract. `labelCol` is boolean.
    * The feature frame is pinned once; each iteration is one exact
    * aggregation and a (d)-value collect. Deterministic under any
    * partitioning. */
  def train(feats: DataFrame, featCols: Seq[String], labelCol: String,
            iters: Int = 8, lrNumer: Long = 1L, lrDenom: Long = 2L,
            mNumer: Long = 0L, mDenom: Long = 1L): Array[Long] = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    require(lrNumer >= 1 && lrDenom >= 1, "learning rate must be positive")
    require(mNumer >= 0 && mDenom >= 1 && mNumer < mDenom,
      s"momentum must be a rational in [0, 1), got $mNumer/$mDenom")
    val f = Pin.data(feats.select(
      featCols.map(col) :+
        when(col(labelCol).cast("boolean"), lit(P)).otherwise(lit(0L)).as("_y_p12"): _*))
    try {
      val n = f.count()
      require(n > 0, "training frame is empty")
      val denom = BigInt(lrDenom) * BigInt(n) * BigInt(P)
      var w = Array.fill(featCols.size)(0L)
      var v = Array.fill(featCols.size)(BigInt(0))
      for (_ <- 1 to iters) {
        val resid = (probP12(marginP12(featCols, w)) - col("_y_p12")).as("_r")
        val sums = f.select(resid +: featCols.map(col): _*)
          .agg(sum((col("_r") * col(featCols.head)).cast(DecimalType(38, 0)))
            .as("g0"),
            featCols.tail.zipWithIndex.map { case (c, i) =>
              sum((col("_r") * col(c)).cast(DecimalType(38, 0))).as(s"g${i + 1}")
            }: _*)
          .collect()(0)
        w = w.indices.map { j =>
          val g = BigInt(sums.getDecimal(j).toBigInteger)
          v(j) = floorDiv(BigInt(mNumer) * v(j), BigInt(mDenom)) +
            floorDiv(BigInt(lrNumer) * g, denom)
          w(j) - v(j).toLong
        }.toArray
      }
      w
    } finally f.unpersist()
  }

  /** Score every row: `margin_p12` (Σ w·x, unclamped), `prob` (the
    * hard-sigmoid probability as a double — an exact ≤ 1e12 integer
    * over 1e12, identical on any IEEE engine), `predicted` = margin > 0.
    * A pure projection with the model inlined as literals. */
  def score(df: DataFrame, featCols: Seq[String], weights: Array[Long]): DataFrame = {
    require(weights.length == featCols.length,
      s"got ${weights.length} weights for ${featCols.length} features")
    df.withColumn("margin_p12", marginP12(featCols, weights))
      .withColumn("prob",
        probP12(col("margin_p12")).cast(DoubleType) / lit(P.toDouble))
      .withColumn("predicted", col("margin_p12") > 0L)
  }
}
