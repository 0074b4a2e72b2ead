package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `array<float>`/`array<double>` embedding columns,
  * expressed with higher-order functions (`zip_with` + `aggregate`) so the
  * whole computation is a single codegen'd projection per row pair — the
  * building block for brute-force and LSH-bucketed similarity search
  * (SURVEY.md north-star ops). Sequential left-to-right accumulation keeps
  * results bit-deterministic across engines.
  */
object VectorFunctions {

  /** Cast any numeric array to array<double>. */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; null when either norm is zero. Routed through
    * the native [[graft.plans.CosineSim]] expression — one fused JVM
    * loop per pair instead of interpreted per-element lambdas — which
    * is IEEE-identical to [[cosineHof]] (same cast, fold order, and
    * final association), proven exactly-equal in GraftFunctionsSpec. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.SketchExpressions.cosineSim(a, b)

  /** The higher-order-function formulation [[cosine]] replaced — kept
    * as the bit-parity reference for the native expression. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a); val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast(DoubleType))
      .otherwise(d / (na * nb))
  }

  /** L2-normalize a vector (null-safe on zero norm). */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    when(n === 0.0, asDouble(a)).otherwise(transform(asDouble(a), x => x / n))
  }

  /** Sign-bit sketch against a fixed hyperplane set: bucket key for
    * LSH-style cosine search. `planes` is a (numPlanes x dim) literal
    * matrix; the bucket is the concatenated sign bits as a string. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val pl = typedLit(p)
      val d = aggregate(zip_with(asDouble(v), pl, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0.0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed) for LSH. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
