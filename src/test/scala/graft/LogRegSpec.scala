package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** LogReg: the exact-integer GD contract (partitioning-independent
  * weights), the hard-sigmoid arithmetic, and boundary recovery on a
  * planted linearly-separable task. The cross-engine replay of the full
  * fit is gated by q171's DuckDB oracle; these specs pin the Spark-side
  * invariants the oracle can't see (determinism under re-partitioning,
  * the planted-boundary learnability bar). */
class LogRegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted boundary: y = (2·f1 − f2 > 0.3), features on a grid. */
  private def planted = {
    val rows = for (a <- 0 until 20; b <- 0 until 20) yield {
      val f1 = a / 20.0; val f2 = b / 20.0
      (a * 20 + b, f1, f2, 2.0 * f1 - f2 > 0.3)
    }
    rows.toDF("id", "f1", "f2", "y")
      .select(col("id"), col("y"),
        lit(1000000L).as("x0"),
        LogReg.microFeature(col("f1")).as("x1"),
        LogReg.microFeature(col("f2")).as("x2"))
  }

  test("train recovers a planted linear boundary (accuracy >= 0.95)") {
    val df = planted
    val w = LogReg.train(df, Seq("x0", "x1", "x2"), "y",
      iters = 48, lrNumer = 4, lrDenom = 1)
    val scored = LogReg.score(df, Seq("x0", "x1", "x2"), w)
    val acc = scored.filter(col("predicted") === col("y")).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"planted-boundary accuracy $acc, weights ${w.toSeq}")
  }

  test("weights are bit-identical under re-partitioning (exact-sum contract)") {
    val df = planted
    val w1 = LogReg.train(df.repartition(1), Seq("x0", "x1", "x2"), "y",
      iters = 8, lrNumer = 4, lrDenom = 1)
    val w7 = LogReg.train(df.repartition(7, col("x2")), Seq("x0", "x1", "x2"),
      "y", iters = 8, lrNumer = 4, lrDenom = 1)
    assert(w1.toSeq == w7.toSeq)
    // momentum path: velocity floor-divisions are partitioning-blind too
    val m1 = LogReg.train(df.repartition(1), Seq("x0", "x1", "x2"), "y",
      iters = 8, lrNumer = 1, lrDenom = 2, mNumer = 9, mDenom = 10)
    val m7 = LogReg.train(df.repartition(7, col("x1")), Seq("x0", "x1", "x2"),
      "y", iters = 8, lrNumer = 1, lrDenom = 2, mNumer = 9, mDenom = 10)
    assert(m1.toSeq == m7.toSeq)
    assert(m1.toSeq != w1.toSeq) // and it is genuinely a different path
  }

  test("momentum reaches the planted-boundary bar in a third of the iterations") {
    val df = planted
    val w = LogReg.train(df, Seq("x0", "x1", "x2"), "y",
      iters = 16, lrNumer = 1, lrDenom = 2, mNumer = 9, mDenom = 10)
    val scored = LogReg.score(df, Seq("x0", "x1", "x2"), w)
    val acc = scored.filter(col("predicted") === col("y")).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"momentum planted-boundary accuracy $acc")
  }

  test("hard sigmoid: saturation, midpoint, and floor-division identities") {
    // margins engineered via a single weight on a single feature
    val df = Seq(
      (1L, 3000000L),   // margin 3.0 -> saturate p=1
      (2L, -3000000L),  // margin -3.0 -> saturate p=0
      (3L, 0L),         // margin 0 -> p=0.5
      (4L, 1000000L),   // margin 1.0 -> p=0.75
      (5L, -1000000L),  // margin -1.0 -> p=0.25
      (6L, 3L)          // margin 3e-6: p12 = (3e6+2e12) DIV 4 = 5e11 + 750000ulp/1000... floor
    ).toDF("id", "x")
    val scored = LogReg.score(df, Seq("x"), Array(1000000L))
      .select(col("id"), col("prob")).as[(Long, Double)].collect().toMap
    assert(scored(1L) == 1.0)
    assert(scored(2L) == 0.0)
    assert(scored(3L) == 0.5)
    assert(scored(4L) == 0.75)
    assert(scored(5L) == 0.25)
    // margin_p12 = 3e6; p_p12 = (3e6 + 2e12) / 4 = 500000750000 exactly
    assert(scored(6L) == 500000750000L.toDouble / 1e12)
  }

  test("score inlines weights as literals: predicted flips at margin 0") {
    val df = Seq((1L, 500000L), (2L, -500000L), (3L, 0L)).toDF("id", "x")
    val got = LogReg.score(df, Seq("x"), Array(1000000L))
      .select(col("id"), col("margin_p12"), col("predicted"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, m, p) => id -> ((m, p)) }.toMap
    assert(got(1L) == ((500000000000L, true)))
    assert(got(2L) == ((-500000000000L, false)))
    assert(got(3L) == ((0L, false))) // strict >: zero margin is negative class
  }

  test("held-out accuracy on the real corpus beats majority (q171 config)") {
    // the q171 wiring end-to-end at sf0.001: train on doc_id % 10 != 0,
    // judge ONLY the held-out tenth — the split the oracle can't see
    // (it hashes all rows; this pins generalization, not memorization)
    import graft.functions.{TextFunctions => TF}
    import org.apache.spark.sql.types.DoubleType
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = graft.operators.Spread.toCores(docs)
      .select(col("doc_id"), (col("n_chars") >= 300L).as("_y"),
        lit(1000000L).as("_x0"),
        LogReg.microFeature(least(
          TF.tokenCount(col("text")).cast(DoubleType) / lit(200.0),
          lit(1.0))).as("_x1"),
        LogReg.microFeature(least(
          TF.meanTokenLen(col("text")) / lit(10.0), lit(1.0))).as("_x2"),
        LogReg.microFeature(least(
          TF.stopwordHits(col("text")).cast(DoubleType) * lit(5.0)
            / greatest(TF.tokenCount(col("text")), lit(1L)).cast(DoubleType),
          lit(1.0))).as("_x3"),
        LogReg.microFeature(TF.dupNgramFraction(col("text"), 2)).as("_x4"))
    val fc = Seq("_x0", "_x1", "_x2", "_x3", "_x4")
    val w = LogReg.train(feats.filter(col("doc_id") % 10 =!= 0), fc, "_y",
      iters = 10, lrNumer = 1, lrDenom = 1, mNumer = 9, mDenom = 10)
    val held = LogReg.score(feats.filter(col("doc_id") % 10 === 0), fc, w)
    val n = held.count().toDouble
    val acc = held.filter(col("predicted") === col("_y")).count() / n
    val majority = math.max(
      held.filter(col("_y")).count() / n,
      held.filter(!col("_y")).count() / n)
    assert(acc >= 0.9 && acc > majority,
      s"held-out acc $acc vs majority $majority")
  }

  test("empty training frame and mismatched weights fail loudly") {
    val df = planted
    intercept[IllegalArgumentException] {
      LogReg.train(df.filter(col("id") < 0), Seq("x0"), "y")
    }
    intercept[IllegalArgumentException] {
      LogReg.score(df, Seq("x0", "x1"), Array(1L))
    }
  }

  test("hardNegatives returns only wrong-label neighbors, ranked by cosine") {
    // two tight clusters on axes; labels split WITHIN each cluster so
    // every vector's nearest neighbors contain both labels
    val vecs = (0 until 12).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.0, 0.0, 0.0) else Array(0.0, 1.0, 0.0, 0.0)
      val v = base.clone(); v(2) = (i / 2) * 0.01 // slight spread
      (i.toLong, v.toSeq, i % 4 / 2) // labels 0/1 alternate per pair
    }.toDF("id", "vec", "label")
    val centroids = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val hn = Similarity.hardNegatives(vecs, "id", "vec", "label", centroids,
      k = 6, nprobe = 1, perQuery = 2)
    val rows = hn.select("query_id", "neighbor_id", "query_label",
      "neighbor_label", "hn_rank").as[(Long, Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, ql, nl, _) => assert(ql != nl) }
    // at most perQuery per query, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 2)
      assert(rs.map(_._5).sorted.toSeq == (1 to rs.length))
    }
  }
}
