package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hllDistinct estimates grouped cardinality within HLL error bounds") {
    // m=256 registers → standard error 1.04/sqrt(256) = 6.5 %; assert 3σ
    val df = (1 to 5000).map(i => (s"g${i % 2}", i)).toDF("g", "v")
    val got = Sketches.hllDistinct(df, col("v"), Seq("g"))
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("g0", "g1"))
    got.values.foreach { est => assert(math.abs(est - 2500.0) / 2500.0 < 0.2) }
  }

  test("hllDistinct ignores NULL values like COUNT DISTINCT") {
    val df = Seq(Some(1), Some(2), None, Some(2)).toDF("v")
      .withColumn("g", lit("x"))
    val est = Sketches.hllDistinct(df, col("v"), Seq("g"))
      .select("approx_distinct").as[Double].head()
    // 2 distinct values, small range → linear counting is near-exact
    assert(est > 1.0 && est < 4.0)
  }

  test("hll register tables merge across shards to the same estimate") {
    val all = (1 to 2000).map(i => ("g", i)).toDF("g", "v")
    val shard1 = (1 to 1200).map(i => ("g", i)).toDF("g", "v")   // overlap
    val shard2 = (1000 to 2000).map(i => ("g", i)).toDF("g", "v")
    val direct = Sketches.hllDistinct(all, col("v"), Seq("g"))
      .select("approx_distinct").as[Double].head()
    val merged = Sketches.hllEstimate(
      Sketches.hllRegisters(shard1, col("v"), Seq("g"))
        .unionByName(Sketches.hllRegisters(shard2, col("v"), Seq("g")))
        .groupBy("g", "_hll_reg").agg(max("_hll_rho").as("_hll_rho")),
      Seq("g")).select("approx_distinct").as[Double].head()
    assert(direct == merged) // bit-identical, not just close
  }

  test("cms estimates are one-sided and rank a skewed heavy hitter first") {
    // zipf-ish: "hot" appears 2000x, "warm" 200x, the tail 1-2x each
    val rows = Seq.fill(2000)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 500).flatMap(i => Seq.fill(i % 2 + 1)(s"tail$i"))
    val df = rows.toDF("term")
    val regs = Sketches.cmsRegisters(df, col("term"), Nil)
    // register table is bounded by construction, never by data size
    assert(regs.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val exact = df.groupBy("term").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(regs, exact, "term", Nil)
      .as[(String, Long, Long)].collect()
    // one-sided bound: NEVER undercounts
    est.foreach { case (t, ex, e) => assert(e >= ex, s"$t undercounted: $e < $ex") }
    // collisions can inflate the tail, but the 2000x hitter stays on top
    assert(est.maxBy(_._3)._1 == "hot")
    // absent probe: estimate is its collision floor, still >= 0 (and tiny
    // here: expected ~N/width ~ 3 per depth row)
    val absent = Sketches.cmsEstimate(regs, Seq("never-seen").toDF("term"),
      "term", Nil).as[(String, Long)].collect()(0)
    assert(absent._2 >= 0 && absent._2 < 100)
  }

  test("cms register tables merge by addition across shards") {
    val all = (1 to 3000).map(i => s"t${i % 37}").toDF("term")
    val shards = Seq(
      (1 to 1000), (1001 to 2000), (2001 to 3000)
    ).map(r => r.map(i => s"t${i % 37}").toDF("term"))
    val direct = Sketches.cmsRegisters(all, col("term"), Nil)
      .as[(Int, Long, Long)].collect().toSet
    val merged = shards.map(Sketches.cmsRegisters(_, col("term"), Nil))
      .reduce(_ unionByName _)
      .groupBy("_cms_d", "_cms_b").agg(sum(col("_cms_n")).as("_cms_n"))
      .as[(Int, Long, Long)].collect().toSet
    assert(direct == merged)
  }

  test("histogramQuantiles: shard-merged bins estimate like direct, within a bin") {
    val all = (1 to 10000).map(i => i.toDouble).toDF("v")
    val shards = Seq((1 to 4000), (4001 to 9000), (9001 to 10000))
      .map(r => r.map(_.toDouble).toDF("v"))
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    def bins(df: org.apache.spark.sql.DataFrame) =
      Profile.histogram(df, col("v"), 0.0, 10000.0, 50).select("bin", "n")
    val direct = Profile.histogramQuantiles(bins(all), 0.0, 10000.0, 50, qs)
      .as[(Double, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    // register-table merge: union shard bins, re-sum — must be identical
    val merged = Profile.histogramQuantiles(
      shards.map(bins).reduce(_ unionByName _)
        .groupBy("bin").agg(sum("n").as("n")),
      0.0, 10000.0, 50, qs)
      .as[(Double, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(direct == merged)
    // accuracy: within one bin width (200) of the exact quantile
    qs.foreach { q =>
      val exact = q * 10000.0
      assert(math.abs(direct(q) - exact) <= 200.0,
        s"q=$q est=${direct(q)} exact=$exact")
    }
    // out-of-range quantile rejected
    intercept[IllegalArgumentException] {
      Profile.histogramQuantiles(bins(all), 0.0, 10000.0, 50, Seq(1.5))
    }
  }

  test("stratifiedSample keeps per-stratum fractions and is deterministic") {
    val df = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "big" else "rare"))
      .toDF("id", "cls")
    val out = Split.stratifiedSample(df, col("cls"),
      Map("big" -> 0.1, "rare" -> 1.0), col("id"))
    val counts = out.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(counts("rare") == 2000L)                  // fraction 1.0 keeps all
    assert(math.abs(counts("big") - 200L) < 60)      // ~10 % of 2000
    // absent stratum is dropped, and a re-run keeps the identical rows
    val out2 = Split.stratifiedSample(df, col("cls"),
      Map("big" -> 0.1), col("id"))
    assert(out2.filter(col("cls") === "rare").count() == 0)
    assert(out2.exceptAll(out.filter(col("cls") === "big")).count() == 0)
  }

  test("invertedIndex: exact df/tf, capped ordered postings, truncation flag") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple banana banana")).toDF("doc_id", "text")
    val idx = Tfidf.invertedIndex(docs, "text", "doc_id", maxPostings = 2)
      .as[(String, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(idx("apple") == ("apple", 2L, 3L, "1:2 3:1", false))
    assert(idx("cherry") == ("cherry", 1L, 1L, "2:1", false))
    // banana appears in 3 docs: preview capped at 2, counts stay exact
    assert(idx("banana") == ("banana", 3L, 4L, "1:1 2:1", true))
  }

  test("bm25TopK matches an exact Okapi replica, excludes no-hit docs, breaks ties by id") {
    val docs = Seq(
      (1L, "spark join spark filter"),
      (2L, "join join join join"),
      (3L, "spark table"),
      (4L, "other words only here"),
      (5L, "spark join")).toDF("doc_id", "text")
    val got = Tfidf.bm25TopK(docs, "text", "doc_id",
        Seq("spark", "join"), k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // exact replica of the operator's contract: idf = ln((N-df+.5)/(df+.5)+1),
    // per-term contribution round-12 HALF_UP, exact decimal sum, bround-6 out
    val corpus = Map(1L -> Seq("spark", "join", "spark", "filter"),
      2L -> Seq("join", "join", "join", "join"), 3L -> Seq("spark", "table"),
      4L -> Seq("other", "words", "only", "here"), 5L -> Seq("spark", "join"))
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val q = Seq("spark", "join")
    val df = q.map(t => t -> corpus.values.count(_.contains(t))).toMap
    val expected = corpus.toSeq.flatMap { case (id, tk) =>
      val hits = q.map(t => t -> tk.count(_ == t)).filter(_._2 > 0)
      if (hits.isEmpty) None
      else {
        val s = hits.map { case (t, tf) =>
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          val c = idf * tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * tk.size / avgdl))
          BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some((id, s, hits.size.toLong))
      }
    }.sortBy { case (id, s, _) => (-s, id) }
      .map { case (id, s, h) =>
        (id, BigDecimal(s.toDouble).setScale(6,
          BigDecimal.RoundingMode.HALF_EVEN).toDouble, h) }
    assert(got == expected, s"got $got, expected $expected")
    assert(!got.exists(_._1 == 4L), "a doc with no query terms must not score")
  }

  test("vocabCoverage: frequency-ordered cumulative shares reach 1.0") {
    val docs = Seq((1L, "a a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    // freqs: a=5, b=3, c=1, d=1 of 10; ties (c, d) break by term asc
    val got = Tfidf.vocabCoverage(docs, "text")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "a" -> (5L, 0.5), "b" -> (3L, 0.8), "c" -> (1L, 0.9), "d" -> (1L, 1.0)))
  }

  test("histogram clamps out-of-range values and shares sum to 1") {
    val df = Seq(-5.0, 0.0, 1.0, 9.9, 10.0, 15.0, 25.0).map(Tuple1(_)).toDF("v")
    val h = Profile.histogram(df, col("v"), lo = 0.0, hi = 20.0, bins = 2)
      .as[(Int, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // bin 0 = [0,10): {-5 clamped, 0, 1, 9.9}; bin 1 = [10,20): {10, 15, 25 clamped}
    assert(h(0) == (0, 0.0, 10.0, 4L, 0.571429))
    assert(h(1) == (1, 10.0, 20.0, 3L, 0.428571))
  }

  test("dedupKeepBest keeps the highest-scoring doc per component") {
    val docs = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.7), (5L, 0.7))
      .toDF("doc_id", "score")
    // component {1,2,3} -> winner 2 (score 0.9); {4,5} -> tie, min id 4
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Components.dedupKeepBest(docs, "doc_id", "score",
        edges, "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }
}
