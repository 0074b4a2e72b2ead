package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** kNN graph, product quantization, and the hashed NB classifier —
  * the round-7 ANN/classifier additions. */
class AnnPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  /** Deterministic corpus: `n` unit-ish vectors in `dim` dims spread
    * over a few well-separated directions plus noise. */
  private def corpus(n: Int) = {
    val rng = new scala.util.Random(7)
    (0L until n.toLong).map { i =>
      val base = Array.tabulate(dim)(j =>
        if (j == (i % 4).toInt * 2) 10.0f else 0.0f)
      val v = base.map(x => x + rng.nextGaussian().toFloat * 0.2f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def normalizedRows(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.filter(col("vec_id") < k).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.normalize(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)

  // ------------------------------------------------------------ knnGraph

  test("knnGraph with nprobe = nlist equals brute force for every row") {
    val e = corpus(60).cache()
    val cb = normalizedRows(e, 8)
    val got = Similarity.knnGraph(e, "vec_id", "embedding", cb,
      k = 3, nprobe = cb.length)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("knnGraph emits every (query, neighbor) pair at most once and k rows per query") {
    val e = corpus(80)
    val cb = normalizedRows(e, 8)
    val g = Similarity.knnGraph(e, "vec_id", "embedding", cb, k = 3, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(g.length == g.toSet.size, "duplicate candidate pair survived")
    val perQuery = g.groupBy(_._1).values.map(_.length)
    assert(perQuery.forall(_ <= 3))
    assert(g.map(_._1).distinct.length == 80, "some query lost all neighbors")
  }

  test("knnGraph recall vs brute force is high at nprobe < nlist") {
    val e = corpus(100).cache()
    val cb = normalizedRows(e, 8)
    val got = Similarity.knnGraph(e, "vec_id", "embedding", cb, k = 2, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & want).size.toDouble / want.size
    assert(recall >= 0.9, s"recall $recall")
  }

  // ------------------------------------------------------------ Pq

  test("Pq.codebooks slices samples into per-subspace codewords") {
    val samples = Array(
      Array(1.0, 2.0, 3.0, 4.0),
      Array(5.0, 6.0, 7.0, 8.0))
    val cbs = Pq.codebooks(samples, m = 2)
    assert(cbs.length == 2)
    assert(cbs(0)(0).toSeq == Seq(1.0, 2.0) && cbs(0)(1).toSeq == Seq(5.0, 6.0))
    assert(cbs(1)(0).toSeq == Seq(3.0, 4.0) && cbs(1)(1).toSeq == Seq(7.0, 8.0))
    intercept[IllegalArgumentException](Pq.codebooks(samples, m = 3))
  }

  test("Pq.encode maps a vector equal to sample c onto code c in every subspace") {
    val e = corpus(20).cache()
    val samples = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    val codes = Pq.encode(e, "vec_id", "embedding", cbs)
      .filter(col("neighbor_id") < 4)
      .select("neighbor_id", "codes").as[(Long, Seq[Int])]
      .collect().toMap
    (0 until 4).foreach { c =>
      assert(codes(c.toLong) == Seq(c + 1, c + 1),
        s"sample $c should encode to its own codeword")
    }
  }

  test("Pq ADC distance is zero for a vector identical to its codeword concat") {
    val e = corpus(20)
    val samples = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    val codes = Pq.encode(e, "vec_id", "embedding", cbs)
    // query vector 2 against the index: its own code row is filtered out,
    // but querying 2 and looking at sample row 2 is the self pair — use a
    // twin id instead: re-tag the query id so the self-filter keeps it
    val q = e.filter(col("vec_id") === 2)
      .withColumn("vec_id", lit(999L))
    val top = Pq.adcTopK(q, codes, "vec_id", "embedding", cbs, k = 1)
      .select("neighbor_id", "adist").as[(Long, Double)].head()
    assert(top._1 == 2L && top._2 == 0.0,
      s"nearest should be the identical codeword row at distance 0, got $top")
  }

  test("Pq reconstruction error: zero for sample vectors, matches the min-distance identity") {
    val e = corpus(20)
    val samples = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    // the 4 sample vectors ARE codewords in every subspace, so a corpus
    // of only samples reconstructs exactly
    val exact = Pq.reconstructionError(e.filter(col("vec_id") < 4),
        "embedding", cbs)
      .as[(Int, Long, Double, Double)].collect()
    assert(exact.length == 2)
    exact.foreach { case (s, n, mean, mx) =>
      assert(n == 4 && mean == 0.0 && mx == 0.0,
        s"sample-only corpus must reconstruct exactly, got subspace $s: ($n, $mean, $mx)")
    }
    // on the full corpus: per-subspace means are the average of the true
    // per-vector minimum distances (replica via encode + dist recompute)
    val full = Pq.reconstructionError(e, "embedding", cbs)
      .as[(Int, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val vecs = e.orderBy("vec_id")
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")))
      .as[Seq[Double]].collect().map(_.toArray)
    val dsub = vecs(0).length / 2
    (0 until 2).foreach { s =>
      val errs = vecs.map { v =>
        val sub = v.slice(s * dsub, (s + 1) * dsub)
        val d = cbs(s).map(cw =>
          cw.zip(sub).map { case (a, b) => (b - a) * (b - a) }
            .foldLeft(0.0)(_ + _)).min
        BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      // mirror Spark exactly: DECIMAL sum -> DOUBLE cast -> double
      // division by the count -> bround(6)
      val mean = BigDecimal(errs.sum.toDouble / errs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      val (_, n, gotMean, gotMax) = full(s)
      assert(n == vecs.length && gotMean == mean,
        s"subspace $s mean: got $gotMean, expected $mean")
      assert(gotMax == BigDecimal(errs.max.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }
  }

  test("Pq ADC top-1 agrees with exact L2 top-1 on well-separated clusters") {
    val e = corpus(100).cache()
    val samples = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    val codes = Pq.encode(e, "vec_id", "embedding", cbs)
    val queries = e.filter(col("vec_id") % 10 === 0)
    val got = Pq.adcTopK(queries, codes, "vec_id", "embedding", cbs, k = 10)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // exact squared-L2 top-1 cluster check: PQ at this granularity must
    // at least keep the neighbor in the query's own direction cluster
    got.foreach { case (q, n) => assert(q % 4 == n % 4,
      s"ADC nearest $n not in query $q's cluster") }
  }

  test("native PqEncode / PqDistTable are bit-identical to the HOF formulations") {
    val rng = new scala.util.Random(13)
    val vecs = ((1 to 150).map(i =>
        (i.toLong, Seq.fill(dim)(rng.nextFloat() * 4 - 2))) ++
      Seq((1001L, Seq.fill(dim)(0.0f))))                // degenerate row
      .toDF("vec_id", "embedding")
    val samples = vecs.filter(col("vec_id") <= 16).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    val both = vecs.select(
        Pq.encodeExpr(col("embedding"), cbs).as("encN"),
        Pq.encodeExprHof(col("embedding"), cbs).as("encH"),
        Pq.distanceTable(col("embedding"), cbs).as("dtN"),
        Pq.distanceTableHof(col("embedding"), cbs).as("dtH"))
      .as[(Seq[Int], Seq[Long], Seq[Seq[Double]], Seq[Seq[Double]])].collect()
    both.foreach { case (encN, encH, dtN, dtH) =>
      assert(encN == encH.map(_.toInt), s"$encN vs $encH")
      assert(dtN == dtH) // EXACT double equality — same fold order
    }
  }

  // ------------------------------------------------------------ IvfPq

  test("ivfPqTopK: candidates unique per pair, k rows max, cluster-correct top-1") {
    val e = corpus(100).cache()
    val cb = normalizedRows(e, 8)
    import graft.plans.SketchExpressions.nearestCentroids
    val samples = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(Pq.residualExpr(col("embedding"),
        element_at(nearestCentroids(col("embedding"), cb, 1), 1), cb).as("r"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    val queries = e.filter(col("vec_id") % 10 === 0)
    val out = Pq.ivfPqTopK(queries, e, "vec_id", "embedding", cb, cbs,
        k = 3, nprobe = 8)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val pairs = out.map(t => (t._1, t._2))
    assert(pairs.length == pairs.toSet.size, "duplicate candidate pair survived")
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
    // full probe on well-separated clusters: ADC-on-residuals must keep
    // the nearest neighbor inside the query's own direction cluster
    out.filter(_._3 == 1).foreach { case (q, n, _) =>
      assert(q % 4 == n % 4, s"IVF-PQ nearest $n not in query $q's cluster") }
    // partial probe returns a subset of the full-probe candidate set
    val part = Pq.ivfPqTopK(queries, e, "vec_id", "embedding", cb, cbs,
        k = 3, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(part.nonEmpty && part.length <= out.length)
  }

  test("rerankTopK: exact-cosine order within candidates, non-candidates excluded, refine recovers brute-force top-1") {
    val e = corpus(100).cache()
    // hand-given candidate set: rerank scores ONLY these pairs, by the
    // exact brute-force cosine, in brute-force tie order
    val cand = Seq((0L, 1L), (0L, 2L), (0L, 3L), (10L, 4L))
      .toDF("query_id", "neighbor_id")
    val qs = e.filter(col("vec_id").isin(0L, 10L))
    val got = Similarity.rerankTopK(cand, qs, e, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.count(_._1 == 0L) == 2 && got.count(_._1 == 10L) == 1)
    assert(got.forall(r => cand.collect().map(c => (c.getLong(0), c.getLong(1)))
      .contains((r._1, r._2))), "a non-candidate leaked into the rerank")
    val bf = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", k = 99)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getInt(3)))).toMap
    got.foreach { case (q, n, c, _) =>
      assert(bf((q, n))._1 == c, s"rerank cosine for ($q,$n) != brute force") }
    // refine recipe: IVF-PQ over-fetch k'=6 then exact rerank to k=3 —
    // top-1 must equal brute-force top-1 on the clustered fixture
    val cb = normalizedRows(e, 8)
    import graft.plans.SketchExpressions.nearestCentroids
    val samples = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(Pq.residualExpr(col("embedding"),
        element_at(nearestCentroids(col("embedding"), cb, 1), 1), cb).as("r"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    val queries = e.filter(col("vec_id") % 10 === 0)
    val approx = Pq.ivfPqTopK(queries, e, "vec_id", "embedding", cb, cbs,
      k = 12, nprobe = 8)
    val refined = Similarity.rerankTopK(approx, queries, e, "vec_id",
        "embedding", k = 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding",
        k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // the rerank guarantee: top-1 is the exact-cosine argmax WITHIN the
    // candidate set — whenever the compressed tier keeps the true
    // neighbor among its k', refine recovers it
    val candSet = approx.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recoverable = exact.filter { case (q, n) =>
      candSet.get(q).exists(_.contains(n)) }
    recoverable.foreach { case (q, n) =>
      assert(refined.get(q).contains(n),
        s"true neighbor $n of $q was in the candidate set but not refined to top-1") }
    // and refine never does WORSE than the raw ADC ordering
    val adcTop1 = approx.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val agreeRefined = exact.count { case (q, n) => refined.get(q).contains(n) }
    val agreeAdc = exact.count { case (q, n) => adcTop1.get(q).contains(n) }
    assert(agreeRefined >= agreeAdc,
      s"refine ($agreeRefined) worse than raw ADC ($agreeAdc)")
    assert(recoverable.nonEmpty, "fixture degenerate: no recoverable queries")
  }

  test("ivfPqTopK: a sample vector's residual is its own codeword — ADC self-distance 0") {
    val e = corpus(100).cache()
    val cb = normalizedRows(e, 8)
    import graft.plans.SketchExpressions.nearestCentroids
    val samples = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(Pq.residualExpr(col("embedding"),
        element_at(nearestCentroids(col("embedding"), cb, 1), 1), cb).as("r"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbs = Pq.codebooks(samples, m = 2)
    // score the sample vectors as queries: each probes its own cell
    // first, finds the corpus row that IS the sample, and the ADC
    // distance through its exactly-representable residual code is 0
    val sampleQueries = e.filter(col("vec_id") < 16)
    val top = Pq.ivfPqTopK(sampleQueries, e, "vec_id", "embedding", cb, cbs,
        k = 200, nprobe = 1)
      .filter(col("adist") === 0.0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // every sample query sees at least one zero-distance candidate
    // whose code equals its own (itself is excluded by the id filter,
    // but code collisions within the cell surface as adist 0 as well) —
    // in particular, sample pairs sharing a cell AND a codeword
    val zeroByQuery = top.groupBy(_._1)
    // at minimum, no NEGATIVE or NaN distances anywhere, and the zero
    // set is consistent: a zero pair's two sides encode identically
    val enc = e.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"),
        element_at(nearestCentroids(col("embedding"), cb, 1), 1).as("cell"))
      .select(col("vec_id"), col("cell"), Pq.encodeExpr(
        Pq.residualExpr(col("embedding"), col("cell"), cb), cbs).as("codes"))
      .as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    top.foreach { case (q, n) =>
      assert(enc(q)._1 == enc(n)._1 && enc(q)._2 == enc(n)._2,
        s"adist 0 between $q and $n but cells/codes differ") }
    assert(zeroByQuery.keySet.nonEmpty)
  }

  // ------------------------------------------------------------ Sq

  test("native SqEncode / SqReconNorm are bit-identical to the HOF forms") {
    // adversarial model: inv=1 over mins=0 makes (x-min)*inv hit EXACT
    // .5 halfway points — where a naive rint/floor(x+0.5) would diverge
    // from Spark's BigDecimal HALF_UP round
    val m = Sq.Model(
      mins = Array(0.0, -1.5, 2.25, 0.0),
      steps = Array(1.0, 0.5, 0.125, 0.0),
      invSteps = Array(1.0, 2.0, 8.0, 0.0))
    val rng = new scala.util.Random(31)
    val rows = ((0 until 30).map { i =>
      (i.toLong, Seq.fill(4)((rng.nextGaussian() * 40).toFloat))
    } ++ Seq(
      (100L, Seq(2.5f, 0.75f, 2.3125f, 9.9f)),    // exact halfway codes
      (101L, Seq(-3.5f, -1.25f, 300f, -300f)),    // clamp both ends
      (102L, Seq(0.5f, 127.5f, 255.5f, 0f)),
      // NON-FINITE inputs: Spark's clamp ordering sorts NaN above every
      // double (greatest(0,NaN)=NaN, least(255,NaN)=255 -> code 255);
      // java Math.min/max would propagate the NaN to .toInt = 0 — the
      // divergence this row pins closed. ±Inf clamp to 255/0 under
      // both orderings.
      (103L, Seq(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, Float.NaN))))
      .toDF("id", "vec")
    val enc = rows.select(
      Sq.encodeExpr(col("vec"), m).as("nat"),
      Sq.encodeExprHof(col("vec"), m).as("hof"))
      .collect()
    enc.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"encode diverged: ${r.getSeq[Int](0)} vs ${r.getSeq[Int](1)}") }
    val norms = rows.select(Sq.encodeExprHof(col("vec"), m).as("codes"))
      .select(
        Sq.reconNormExpr(col("codes"), m).as("nat"),
        Sq.reconNormHof(col("codes"), m).as("hof"))
      .collect()
    norms.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) } // EXACT — same fold order
  }

  test("native SqDotCodes is bit-identical to the HOF fold") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 40).map { i =>
      (i.toLong, Seq.fill(64)(rng.nextInt(256)),
        Seq.fill(64)(rng.nextGaussian() * (if (i % 3 == 0) 1e6 else 1e-3)))
    }.toDF("id", "codes", "w")
    val both = rows.select(
      graft.plans.SketchExpressions.sqDot(col("codes"), col("w")).as("nat"),
      Sq.sqDotHof(col("codes"), col("w")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), // EXACT — same fold order
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}") }
    // length mismatch -> NULL (zip_with's padding contract)
    val mm = rows.limit(1).select(
      graft.plans.SketchExpressions.sqDot(col("codes"), slice(col("w"), 1, 10)))
      .collect().head
    assert(mm.isNullAt(0))
  }

  test("Sq fit/encode: extremes hit 0/255, constant dims code 0, recon norm self-consistent") {
    val e = corpus(100).cache()
    // append a constant dimension to exercise the range==0 guard
    val withConst = e.withColumn("embedding",
      concat(col("embedding"), array(lit(3.5f))))
    val m = Sq.fit(withConst, "embedding")
    assert(m.dim == dim + 1)
    assert(m.steps.last == 0.0 && m.invSteps.last == 0.0)
    val enc = Sq.encode(withConst, "vec_id", "embedding", m)
      .as[(Long, Seq[Int], Double)].collect()
    assert(enc.length == 100)
    val all = enc.flatMap(_._2)
    assert(all.forall(c => c >= 0 && c <= 255))
    // per dimension, the corpus min encodes to 0 and the max to 255
    (0 until dim).foreach { j =>
      val col_j = enc.map(_._2(j))
      assert(col_j.min == 0 && col_j.max == 255, s"dim $j range ${col_j.min}..${col_j.max}")
    }
    assert(enc.forall(_._2.last == 0), "constant dim must code 0")
    // stored recon norm equals a driver-side recomputation from the codes
    enc.take(20).foreach { case (_, codes, rn) =>
      val recomputed = math.sqrt(codes.zipWithIndex.map { case (c, i) =>
        val r = m.mins(i) + c * m.steps(i); r * r
      }.sum)
      assert(math.abs(rn - recomputed) < 1e-9, s"$rn vs $recomputed")
    }
  }

  test("Sq topK recall vs exact cosine is high — 8-bit/dim resolves the clusters") {
    val e = corpus(100).cache()
    val m = Sq.fit(e, "embedding")
    val codes = Sq.encode(e, "vec_id", "embedding", m)
    val queries = e.filter(col("vec_id") % 10 === 0)
    val got = Sq.topK(queries, codes, "vec_id", "embedding", m, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & want).size.toDouble / want.size
    assert(recall >= 0.9, s"SQ8 recall@3 $recall — far below the resolution 8 bits/dim buys")
    // and top-1 stays in the query's own direction cluster (PQ's bar)
    Sq.topK(queries, codes, "vec_id", "embedding", m, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach { case (q, n) => assert(q % 4 == n % 4,
        s"SQ nearest $n not in query $q's cluster") }
  }

  // ------------------------------------------------------------ TextClassifier

  private val docs = Seq(
    (0L, "alpha alpha beta good text", true),
    (1L, "alpha good wholesome text", true),
    (2L, "alpha beta alpha beta", true),
    (3L, "gamma delta junk spam", false),
    (4L, "gamma spam spam junk junk", false),
    (5L, "delta gamma noise", false),
    (6L, "alpha beta good", true),
    (7L, "spam junk gamma", false)
  ).toDF("doc_id", "text", "y")

  test("NB classifier separates token-disjoint classes and scores empty docs with the prior") {
    val model = TextClassifier.train(docs, "text", "y", buckets = 64)
    assert(model.count() == 64, "model must cover every bucket")
    val test = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq((8L, "alpha beta"), (9L, "junk spam spam"),
        (10L, "...!!!")).toDF("doc_id", "text"))
    val scored = TextClassifier.score(test, "doc_id", "text", model, buckets = 64)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(scored(8L)._2, "alpha/beta doc should classify positive")
    assert(!scored(9L)._2, "junk/spam doc should classify negative")
    // doc 10 has no alnum tokens → prior alone; classes are balanced
    // 4/4 so the prior is exactly 0 → predicted false (score > 0 strict)
    assert(scored(10L)._1 == 0L && !scored(10L)._2)
    // training docs classify themselves correctly (separable vocab)
    docs.select("doc_id", "y").as[(Long, Boolean)].collect().foreach {
      case (id, y) => assert(scored(id)._2 == y, s"doc $id misclassified")
    }
  }

  test("NB classifier scoring is an exact integer sum — invariant to repartitioning") {
    val model = TextClassifier.train(docs, "text", "y", buckets = 64)
    val a = TextClassifier.score(docs, "doc_id", "text", model, buckets = 64)
      .as[(Long, Long, Boolean)].collect().toSet
    val b = TextClassifier.score(docs.repartition(7), "doc_id", "text",
        model, buckets = 64)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(a == b)
  }

  // ---------------------------------------------- clusterBalancedSample

  test("clusterBalancedSample equalizes cell mass with the exact md5 rule") {
    // lopsided corpus: 40 vectors on axis 0, 10 on axis 2
    val rows = ((0L until 40L).map(i =>
        (i, Array.tabulate(dim)(j => if (j == 0) 10.0f else 0.0f).toSeq)) ++
      (40L until 50L).map(i =>
        (i, Array.tabulate(dim)(j => if (j == 2) 10.0f else 0.0f).toSeq)))
      .toDF("vec_id", "embedding")
    val cb = Array(
      Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0),
      Array.tabulate(dim)(j => if (j == 2) 1.0 else 0.0))
    val out = Similarity.clusterBalancedSample(rows, "vec_id", "embedding", cb)
      .as[(Long, Int, Long, Double, Boolean)].collect()
    val byCell = out.groupBy(_._2)
    assert(byCell(1).head._3 == 40L && byCell(2).head._3 == 10L)
    assert(byCell(2).forall(_._5), "the smallest cell must keep every row")
    assert(byCell(1).head._4 == 0.25)
    // the keep decision is EXACTLY the bucket65536 rule — replicate it
    def bucket65536(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16)
    }
    val threshold = math.round(0.25 * 65536.0)
    byCell(1).foreach { case (id, _, _, _, keep) =>
      assert(keep == (bucket65536(id) < threshold), s"vec $id keep decision")
    }
    // deterministic under repartitioning
    val again = Similarity.clusterBalancedSample(
        rows.repartition(7), "vec_id", "embedding", cb)
      .as[(Long, Int, Long, Double, Boolean)].collect().toSet
    assert(again == out.toSet)
  }
}
