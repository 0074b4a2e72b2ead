package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** DSIR importance weights (Dsir) + leakage-safe split assignment
  * (Split.leakageSafeAssign): exact-value fixtures computed against an
  * independent replica of the hashing/smoothing/rounding contract, plus
  * the structural properties the operators exist for. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // independent replica of Dsir's contract: md5 first-4-hex-digits
  // bucket, add-1 smoothing, per-occurrence round-12 HALF_UP, exact
  // decimal sum, HALF_EVEN round-6 mean
  private def bucketOf(gram: String, nBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    java.lang.Long.parseLong(hex, 16) % nBuckets
  }
  private def bigramsOf(text: String): Seq[String] = {
    val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (tk.length < 2) Seq.empty else tk.sliding(2).map(_.mkString(" ")).toSeq
  }
  private def expectedScores(docs: Seq[(Long, String, Boolean)],
                             nBuckets: Int): Map[Long, Option[Double]] = {
    val occ = docs.flatMap { case (id, text, tgt) =>
      bigramsOf(text).map(g => (id, tgt, bucketOf(g, nBuckets))) }
    val ct = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = occ.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nt = ct.values.sum; val nr = cr.values.sum
    docs.map { case (id, text, _) =>
      val mine = occ.filter(_._1 == id)
      if (mine.isEmpty) id -> None
      else {
        val sum = mine.map { case (_, _, b) =>
          val lr = math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + nBuckets)) -
                   math.log((cr.getOrElse(b, 0L) + 1).toDouble / (nr + nBuckets))
          BigDecimal(lr).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        // mirror Spark exactly: DECIMAL sum -> DOUBLE cast -> double
        // division -> bround(6) (HALF_EVEN)
        id -> Some(BigDecimal(sum.toDouble / mine.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
      }
    }.toMap
  }

  private val fixture = Seq(
    (1L, "apple banana apple", true),
    (2L, "apple banana cherry", true),
    (3L, "dog cat dog", false),
    (4L, "dog cat mouse", false),
    (5L, "apple banana apple", false), // raw doc identical to a target doc
    (6L, "solo", true))                // < 2 tokens: unscorable

  test("importanceWeights matches an independent replica of the contract exactly") {
    val df = fixture.toDF("doc_id", "text", "tgt")
    val got = Dsir.importanceWeights(df, "text", "doc_id",
        isTarget = col("tgt"), nBuckets = 4096)
      .select("doc_id", "n_bigrams", "avg_logratio", "keep")
      .as[(Long, Long, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    val want = expectedScores(fixture.map(d => (d._1, d._2, d._3)), 4096)
    fixture.foreach { case (id, text, _) =>
      val (_, n, score, keep) = got(id)
      assert(n == bigramsOf(text).size, s"doc $id n_bigrams")
      assert(score == want(id), s"doc $id score: got $score want ${want(id)}")
      assert(keep == score.map(_ > 0.0), s"doc $id keep")
    }
  }

  test("target-like docs score positive, raw-like negative, short docs NULL") {
    val df = fixture.toDF("doc_id", "text", "tgt")
    val got = Dsir.importanceWeights(df, "text", "doc_id",
        isTarget = col("tgt"), nBuckets = 4096)
      .select("doc_id", "avg_logratio")
      .as[(Long, Option[Double])].collect().toMap
    // "apple banana" grams dominate the target model, "dog cat" the raw
    assert(got(1L).exists(_ > 0.0) && got(2L).exists(_ > 0.0))
    assert(got(3L).exists(_ < 0.0) && got(4L).exists(_ < 0.0))
    // the raw doc that LOOKS like the target still scores positive —
    // selection is by content, not by the doc's own label
    assert(got(5L).exists(_ > 0.0))
    assert(got(6L).isEmpty)
  }

  test("importanceWeights is invariant under repartitioning") {
    val df = fixture.toDF("doc_id", "text", "tgt")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(d, "text", "doc_id", col("tgt"), nBuckets = 64)
        .select("doc_id", "n_bigrams", "avg_logratio")
        .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(7)))
  }

  test("leakageSafeAssign keeps every near-dup pair in one split") {
    val docs = (1L to 200L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Split.leakageSafeAssign(docs, "doc_id", pairs, "id_a", "id_b",
        Seq("train" -> 12, "val" -> 2, "test" -> 2))
      .select("doc_id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // component representatives are the min ids; singletons are themselves
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(10L, 11L).map(out(_)._1).distinct == Seq(10L))
    assert(out(42L)._1 == 42L)
    // the leakage property: one split per duplicate group
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    assert(Seq(10L, 11L).map(out(_)._2).distinct.size == 1)
    // all three splits are populated over 200 ids (deterministic md5)
    assert(out.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("literal-model scoring is bit-identical to the batch path") {
    val df = fixture.toDF("doc_id", "text", "tgt")
    val m = Dsir.fitLiteralModel(df, "text", isTarget = col("tgt"),
      nBuckets = 4096)
    val viaExpr = df.select(col("doc_id"),
        Dsir.scoreExpr(col("text"), m).as("s"))
      .select(col("doc_id"), col("s.n_bigrams"), col("s.avg_logratio"))
      .as[(Long, Long, Option[Double])].collect().toSet
    val viaBatch = Dsir.importanceWeights(df, "text", "doc_id",
        col("tgt"), nBuckets = 4096)
      .select("doc_id", "n_bigrams", "avg_logratio")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(viaExpr == viaBatch)
  }

  test("literal-model scoring runs map-only on a stream, matching batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val df = fixture.toDF("doc_id", "text", "tgt")
    val m = Dsir.fitLiteralModel(df, "text", isTarget = col("tgt"),
      nBuckets = 4096)
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Dsir.scoreExpr(col("text"), m).as("s"))
      .select(col("doc_id"), col("s.n_bigrams").as("n_bigrams"),
        col("s.avg_logratio").as("avg_logratio"))
    val q = scored.writeStream.format("memory").queryName("dsirstream")
      .outputMode("append").start()
    input.addData(fixture.take(3).map(d => (d._1, d._2)): _*)
    q.processAllAvailable()
    input.addData(fixture.drop(3).map(d => (d._1, d._2)): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsirstream")
      .as[(Long, Long, Option[Double])].collect().toSet
    val batch = Dsir.importanceWeights(df, "text", "doc_id",
        col("tgt"), nBuckets = 4096)
      .select("doc_id", "n_bigrams", "avg_logratio")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(streamed == batch)
  }

  test("selection operators handle empty and degenerate inputs") {
    // DSIR on an empty corpus: no rows, no crash
    val emptyDocs = Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "tgt")
    assert(Dsir.importanceWeights(emptyDocs, "text", "doc_id",
      col("tgt")).count() == 0)
    // zero TARGET docs: add-1 smoothing keeps every score finite
    val rawOnly = Seq((1L, "dog cat dog", false), (2L, "dog cat mouse", false))
      .toDF("doc_id", "text", "tgt")
    val sc = Dsir.importanceWeights(rawOnly, "text", "doc_id", col("tgt"))
      .select("avg_logratio").as[Option[Double]].collect().flatten
    assert(sc.length == 2 && sc.forall(v => !v.isNaN && !v.isInfinite))
    // BPE training on an empty corpus learns nothing and does not throw
    val emptyText = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(BpeTrain.learnMerges(emptyText, "text", 3).isEmpty)
    // span removal with no duplicated spans is the identity
    val uniq = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val spans = TextDedup.stripDupSpans(uniq, "text", "doc_id", window = 8)
      .as[(Long, Long, Long, String)].collect()
    assert(spans.forall(_._3 == 0L))
    // leakage-safe assign with an EMPTY pair set degenerates to plain
    // per-id assignment (every doc is its own group)
    val docs = (1L to 20L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val lsa = Split.leakageSafeAssign(docs, "doc_id", noPairs, "id_a", "id_b",
        Seq("train" -> 12, "val" -> 2, "test" -> 2))
      .select("doc_id", "group_id").as[(Long, Long)].collect()
    assert(lsa.length == 20 && lsa.forall { case (d, g) => d == g })
  }

  test("leakageSafeAssign split equals plain assign on the group id") {
    val docs = (1L to 50L).toDF("doc_id")
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val out = Split.leakageSafeAssign(docs, "doc_id", pairs, "id_a", "id_b",
        Seq("train" -> 12, "val" -> 2, "test" -> 2))
      .select("doc_id", "group_id", "bucket", "split")
      .as[(Long, Long, Long, String)].collect()
    val direct = Split.assign(out.toSeq.map(_._2).distinct.toDF("group_id"),
        col("group_id"), Seq("train" -> 12, "val" -> 2, "test" -> 2))
      .select("group_id", "split").as[(Long, String)].collect().toMap
    out.foreach { case (_, g, b, s) =>
      assert(b >= 0 && b < 16)
      assert(direct(g) == s)
    }
  }

  test("gumbel noise is a pure function of (id, seed) with the documented transform") {
    // replicate: u = (first-4-md5-hex(id||seed) + 0.5) / 65536, g =
    // -ln(-ln u), HALF_UP round-12
    def expected(id: Long, seed: String): Double = {
      val b = bucketOf(s"$id$seed", 65536)
      BigDecimal(-math.log(-math.log((b + 0.5) / 65536.0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = (1L to 20L).toDF("id")
      .select(col("id"), Dsir.gumbel(col("id"), "dsir").as("g"))
      .as[(Long, Double)].collect().toMap
    (1L to 20L).foreach(id => assert(got(id) == expected(id, "dsir")))
    // different seed, different sample
    val got2 = (1L to 20L).toDF("id")
      .select(Dsir.gumbel(col("id"), "other")).as[Double].collect()
    assert(got2.toSeq != (1L to 20L).map(got))
  }

  test("resampleKeep selects ~fraction, favors heavy weights, skips zero-feature docs") {
    val docs = ((1L to 40L).map(i => (i, "alpha beta gamma delta common tokens", i % 2 == 0)) ++
      (41L to 80L).map(i => (i, "completely different raw side words here", false)) ++
      Seq((81L, "short", false), (82L, "", false)))
      .toDF("doc_id", "text", "is_en")
    val out = Dsir.resampleKeep(docs, "text", "doc_id",
        isTarget = col("is_en"), nBuckets = 512, fraction = 0.25)
      .select("doc_id", "n_features", "keep")
      .as[(Long, Long, Boolean)].collect()
    // deterministic: a second run is identical
    val out2 = Dsir.resampleKeep(docs, "text", "doc_id",
        isTarget = col("is_en"), nBuckets = 512, fraction = 0.25)
      .select("doc_id", "n_features", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // zero-feature docs are never kept
    out.filter(_._2 == 0).foreach { case (id, _, keep) =>
      assert(!keep, s"zero-feature doc $id was kept") }
    // quantile-threshold semantics: kept count ~ fraction of SCORED docs
    val scored = out.count(_._2 > 0)
    val kept = out.count(_._3)
    assert(kept > 0 && kept <= math.ceil(scored * 0.25) + 1,
      s"kept $kept of $scored scored docs at fraction 0.25")
  }
}
