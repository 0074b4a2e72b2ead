package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scalar library is callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT graft_title_case('  american   AIRLINES ') AS t,
             graft_clean_money('$1,540.00') AS m,
             graft_iso_date(graft_parse_date('20-Jan-23')) AS d,
             graft_similarity_ratio('ABCDE', 'ABCDF') AS s,
             graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c,
             graft_lang_id('the cat and the dog is in a house') AS l,
             graft_mask_email('alice.smith@example.com') AS e
    """).head
    assert(r.getString(0) == "American Airlines")
    assert(r.getDouble(1) == 1540.0)
    assert(r.getString(2) == "2023-01-20")
    assert(r.getDouble(3) == 80.0)
    assert(r.getDouble(4) == 0.0)
    assert(r.getString(5) == "en")
    assert(r.getString(6) == "al***@example.com")
  }

  test("est_jaccard yields NULL (not NaN / padded estimate) on empty or mismatched signatures") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT graft_est_jaccard(array(1L, 2L), array(1L, 3L)) AS ok,
             graft_est_jaccard(CAST(array() AS ARRAY<BIGINT>),
                               CAST(array() AS ARRAY<BIGINT>)) AS empty,
             graft_est_jaccard(array(1L, 2L), array(1L, 2L, 3L)) AS mismatched
    """).head
    assert(r.getDouble(0) == 0.5)
    assert(r.isNullAt(1), "empty signatures must yield NULL, not NaN")
    assert(r.isNullAt(2),
      "length-mismatched signatures must yield NULL, not a zip-padded estimate")
  }

  test("registered functions are expression trees, not UDF black boxes") {
    GraftFunctions.registerAll(spark)
    val plan = spark.sql("SELECT graft_clean_money('$5.00')").queryExecution.optimizedPlan
    // constant-folded by Catalyst → proof the optimizer sees through it
    assert(plan.toString.contains("5.0"))
  }

  test("LevenshteinPrefilter rule injects the O(1) length bound") {
    import graft.plans.LevenshteinPrefilter
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ LevenshteinPrefilter
      // spark.range source: a literal Seq collapses to LocalRelation and
      // the optimizer evaluates the filter away before the rule matters
      val df = spark.range(3)
        .select(col("id"),
          element_at(typedLit(Seq("kitten", "abc", "same")), (col("id") + 1).cast("int")).as("a"),
          element_at(typedLit(Seq("sitting", "abcdefghij", "same")), (col("id") + 1).cast("int")).as("b"))
        .filter(levenshtein(col("a"), col("b")) <= 2)
      val optimized = df.queryExecution.optimizedPlan.toString
      // the cheap |len(a)-len(b)| <= 2 bound is conjoined before the
      // quadratic levenshtein (column refs may be inlined by pushdown)
      assert(optimized.contains("abs((length("), optimized)
      // results are unchanged: ("abc","abcdefghij") has length diff 7 -> out
      val got = df.select("a").as[String].collect.toSet
      assert(got == Set("same"))
      // fixpoint-safe: the rule does not stack a second copy of the bound
      val bounds = "abs\\(\\(length\\(".r.findAllIn(optimized).size
      assert(bounds == 1, s"expected exactly one injected bound:\n$optimized")
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }
}
