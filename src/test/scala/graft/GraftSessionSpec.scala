package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session contract a library user gets from GraftSession. The suite
  * shares one JVM-wide session, so `attach` (the existing-session path)
  * is what can be exercised here; `local()`/`builder()` feed the same
  * conf set to getOrCreate and are covered end-to-end by the Verify and
  * Bench mains, which build real sessions from it for the full
  * oracle gate. */
class GraftSessionSpec extends AnyFunSuite {

  test("attach applies the runtime contract and registers the functions") {
    val s = GraftSession.attach(TestSpark.spark)
    assert(s.conf.get("spark.sql.ansi.enabled") == "false")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(s.conf.get("spark.sql.parquet.outputTimestampType") == "TIMESTAMP_MICROS")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    // the full registry is live in SQL, including the round-4 additions
    assert(s.sql("SELECT graft_title_case('  gold  STAR ')").head.getString(0)
      == "Gold Star")
    assert(s.sql("SELECT graft_normalize_unicode('a\u200Bb')").head.getString(0)
      == "ab")
  }

  test("sketch/selection family is callable from pure SQL") {
    val s = GraftSession.attach(TestSpark.spark)
    // identical texts -> identical 32-hash signatures -> est jaccard 1.0
    val est = s.sql(
      """SELECT graft_est_jaccard(
        |  graft_minhash_sig(graft_char_shingles('the same doc text', 9), 32),
        |  graft_minhash_sig(graft_char_shingles('the same doc text', 9), 32))
        |""".stripMargin).head.getDouble(0)
    assert(est == 1.0)
    // SQL and Column API build the SAME expression => same bits
    import org.apache.spark.sql.functions._
    val sqlBucket = s.sql("SELECT graft_bucket65536(CAST(42 AS BIGINT))")
      .head.getLong(0)
    import s.implicits._
    val apiBucket = Seq(42L).toDF("id")
      .select(graft.operators.Split.bucket65536(col("id"))).head.getLong(0)
    assert(sqlBucket == apiBucket)
    assert(s.sql("SELECT graft_bucket16(7)").head.getLong(0) ==
      s.sql("SELECT graft_bucket16(7)").head.getLong(0))
    // the real BPE tokenizer from SQL (DemoMerges table)
    val toks = s.sql("SELECT graft_bpe_tokens('the then')")
      .head.getSeq[String](0)
    assert(toks.nonEmpty && toks.mkString("") == "thethen")
    // non-literal int parameter fails loudly, not silently
    val err = intercept[Exception] {
      s.sql("SELECT graft_minhash_sig(graft_char_shingles('x', 3), id)" +
        " FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
