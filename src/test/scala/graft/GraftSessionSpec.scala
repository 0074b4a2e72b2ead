package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session contract a library user gets from GraftSession. The suite
  * shares one JVM-wide session, so `attach` (the existing-session path)
  * is what can be exercised here; `local()`/`builder()` feed the same
  * conf set to getOrCreate and are covered end-to-end by the Verify and
  * Bench mains, which build real sessions from it for the 84-query
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
}
