package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** Bit-parity gate for the fused DSIR scorer
  * ([[graft.plans.DsirScoreNative]]) against the interpreted-HOF
  * formulation it replaced (`Dsir.scoreExprHof`) — the same contract
  * the PQ fusion ships under (AnnPqSpec's encode/dist-table parity).
  * Parity must hold on the REAL corpus and on adversarial strings that
  * stress every clause the native pass re-implements: trim is
  * space-only (tabs/newlines survive into split), Java-regex \s+ is
  * ASCII-only, lowercase is full-Unicode, leading separators produce a
  * leading empty token that the filter drops, and the decimal fold
  * rounds the accumulator to scale 11 after every add. */
class DsirNativeParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val adversarial = Seq(
    1L -> "plain lower ascii bigram stream",
    2L -> "  leading and trailing spaces  ",
    3L -> "\ttab\tseparated\ttokens\t",
    4L -> "line\nbreaks\r\nandvertical\ftabs",
    5L -> "MiXeD CaSe TOKENS",
    6L -> "ÜNICODE Straße ΣΊΣΥΦΟΣ İstanbul",
    7L -> "non breaking space stays one token",
    8L -> "multiple     internal      runs",
    9L -> "one-token",
    10L -> "",
    11L -> "   ",
    12L -> "a b",
    13L -> "repeat repeat repeat repeat repeat repeat repeat repeat",
    14L -> ("long doc " * 400).trim,
    15L -> null.asInstanceOf[String])

  test("native scorer is bit-identical to the HOF path on adversarial strings") {
    val df = adversarial.toDF("doc_id", "text")
    // fit on the non-degenerate half so the table has real mass
    val m = Dsir.fitLiteralModel(df, "text", col("doc_id") % 2 === 0,
      nBuckets = 4096)
    val native = df.select(col("doc_id"), Dsir.scoreExpr(col("text"), m).as("s"))
      .select(col("doc_id"), col("s.n_bigrams"), col("s.avg_logratio"))
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    val hof = df.select(col("doc_id"), Dsir.scoreExprHof(col("text"), m).as("s"))
      .select(col("doc_id"), col("s.n_bigrams"), col("s.avg_logratio"))
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(native.length == adversarial.length)
    native.zip(hof).foreach { case (n, h) =>
      assert(n == h, s"native/HOF divergence at doc ${n._1}")
      // bit-level, not just ==: compare the raw IEEE bits of the mean
      (n._3, h._3) match {
        case (Some(a), Some(b)) =>
          assert(java.lang.Double.doubleToRawLongBits(a) ==
            java.lang.Double.doubleToRawLongBits(b))
        case (a, b) => assert(a == b)
      }
    }
    // degenerate docs score (0, null), never a null struct
    val byId = native.map(r => r._1 -> (r._2, r._3)).toMap
    Seq(9L, 10L, 11L, 15L).foreach { id =>
      assert(byId(id) == ((0L, None)), s"doc $id")
    }
    assert(byId(12L)._1 == 1L)
  }

  test("native scorer matches the HOF path on the real corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val m = Dsir.fitLiteralModel(docs, "text", col("lang") === "en",
      nBuckets = 4096)
    val native = docs.select(col("doc_id"), Dsir.scoreExpr(col("text"), m).as("s"))
      .select(col("doc_id"), col("s.n_bigrams"), col("s.avg_logratio"))
      .as[(Long, Long, Option[Double])].collect().toSet
    val hof = docs.select(col("doc_id"), Dsir.scoreExprHof(col("text"), m).as("s"))
      .select(col("doc_id"), col("s.n_bigrams"), col("s.avg_logratio"))
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(native.nonEmpty && native == hof)
  }
}
