package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.NgramLM

/** Bigram-LM perplexity filter: model counts, hand-computed scores,
  * degenerate docs, and the quantile filter stage. */
class NgramLMSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Corpus: "a b" x2 and "a c" — vocabulary {a, b, c}, V = 3.
  private val docs = Seq(
    (1L, "a b"),
    (2L, "a b"),
    (3L, "a c"),
    (4L, "solo") // one token: no bigrams, unscorable
  ).toDF("doc_id", "text")

  test("train: gram counts, context counts, vocabulary size") {
    val lm = NgramLM.train(docs, "text")
    val grams = lm.grams.as[(String, Long)].collect.toMap
    assert(grams == Map("a b" -> 2L, "a c" -> 1L))
    val ctx = lm.contexts.as[(String, Long)].collect.toMap
    assert(ctx == Map("a" -> 3L))
    assert(lm.vocab.as[Long].head == 4L) // a, b, c, solo
  }

  test("score: Laplace-smoothed mean logprob, NULL for bigram-free docs") {
    val lm = NgramLM.train(docs, "text")
    val rows = NgramLM.score(docs, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // P(b|a) = (2+1)/(3+4), P(c|a) = (1+1)/(3+4)
    val pBA = math.log(3.0 / 7.0)
    val pCA = math.log(2.0 / 7.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(rows(1L) == (1L, Some(r6(pBA))))
    assert(rows(2L) == (1L, Some(r6(pBA))))
    assert(rows(3L) == (1L, Some(r6(pCA))))
    assert(rows(4L) == (0L, None)) // too short to score, not "score 0"
  }

  test("score: unseen gram and context fall back to smoothed zero counts") {
    val lm = NgramLM.train(docs, "text")
    val other = Seq((9L, "x y")).toDF("doc_id", "text") // nothing in model
    val row = NgramLM.score(other, "text", "doc_id", lm).collect().head
    // c12 = 0, c1 = 0 -> ln((0+1)/(0+4))
    val expect = BigDecimal(math.log(1.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(row.getLong(1) == 1L && row.getDouble(2) == expect)
  }

  test("scoreSelfTrained == train-then-score (single-explode fast path)") {
    val viaTrain = NgramLM.score(docs, "text", "doc_id",
      NgramLM.train(docs, "text")).collect().map(_.toString).sorted.toSeq
    val viaSelf = NgramLM.scoreSelfTrained(docs, "text", "doc_id")
      .collect().map(_.toString).sorted.toSeq
    assert(viaSelf == viaTrain)
  }

  test("perplexityFilter: exact tail cutoff flags the worst docs") {
    val lm = NgramLM.train(docs, "text")
    val out = NgramLM.perplexityFilter(docs, "text", "doc_id", lm,
      tailFraction = 0.5).collect()
      .map(r => r.getLong(0) -> r).toMap
    // scores: docs 1,2 at ln(3/7) ~ -0.847, doc 3 at ln(2/7) ~ -1.253;
    // p50 over {-1.253, -0.847, -0.847} = -0.847 -> only no-op "keeps"
    // are the strictly-greater docs: none at the cutoff value itself.
    assert(!out(3L).getBoolean(4))          // worst doc dropped
    assert(!out(1L).getBoolean(4) && !out(2L).getBoolean(4)) // == cutoff, not >
    assert(out(4L).isNullAt(2) && out(4L).isNullAt(4)) // unscorable -> NULL keep
    // cutoff column is the same for every row
    assert(out.values.map(_.getDouble(3)).toSet.size == 1)
  }
}
