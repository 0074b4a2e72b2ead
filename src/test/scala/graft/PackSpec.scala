package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pack

class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalIndex == in-memory sort index, under any input partitioning") {
    val keys = Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 0L)
    val df = keys.toDF("k").repartition(7)
    val got = Pack.globalIndex(df, "k", "idx")
      .select("k", "idx").as[(Long, Long)].collect.toMap
    val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
    assert(got == want)
  }

  test("prefixSum == in-memory exclusive scan, nulls count as zero") {
    val rows = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)), (4L, Some(0L)),
      (5L, Some(7L))).toDF("k", "v").repartition(3)
    val got = Pack.prefixSum(rows, col("v"), "k", "ps")
      .select("k", "ps").as[(Long, Long)].collect.toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 10L, 4L -> 15L, 5L -> 15L))
  }

  test("packByTokenBudget: offsets, sequence spans, boundary flag") {
    // budget 10; token counts 4,4,4 -> third doc spans tokens 8..11,
    // crossing the seq-0/seq-1 cut; an empty doc stays point-like
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 0L), (5L, 12L))
      .toDF("id", "n")
    val got = Pack.packByTokenBudget(docs, col("n"), "id", budget = 10)
      .select("id", "tok_offset", "seq_first", "seq_last", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect.sortBy(_._1)
    assert(got(0) == ((1L, 0L, 0L, 0L, false)))
    assert(got(1) == ((2L, 4L, 0L, 0L, false)))
    assert(got(2) == ((3L, 8L, 0L, 1L, true)))   // spans the cut at 10
    assert(got(3) == ((4L, 12L, 1L, 1L, false))) // empty doc, point-like
    assert(got(4) == ((5L, 12L, 1L, 2L, true)))  // 12..23 crosses cut at 20
  }

  test("assembleSequences reconstructs the exact concatenation in budget cuts") {
    val docs = Seq(
      (1L, "a1 a2 a3"),
      (2L, "b1 b2"),
      (3L, ""),            // token-free doc contributes nothing
      (4L, "c1 c2 c3 c4 c5")
    ).toDF("doc_id", "text").repartition(3)
    val got = Pack.assembleSequences(docs, "text", "doc_id", budget = 4)
      .orderBy("seq_id")
      .select("seq_id", "n_tokens", "seq_text")
      .as[(Long, Long, String)].collect.toSeq
    // global stream: a1 a2 a3 b1 | b2 c1 c2 c3 | c4 c5
    assert(got == Seq(
      (0L, 4L, "a1 a2 a3 b1"),
      (1L, 4L, "b2 c1 c2 c3"),
      (2L, 2L, "c4 c5")))
    // every non-final sequence is exactly budget-sized; the stream
    // round-trips to the original concatenation
    val joined = got.map(_._3).mkString(" ")
    assert(joined == "a1 a2 a3 b1 b2 c1 c2 c3 c4 c5")
  }
}
