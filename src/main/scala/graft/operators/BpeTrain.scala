package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE merge-table TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909 — the learning loop whose APPLY side is the gated
  * [[graft.plans.BpeEncode]] expression): repeatedly count adjacent
  * symbol pairs over the corpus and adopt the most frequent pair as the
  * next merge, re-tokenizing with the merges learned so far.
  *
  * Tie-break is deterministic and engine-portable: highest pair count,
  * then lexicographic (a, b) — so the learned table is a pure function
  * of the corpus (the q112 DuckDB oracle re-learns it round by round).
  *
  * Shape at scale (the [[Similarity.kmeansFitDistributed]] pattern —
  * per round ONE bounded job + a parameter-sized collect):
  *  - the corpus collapses ONCE to the word-frequency dict (one hash
  *    agg, map-side combined — the standard trainer's first move; all
  *    subsequent rounds run over the vocabulary, not the corpus);
  *  - each round re-tokenizes the PINNED dict with the merges learned
  *    so far (BpeEncode literal — map-only), counts weighted pairs
  *    (pair-vocabulary-bounded hash agg), and collects exactly ONE row
  *    (TakeOrderedAndProject) — the new merge;
  *  - driver state is the merges table itself: numMerges rows.
  *
  * APPLICABILITY BOUND, explicit: the per-round plan stays O(1) nodes
  * (the merges table is ONE literal inside a single BpeEncode), but
  * round r's re-tokenization redoes rounds 1..r-1's merge work, so
  * total training work grows ~quadratically in numMerges — fine for
  * the gated tables and small vocabularies, impractical for 10k+
  * production vocabularies. (BASELINE.md's "flat" scale verdict was
  * measured at the gated numMerges=3 and does NOT extrapolate past the
  * quadratic term.) The canonical constant-per-round alternative —
  * Sennrich's incremental trainer, which applies only the NEWEST merge
  * to the previous round's token arrays — is deliberately not used:
  * its training-order-incremental tokenization can diverge from the
  * lowest-rank-first APPLY loop ([[graft.plans.BpeEncode]]) in one
  * known pathological class (two distinct derivations of the same
  * symbol string re-enabling an earlier merge — the train/apply
  * mismatch real BPE stacks document), whereas this trainer makes
  * train-time tokenization equal BpeEncode's apply BY CONSTRUCTION,
  * which is exactly what the q112 oracle (a from-scratch per-round
  * replay) enforces bit-for-bit. Scaling to production vocabularies
  * means adopting the incremental loop AND re-deriving the oracle to
  * replay it — a semantics change, not an optimization.
  */
object BpeTrain {

  /** One learned merge: rank, the pair, and its weighted frequency at
    * adoption time. */
  final case class Merge(rnk: Long, a: String, b: String, pairCount: Long)

  /** Learn `numMerges` merges from `docs(textCol)`. Stops early if no
    * adjacent pair remains (fully merged vocabulary). */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    // corpus -> word-frequency dict, once (same \s+ split contract as
    // BpeEncode / the q105 oracle; no lowercasing — BPE is case-aware)
    val dict = Pin.data(
      Spread.toCores(docs)
        .select(explode(split(col(textCol), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")))
    val learned = scala.collection.mutable.ArrayBuffer[Merge]()
    var exhausted = false
    while (learned.size < numMerges && !exhausted) {
      val toks = TextFunctions.bpeTokens(
        col("w"), learned.toSeq.map(m => (m.a, m.b)))
      val top = dict
        .select(col("cnt"), toks.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("a"),
              element_at(col("t"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        learned += Merge(learned.size.toLong,
          r.getString(0), r.getString(1), r.getLong(2))
      }
    }
    learned.toSeq
  }

  /** [[learnMerges]] as a DataFrame (rnk, a, b, pair_count) — the
    * merges-table artifact a tokenizer-training pipeline persists. */
  def learnMergesTable(docs: DataFrame, textCol: String,
                       numMerges: Int): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, numMerges)
      .map(m => (m.rnk, m.a, m.b, m.pairCount))
      .toDF("rnk", "a", "b", "pair_count")
  }
}
