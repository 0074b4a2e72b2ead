package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE merge-table TRAINING — Sennrich et al. 2016
  * (arXiv:1508.07909) with the paper's INCREMENTAL update: per round,
  * count adjacent symbol pairs over the current token state, adopt the
  * most frequent pair, and apply ONLY that newest merge to the previous
  * round's pinned token frames. Per-round cost is therefore FLAT in the
  * merge index (one vocabulary-sized map + one pair-vocabulary-bounded
  * hash agg + a one-row collect), which is what makes 10k+-merge
  * production vocabularies reachable — the previous from-scratch
  * re-tokenizing loop redid rounds 1..r-1's work every round
  * (O(merges²) total) and could only be gated at toy merge counts.
  *
  * Tie-break is deterministic and engine-portable: highest pair count,
  * then lexicographic (a, b) — so the learned table is a pure function
  * of the corpus, and the q112 DuckDB oracle replays the SAME
  * incremental loop round by round (one wrong count or one wrong merge
  * application anywhere flips a later argmax and the hash).
  *
  * Token state representation: each word's tokens ride as ONE
  * separator-encoded string — token t becomes `U+001F t U+001F`, tokens
  * concatenate — so applying a merge (a, b) is a single codegen'd
  * `replace(s, ⟨a⟩⟨b⟩, ⟨ab⟩)`: non-overlapping left-to-right
  * replacement, exactly the greedy single-merge pass the published
  * trainer performs (and exactly what DuckDB's `replace` computes, so
  * the oracle shares the operation, not a re-derivation). U+001F (unit
  * separator) cannot occur inside a token: symbols come from word
  * characters and concatenations thereof.
  *
  * Shape at scale:
  *  - the corpus collapses ONCE to the word-frequency dict (one hash
  *    agg, map-side combined — the standard trainer's first move; all
  *    subsequent rounds run over the vocabulary, not the corpus);
  *  - the state frame is re-pinned each round ([[Pin.data]], lazy — the
  *    round's own pair-count job folds in the materialization), coalesced
  *    to a few partitions because per-round work is vocabulary-sized and
  *    task-scheduling overhead would otherwise dominate at high merge
  *    counts; earlier pins become unreferenced and the ContextCleaner
  *    reclaims them (reliable-checkpoint deployments: set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`, see
  *    [[Pin.data]]);
  *  - fully-merged words (single token — can never pair again) are
  *    PRUNED from the state, so the frame shrinks as training proceeds;
  *  - driver state is the merges table itself: numMerges rows.
  *
  * TRAIN/APPLY CONTRACT, explicit: the incremental trainer tokenizes by
  * applying merges in TRAINING order, once each at adoption time; the
  * APPLY side ([[graft.plans.BpeEncode]], q105) re-tokenizes from
  * characters lowest-rank-first. The two agree on dependency-ordered
  * tables (each merge's inputs built by earlier ranks — the normal case,
  * and the shape this trainer emits) but can diverge in one known
  * pathological class: two distinct derivations of the same symbol
  * string re-enabling an earlier merge. Real BPE stacks train
  * incrementally and document exactly this caveat; the previous
  * from-scratch trainer avoided it by construction at O(merges²) cost.
  * The q112 oracle replays THIS loop, so the gate pins the incremental
  * semantics bit-for-bit at 64 merges.
  */
object BpeTrain {

  /** One learned merge: rank, the pair, and its weighted frequency at
    * adoption time. */
  final case class Merge(rnk: Long, a: String, b: String, pairCount: Long)

  private val SEP = "\u001f"

  /** Learn `numMerges` merges from `docs(textCol)`. Stops early if no
    * adjacent pair remains (fully merged vocabulary).
    *
    * INPUT CONTRACT: words containing U+001F (the separator the state
    * encoding reserves) are DROPPED at dict-build time — `\s+` does not
    * split on it (it is not regex whitespace), and a word carrying it
    * would corrupt the state string identically in Spark and the DuckDB
    * oracle, invisibly to the q112 gate. U+001F is a C0 control code
    * with no legitimate in-word use; dropping the word (not the corpus)
    * is the deterministic, engine-portable choice.
    *
    * `onRoundNanos` (optional) observes each completed round's wall
    * nanos (round index, nanos) — the ScaleStress harness uses it to
    * measure the flat-per-round claim at production merge counts. */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int,
                  onRoundNanos: Option[(Int, Long) => Unit] = None): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    // corpus -> word-frequency dict, once (same \s+ split contract as
    // BpeEncode / the q105 oracle; no lowercasing — BPE is case-aware),
    // then the initial state: code-point symbols (bpeTokens with an
    // empty table — no UTF-16 surrogate splitting), separator-encoded
    val chars = TextFunctions.bpeTokens(col("w"), Nil)
    var state = Pin.data(
      Spread.toCores(docs)
        .select(explode(split(col(textCol), "\\s+")).as("w"))
        .filter(length(col("w")) > 0 && !col("w").contains(SEP))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .select(col("cnt"),
          array_join(transform(chars,
            c => concat(lit(SEP), c, lit(SEP))), "").as("s"))
        .coalesce(4))
    val learned = scala.collection.mutable.ArrayBuffer[Merge]()
    var exhausted = false
    while (learned.size < numMerges && !exhausted) {
      val roundT0 = System.nanoTime()
      // adjacent pairs of the CURRENT state in ONE native expression
      // (graft.plans.BpeAdjacentPairs — same tokens, same pairs as the
      // substr+split+transform(sequence..) builtin chain it replaces):
      // the round frame analyzed by Catalyst shrinks from a ~50-node
      // tree to one node, cutting the per-round driver wall that
      // dominates this inherently sequential loop, and the interpreted
      // per-element HOF lambdas become one fused JVM loop
      val top = state
        .select(col("cnt"), explode(
          graft.plans.SketchExpressions.bpeAdjacentPairs(col("s"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (a, b) = (r.getString(0), r.getString(1))
        learned += Merge(learned.size.toLong, a, b, r.getLong(2))
        if (learned.size < numMerges) {
          // apply ONLY the newest merge (one literal replace), prune
          // words that collapsed to a single token, re-pin; the next
          // round's pair-count job materializes the lazy pin. Measured
          // warm per-round wall at 64 merges on local[32]: ~188 ms with
          // the builtin pair chain, ~122 ms with BpeAdjacentPairs —
          // the rest is fixed job-scheduling cost (a broadcast-pair
          // variant and an eager-pin variant both measured SLOWER),
          // flat in the merge index, and amortized into real work once
          // the vocabulary is production-sized.
          state = Pin.data(
            state.select(col("cnt"),
                replace(col("s"), lit(SEP + a + SEP + SEP + b + SEP),
                  lit(SEP + a + b + SEP)).as("s"))
              .filter(col("s").contains(SEP + SEP)),
            eager = false)
        }
        onRoundNanos.foreach(_(learned.size - 1, System.nanoTime() - roundT0))
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
