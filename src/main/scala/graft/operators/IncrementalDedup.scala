package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

import graft.functions.TextFunctions

/** Incremental exact dedup: which documents of today's INCREMENT are new
  * relative to an already-ingested HISTORY corpus?
  *
  * The naive `increment ANTI JOIN history` shuffles the FULL history key
  * set on every run — at a 100 TB history that is the whole cost of the
  * pipeline, paid daily for a batch that is a thousandth of the corpus.
  * The standard fix is a Bloom prefilter, and the result stays EXACT
  * because the sketch only prunes the definitely-new rows (no false
  * negatives); false positives are resolved by an exact probe:
  *
  *  1. one pass over history builds a Bloom sketch of xxhash64(content
  *     key) — a mergeable tree-aggregate of bounded bit arrays; history
  *     rows never shuffle;
  *  2. the increment is filtered map-side with `might_contain` (the
  *     sketch rides the plan as a binary literal) — the overwhelming
  *     majority of genuinely-new rows exit here with zero join cost;
  *  3. only the surviving candidates (true dups + fpp false positives)
  *     probe history: a second map-only history pass against the
  *     BROADCAST candidate key set finds which keys really exist;
  *  4. the increment anti-joins that (candidate-bounded) matched set.
  *
  * History is read twice and shuffled never. Driver/executor footprint is
  * the sketch itself: ~1.2 bytes x `expectedHistoryKeys` at fpp 3% —
  * size `fpp` up (it only widens the candidate set, never the answer)
  * if the key inventory outgrows memory comfort.
  */
object IncrementalDedup {

  /** Serialize a Spark sketch BloomFilter into a plan-embeddable binary
    * literal probed by the native `might_contain` expression (both sides
    * hash with the sketch's own putLong/mightContainLong pair, so the
    * build and the probe agree bit-for-bit). */
  private def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      ColumnBridge.expression(value)))

  /** Rows of `increment` whose content key (md5 of normalized text) does
    * not occur anywhere in `history`. Exact — the Bloom stage is an
    * optimization, not an approximation. Assumes increment << history
    * (the candidate set is broadcast); for increment-sized-like-history
    * use a bucketed co-located anti-join instead (sources/Bucketing). */
  def newDocs(increment: DataFrame, history: DataFrame, textCol: String,
              expectedHistoryKeys: Long = 1000000L,
              fpp: Double = 0.03): DataFrame = {
    val keyOf = TextFunctions.contentKey(col(textCol))
    val keyed = increment.withColumn("_k", keyOf)
    val histKeys = history.select(keyOf.as("_k"))

    // 1. one mergeable aggregation pass over history
    val bloom = histKeys.select(xxhash64(col("_k")).as("_h"))
      .stat.bloomFilter("_h", expectedHistoryKeys, fpp)
    val bytes = { val bos = new ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }

    // 2. map-side prefilter: definitely-new rows never join anything
    val candidates = keyed.filter(mightContain(bytes, xxhash64(col("_k"))))

    // 3. exact probe: second map-only history pass vs broadcast candidates
    val candKeys = candidates.select(col("_k")).distinct()
    val matched = histKeys.join(broadcast(candKeys), Seq("_k"), "left_semi")
      .distinct()

    // 4. candidate-bounded anti-join settles the false positives
    keyed.join(broadcast(matched), Seq("_k"), "left_anti").drop("_k")
  }
}
