package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

import graft.functions.TextFunctions
import graft.operators.TextDedup

/** Streaming MinHash near-duplicate detection — the streaming twin of
  * the batch LSH family (TextDedup.minHashNearDups): flag each incoming
  * document that is a near-dup of an EARLIER one, across micro-batches,
  * without ever holding the corpus TEXT — state keeps signatures only.
  * The state is keyed by LSH band bucket and holds at most
  * `maxBucketSize` (id, signature) members per bucket — the same
  * bounded-bucket contract as the batch path's skew cap, so a
  * boilerplate flood cannot grow state or per-arrival cost. Total state
  * still grows with distinct documents unless `stateTtlMs` is set (see
  * [[hits]]).
  *
  * Per arriving doc: the map-only signature projection (native
  * MinHashSig — identical bits to the batch path), an explode to its
  * `bands` buckets, and inside each bucket a comparison against the
  * retained members by SIGNATURE-ESTIMATED Jaccard (matching-minima
  * fraction — the batch path's prefilter statistic; the exact shingle
  * verify needs both documents' shingle sets, which a bounded-state
  * stream deliberately does not keep). For the verbatim/near-verbatim
  * copies a crawl stream mostly carries, estimate and exact agree
  * (spec-asserted against batch pairs on copy fixtures).
  *
  * Output: one hit row (doc_id, dup_of, est_jaccard) per bucket where
  * the pair co-occurred — distinct downstream (a pair sharing n bands
  * emits n identical hits; `dropDuplicates` at read time, kept raw here
  * so the sink stays append-only).
  *
  * Ordering contract: `seqCol` (an arrival/ingest id) makes "earlier"
  * deterministic inside a micro-batch; across batches the batch order
  * rules. First occurrences are never flagged.
  */
object StreamingNearDup {

  /** Per-bucket state transition, exposed for TestGroupState unit tests
    * (the StatefulDedup pattern). Rows: (bucket, doc_id, seq, sig).
    * `ttlMs` (Some = ProcessingTimeTimeout configured on the stream):
    * an idle bucket's members are evicted `ttlMs` after its last
    * arrival, bounding TOTAL state for long-running streams. */
  private[graft] def bucketUpdate(threshold: Double, numHashes: Int,
                                  maxBucketSize: Int,
                                  ttlMs: Option[Long] = None)(
      key: String, rows: Iterator[(String, Long, Long, Seq[Long])],
      state: GroupState[Seq[(Long, Seq[Long])]]): Iterator[(Long, Long, Double)] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var members = state.getOption.getOrElse(Seq.empty)
    val out = Seq.newBuilder[(Long, Long, Double)]
    rows.toSeq.sortBy(_._3).foreach { case (_, id, _, sig) =>
      members.foreach { case (oid, osig) =>
        if (oid != id) {
          var m = 0
          var i = 0
          while (i < numHashes) {
            if (sig(i) == osig(i)) m += 1
            i += 1
          }
          val est = m.toDouble / numHashes
          if (est >= threshold) out += ((id, oid, est))
        }
      }
      // retain up to the cap; re-arrivals of a retained id don't duplicate
      if (members.size < maxBucketSize && !members.exists(_._1 == id))
        members = members :+ (id -> sig)
    }
    state.update(members)
    ttlMs.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** Near-dup hits over a STREAMING frame. Returns (doc_id, dup_of,
    * est_jaccard) in append mode; distinct at read time.
    *
    * State bound: the per-bucket cap bounds EACH bucket, but the number
    * of buckets grows with distinct documents (~bands buckets × one
    * 32-long signature per retained doc), so with `stateTtlMs = None` a
    * long-running crawl stream accumulates state indefinitely — the
    * "without ever holding the corpus" contract covers raw text only,
    * not signatures. Pass `stateTtlMs = Some(ms)` to evict buckets idle
    * for `ms` of processing time (ProcessingTimeTimeout): dup detection
    * then only reaches back `ms` — the sliding-recency trade-off every
    * bounded-state streaming dedup makes (same knob as StatefulDedup's
    * eviction, soak-tested in StreamingSoakSpec). */
  def hits(docs: DataFrame, textCol: String, idCol: String, seqCol: String,
           threshold: Double = 0.8, shingleSize: Int = 9,
           bands: Int = 8, rowsPerBand: Int = 4,
           maxBucketSize: Int = 1000,
           stateTtlMs: Option[Long] = None,
           sigOf: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
             TextDedup.minHashSignature,
           bandHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
             xxhash64(_)): Dataset[(Long, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val sig = docs.select(
      col(idCol).cast("long").as("id"),
      col(seqCol).cast("long").as("seq"),
      sigOf(TextFunctions.charShingles(col(textCol), shingleSize), k).as("sig"))
    val banded = sig.select(
        explode(array((0 until bands).map { b =>
          concat_ws(":", lit(b), bandHash(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))))
        }: _*)).as("bucket"),
        col("id"), col("seq"), col("sig"))
      .as[(String, Long, Long, Seq[Long])]
    val timeout = if (stateTtlMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], (Long, Long, Double)](
        OutputMode.Append, timeout)(
        bucketUpdate(threshold, k, maxBucketSize, stateTtlMs))
  }
}
