package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

import graft.functions.TextFunctions
import graft.operators.TextDedup

/** Streaming MinHash near-duplicate detection — the streaming twin of
  * the batch LSH family (TextDedup.minHashNearDups): flag each incoming
  * document that is a near-dup of an EARLIER one, across micro-batches,
  * without ever holding the corpus. The state is keyed by LSH band
  * bucket and holds at most `maxBucketSize` (id, signature) members per
  * bucket — the same bounded-bucket contract as the batch path's skew
  * cap, so a boilerplate flood cannot grow state or per-arrival cost.
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
    * (the StatefulDedup pattern). Rows: (bucket, doc_id, seq, sig). */
  private[graft] def bucketUpdate(threshold: Double, numHashes: Int,
                                  maxBucketSize: Int)(
      key: String, rows: Iterator[(String, Long, Long, Seq[Long])],
      state: GroupState[Seq[(Long, Seq[Long])]]): Iterator[(Long, Long, Double)] = {
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
    out.result().iterator
  }

  /** Near-dup hits over a STREAMING frame. Returns (doc_id, dup_of,
    * est_jaccard) in append mode; distinct at read time. */
  def hits(docs: DataFrame, textCol: String, idCol: String, seqCol: String,
           threshold: Double = 0.8, shingleSize: Int = 9,
           bands: Int = 8, rowsPerBand: Int = 4,
           maxBucketSize: Int = 1000): Dataset[(Long, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val sig = docs.select(
      col(idCol).cast("long").as("id"),
      col(seqCol).cast("long").as("seq"),
      TextDedup.minHashSignature(
        TextFunctions.charShingles(col(textCol), shingleSize), k).as("sig"))
    val banded = sig.select(
        explode(array((0 until bands).map { b =>
          concat_ws(":", lit(b), xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))))
        }: _*)).as("bucket"),
        col("id"), col("seq"), col("sig"))
      .as[(String, Long, Long, Seq[Long])]
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bucketUpdate(threshold, k, maxBucketSize))
  }
}
