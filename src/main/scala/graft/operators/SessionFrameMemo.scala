package graft.operators

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memo — "compute this expensive frame ONCE
  * per (session, key) and hand it to every downstream consumer" (the
  * shared dedup pair frame q110/q122 reuse; in a 100 TB pipeline the
  * dedup stage has already paid for that frame, and recomputing the LSH
  * pipeline inside every consumer would double the most expensive
  * stage).
  *
  * Lifecycle contract, explicit (MemoSpec drives each clause):
  *
  *  - SAME-SESSION REUSE: a hit requires the cached entry's session to
  *    be the SAME OBJECT (`eq`) as the caller's — the compute body runs
  *    once per (session, key).
  *  - REPLACED-SESSION INVALIDATION: the map key uses the session's
  *    identity hash, which the JVM may REUSE after the original session
  *    is collected. Validity is therefore checked by identity against a
  *    [[WeakReference]] to the owning session: a collision or a
  *    collected referent reads `null`/other ≠ caller → recompute and
  *    replace. A stale session's frame can never be resurrected into a
  *    new session.
  *  - NO SELF-PINNING KEYS (the WeakHashMap bug class this replaces): a
  *    WeakHashMap keyed by the session would be self-defeating — a
  *    DataFrame strongly references its session, so the VALUE would pin
  *    its own KEY forever and no entry could ever be collected. Here
  *    keys are plain strings and the session is held only weakly;
  *    the one strong session path is through the cached frame itself.
  *    The one strong session path is through the cached frame itself,
  *    so once callers drop a session's frames the session can be
  *    collected — and every [[getOrCompute]] SWEEPS entries whose
  *    referent the GC has cleared (O(sessions × keys), trivially small),
  *    so dead entries do not linger until their key slot happens to be
  *    reused. A stopped-but-still-strongly-referenced session's entry
  *    survives the sweep by design (its frames may still be read);
  *    `stop()` frees the executor memory regardless.
  *  - NO LOCK DURING COMPUTE: two racing threads may both build the
  *    frame and last-write wins — benign duplication, preferred over
  *    serializing unrelated sessions behind a minutes-long LSH job.
  */
final class SessionFrameMemo {

  private val entries =
    new ConcurrentHashMap[String, (WeakReference[SparkSession], DataFrame)]()

  def getOrCompute(s: SparkSession, key: String)
                  (compute: => DataFrame): DataFrame = {
    // sweep GC-cleared referents first: dead sessions' entries go now,
    // not when their identity-hash slot is eventually reused
    val it = entries.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue._1.get == null) it.remove()
    val k = System.identityHashCode(s) + "|" + key
    val cur = entries.get(k)
    if (cur != null && (cur._1.get eq s)) cur._2
    else {
      val df = compute
      entries.put(k, (new WeakReference(s), df))
      df
    }
  }

  // ---- test hooks (MemoSpec): install/inspect an entry under the slot
  // getOrCompute would use for `s`, simulating identity-hash reuse and
  // collected referents deterministically instead of waiting on the GC.
  private[graft] def installForTest(s: SparkSession, key: String,
                                    ref: WeakReference[SparkSession],
                                    df: DataFrame): Unit =
    entries.put(System.identityHashCode(s) + "|" + key, (ref, df))

  private[graft] def entryForTest(s: SparkSession, key: String)
      : Option[(WeakReference[SparkSession], DataFrame)] =
    Option(entries.get(System.identityHashCode(s) + "|" + key))

  private[graft] def sizeForTest: Int = entries.size()
}
