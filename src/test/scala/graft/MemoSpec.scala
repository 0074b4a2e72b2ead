package graft

import java.lang.ref.WeakReference

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.operators.SessionFrameMemo

/** Drives every clause of [[SessionFrameMemo]]'s lifecycle contract —
  * the shared dedup pair frame (q110/q122's producer/consumer split)
  * rides on this, and its two prior in-registry incarnations each
  * shipped a lifecycle bug (WeakHashMap self-pinning, then the memo
  * validity check), so the contract is pinned here instead of re-read
  * in review. Identity-hash reuse and collected referents are simulated
  * through the test hooks rather than waiting on the GC. */
class MemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(tag: String) = Seq((tag, 1)).toDF("tag", "n")

  test("same-session reuse: one compute per (session, key), frame identical") {
    val memo = new SessionFrameMemo
    var computes = 0
    def get(key: String) = memo.getOrCompute(spark, key) {
      computes += 1; frame(key)
    }
    val a1 = get("dirA")
    val a2 = get("dirA")
    assert(computes == 1)
    assert(a1 eq a2) // the SAME frame object — consumers share the pin
    get("dirB")
    assert(computes == 2) // keys are independent
    assert(memo.sizeForTest == 2)
  }

  test("replaced session under an identity-hash-reused slot recomputes") {
    val memo = new SessionFrameMemo
    // simulate: the slot getOrCompute(spark, ...) will use already holds
    // an entry whose owning session was a DIFFERENT (since-collected)
    // object whose identity hash collided with ours
    val other = spark.newSession()
    val stale = frame("stale")
    memo.installForTest(spark, "dir", new WeakReference(other), stale)
    var computes = 0
    val got = memo.getOrCompute(spark, "dir") { computes += 1; frame("fresh") }
    assert(computes == 1, "a foreign-session entry must not be served")
    assert(!(got eq stale))
    // the slot is REPLACED: next call is a hit on the fresh entry
    val again = memo.getOrCompute(spark, "dir") { computes += 1; frame("x") }
    assert(computes == 1 && (again eq got))
    val (ref, df) = memo.entryForTest(spark, "dir").get
    assert((ref.get eq spark) && (df eq got))
  }

  test("collected referent (weak ref reads null) recomputes, never resurrects") {
    val memo = new SessionFrameMemo
    val deadRef = new WeakReference[SparkSession](spark.newSession())
    deadRef.clear() // deterministic stand-in for "the GC collected it"
    val stale = frame("dead")
    memo.installForTest(spark, "dir", deadRef, stale)
    var computes = 0
    val got = memo.getOrCompute(spark, "dir") { computes += 1; frame("alive") }
    assert(computes == 1 && !(got eq stale))
  }

  test("post-collection eviction: getOrCompute sweeps GC-cleared entries under ANY slot") {
    // the former residual-leak clause, now closed: a dead session's
    // entry is removed by the NEXT getOrCompute, not when its
    // identity-hash slot happens to be reused
    val memo = new SessionFrameMemo
    val deadRef = new WeakReference[SparkSession](spark.newSession())
    deadRef.clear()
    val other = spark.newSession() // a DIFFERENT slot than the dead entry's
    memo.installForTest(other, "leftover", deadRef, frame("dead"))
    assert(memo.sizeForTest == 1)
    memo.getOrCompute(spark, "unrelated")(frame("live"))
    assert(memo.entryForTest(other, "leftover").isEmpty,
      "a cleared-referent entry must be swept even under an untouched slot")
    assert(memo.sizeForTest == 1, "only the live entry remains")
    // a stopped-but-still-referenced session is NOT swept (frames may
    // still be read); `other` stands in — strongly held, never collected
    memo.installForTest(other, "held", new WeakReference(other), frame("held"))
    memo.getOrCompute(spark, "unrelated")(frame("x"))
    assert(memo.entryForTest(other, "held").isDefined)
  }

  test("no self-pinning: replacement drops the memo's only path to the old frame") {
    // the WeakHashMap bug class: value → session → (as map key) value,
    // an unbreakable cycle. Here the key is a plain string and the old
    // frame is unreachable FROM THE MEMO the moment its slot is
    // replaced — observed through a weak reference to the old frame's
    // QueryExecution surviving only until the entry swap.
    val memo = new SessionFrameMemo
    val other = spark.newSession()
    memo.installForTest(spark, "dir", new WeakReference(other), frame("old"))
    val before = memo.entryForTest(spark, "dir").get._2
    memo.getOrCompute(spark, "dir")(frame("new"))
    val after = memo.entryForTest(spark, "dir").get
    assert(!(after._2 eq before), "replacement must swap the stored frame")
    assert(after._1.get eq spark, "replacement must re-own the slot weakly")
    assert(memo.sizeForTest == 1, "replacement must not grow the map")
  }
}
