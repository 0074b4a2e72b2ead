package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EventWindows, StatefulDedup}

/** Bounded state-soak runs for the stateful streaming operators: the
  * 100x-scale risk in the streaming surface is STATE GROWTH, so these
  * tests drive many micro-batches with an unbounded key/window domain
  * and assert — via the engine's own StateOperatorProgress metrics —
  * that TTL / watermark eviction keeps state far below the cumulative
  * domain size. Per-micro-batch semantics live in StreamingSpec; this
  * suite only pins the eviction behavior those semantics rely on.
  */
class StreamingSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Max state rows any batch of `q` reported for operator 0. */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq.flatMap(_.stateOperators.headOption.map(_.numRowsTotal))

  test("firstOccurrence TTL contract: emit once, evict on timeout, re-admit after") {
    // ProcessingTimeTimeout queries never go quiescent (timeout-sweep
    // batches are scheduled forever), so the EVICTION CONTRACT is pinned
    // deterministically against Spark's own TestGroupState harness; the
    // live-query soak below covers the wiring.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.{Optional => JOpt}
    val fn = StatefulDedup.firstOccurrenceUpdate(Some("1 second")) _
    def st(opt: Option[Boolean], timedOut: Boolean) = TestGroupState.create[Boolean](
      optionalState = opt.map(b => JOpt.of(Boolean.box(b).booleanValue()))
        .getOrElse(JOpt.empty[Boolean]()),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = JOpt.empty[java.lang.Long]().asInstanceOf[JOpt[Long]],
      hasTimedOut = timedOut)

    // fresh key: first row emitted, rest of batch dropped, TTL armed
    val fresh = st(None, timedOut = false)
    assert(fn("k1", Iterator(("k1", "p1"), ("k1", "p2")), fresh).toSeq == Seq(("k1", "p1")))
    assert(fresh.get && fresh.getTimeoutTimestampMs.isPresent)
    // seen key: suppressed, state untouched
    val seen = st(Some(true), timedOut = false)
    assert(fn("k1", Iterator(("k1", "p3")), seen).isEmpty && seen.exists)
    // TTL fired: state REMOVED — this is what keeps state O(live keys)
    val expired = st(Some(true), timedOut = true)
    assert(fn("k1", Iterator.empty, expired).isEmpty)
    assert(expired.isRemoved)
    // re-arrival after eviction: emitted again (the documented trade)
    val back = st(None, timedOut = false)
    assert(fn("k1", Iterator(("k1", "p4")), back).toSeq == Seq(("k1", "p4")))
  }

  test("firstOccurrence TTL live query: state tracks waves, not history") {
    // Live wiring check: waves of fresh keys through a running query,
    // driven by SINK counts (not processAllAvailable — see above), with
    // TTL sleeps between waves so earlier waves are evicted.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val deduped = StatefulDedup.firstOccurrence(
      input.toDF().withColumnRenamed("value", "k"), "k",
      stateTtl = Some("1 second"))
    val q = deduped.writeStream.format("memory").queryName("soak_dedup")
      .outputMode("append").start()
    def awaitCount(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("soak_dedup").count() < n) {
        assert(System.currentTimeMillis() < deadline, s"sink never reached $n rows")
        Thread.sleep(100)
      }
    }
    try {
      val waves = 3; val waveSize = 200
      val perWave = (0 until waves).map { w =>
        val keys = (0L until waveSize).map(_ + w * 10000L)
        input.addData(keys ++ keys: _*) // each key twice: in-batch dedup too
        awaitCount((w + 1).toLong * waveSize)
        Thread.sleep(1500) // > TTL: this wave is due for eviction
        // deadline-poll the eviction instead of trusting one sleep — this
        // host's contention bursts can stall the timeout sweep past any
        // fixed pause (BASELINE.md variance caveat); the CLAIM is that
        // eviction happens, not that it happens within 1.5 s
        val deadline = System.currentTimeMillis() + 20000
        var last = stateRows(q).lastOption.getOrElse(0L)
        while (last > 2L * waveSize && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          last = stateRows(q).lastOption.getOrElse(0L)
        }
        last
      }
      assert(spark.table("soak_dedup").count() == waves.toLong * waveSize)
      // cumulative domain is 600 keys; eviction keeps any snapshot near
      // one wave (the sleep ran timeout sweeps before each measurement)
      assert(perWave.max <= 2L * waveSize,
        s"state grew with history: per-wave numRowsTotal=$perWave")
    } finally q.stop()
  }

  test("firstOccurrence WITHOUT TTL accumulates (the contrast case)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val deduped = StatefulDedup.firstOccurrence(
      input.toDF().withColumnRenamed("value", "k"), "k", stateTtl = None)
    val q = deduped.writeStream.format("memory").queryName("soak_nottl")
      .outputMode("append").start()
    try {
      for (w <- 0 until 3) {
        input.addData((0L until 100L).map(_ + w * 10000L): _*)
        q.processAllAvailable()
      }
      // no eviction: state is exactly the cumulative distinct-key count —
      // this is WHY stateTtl exists for unbounded key domains
      assert(stateRows(q).max == 300L)
    } finally q.stop()
  }

  test("streaming CMS register sink counts bit-identically to batch") {
    import graft.operators.Sketches
    // two micro-batches into one hour-window, accumulated in the STATE
    // STORE and emitted ONCE when a later batch's watermark closes the
    // window (append mode — sum-merge is not idempotent, so update-mode
    // re-emissions would double-count; see frequencyRegisters scaladoc).
    // Probing the emitted rows must equal the batch sketch — exactly.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = (1 to 300).map(i => (ts("2024-01-01 10:10:00"), s"k${i % 7}"))
    val b2 = (1 to 200).map(i => (ts("2024-01-01 10:40:00"), s"k${i % 13}"))
    val flush = Seq((ts("2024-01-01 14:00:00"), "late-window-opener"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    input.addData(b1: _*)
    val regs = graft.streaming.EventWindows.frequencyRegisters(
      input.toDF().toDF("ts", "k"), "ts", "k", "1 hour", lateness = "2 hours")
    val q = regs.writeStream.format("memory").queryName("cmsregs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      input.addData(flush: _*) // watermark -> 12:00, closes the 10:00 window
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("cmsregs")
      .filter(col("window_start") === ts("2024-01-01 10:00:00"))
      .select("_cms_d", "_cms_b", "_cms_n")
    // append emitted each register exactly once — no re-emission rows
    assert(emitted.groupBy("_cms_d", "_cms_b").count()
      .filter(col("count") > 1).count() == 0)
    val all = (b1 ++ b2).toDF("ts", "k")
    val probes = all.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val streamed = Sketches.cmsEstimate(emitted, probes, "k", Nil)
      .as[(String, Long, Long)].collect()
      .map { case (k, ex, e) => k -> (ex, e) }.toMap
    val batch = Sketches.cmsEstimate(
      Sketches.cmsRegisters(all, col("k"), Nil), probes, "k", Nil)
      .as[(String, Long, Long)].collect()
      .map { case (k, ex, e) => k -> (ex, e) }.toMap
    assert(streamed == batch)
    streamed.foreach { case (k, (ex, e)) => assert(e >= ex, s"$k undercounted") }
  }

  test("TTL-armed near-dup sink run terminates and hash-matches the batch twin") {
    // Regression gate for the drain-then-stop shutdown path
    // (StreamHarness.nearDupSinkRunWith, stateTtlMs branch): under
    // ProcessingTimeTimeout, shouldRunAnotherBatch is always true, so
    // the harness must disable no-data micro-batches for AvailableNow to
    // self-terminate — the r9 regression was processAllAvailable()
    // parking forever while empty timeout-sweep batches churned. This
    // test IS the termination assertion (it completes or times out), and
    // additionally pins sink==batch parity and conf restoration.
    import graft.streaming.StreamHarness
    val sfDir = "/root/testdata/sf0.001"
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val before = spark.conf.getOption(key)
    val streamed = StreamHarness.nearDupSinkRunTtl(spark, sfDir)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(spark.conf.getOption(key) == before, "harness leaked the conf override")
    assert(streamed.nonEmpty, "TTL-armed stream emitted no dup pairs")
    val batch = StreamHarness.nearDupBatch(spark, sfDir)
      .toDF("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(streamed == batch,
      s"TTL-armed stream diverged from batch twin: ${streamed.size} vs ${batch.size} pairs")
  }

  test("exactDedupSinkRun: copies in a later batch are dropped, originals kept") {
    // The q133 harness end-to-end at sf0.001: sink must equal the
    // dedup-free original set (one row per distinct text, min doc_id) —
    // every planted copy (id >= 10e6, arriving in the later landing
    // files against armed dropDuplicatesWithinWatermark state) dropped,
    // no original over-dropped.
    import graft.streaming.StreamHarness
    val sfDir = "/root/testdata/sf0.001"
    val sink = StreamHarness.exactDedupSinkRun(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(sink == want,
      s"sink kept ${sink.count(_ >= 10000000L)} copies and " +
        s"${(want -- sink).size} originals are missing")
    assert(sink.nonEmpty && sink.forall(_ < 10000000L))
  }

  test("approxDistinctRegisters state is bounded by open windows, not seen windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "v")
    val regs = EventWindows.approxDistinctRegisters(
      events, "ts", "v", width = "1 minute", lateness = "1 minute")
    val q = regs.writeStream.format("memory").queryName("soak_hll")
      .outputMode("append").start()
    try {
      val windows = 30; val perWindow = 300
      val t0 = 1700000000000L
      for (w <- 0 until windows) {
        // one micro-batch per event-time minute; values are globally
        // unique so every batch pushes new registers
        input.addData((0 until perWindow).map(i =>
          (new java.sql.Timestamp(t0 + w * 60000L + (i % 60) * 1000L),
            w * 100000L + i)): _*)
        q.processAllAvailable()
      }
      val rows = stateRows(q)
      assert(rows.nonEmpty)
      // 30 windows x <=256 registers have PASSED THROUGH (7680 max rows
      // had nothing been evicted); the watermark must keep live state to
      // the few windows still inside the lateness horizon
      assert(rows.max <= 256L * 5,
        s"state grew with seen windows: per-batch numRowsTotal=$rows")
      // the emitted register table still covers the closed windows:
      // watermark = maxTs - 1 minute finalizes all but the tail windows
      val emitted = spark.table("soak_hll")
        .select("window_start").distinct().count()
      assert(emitted >= windows - 3, s"only $emitted windows finalized")
    } finally q.stop()
  }
}
