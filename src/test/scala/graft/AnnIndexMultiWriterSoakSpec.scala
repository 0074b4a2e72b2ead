package graft

import java.util.concurrent.{Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Sq}
import graft.sources.AnnIndex

/** Concurrent multi-writer crash soak of the optimistic commit protocol
  * ([[graft.sources.AnnIndex]]) — the missing leg between
  * AnnIndexConcurrencySpec's hand-picked deterministic interleavings and
  * AnnIndexCrashSoakSpec's single-walker random deaths: N writer THREADS
  * race seeded random verbs (append / upsert / delete / compact / merge
  * / expire) against ONE index, with seeded kill points armed into the
  * shared dir so the crash lands on WHICHEVER writer reaches the point
  * next — arbitrary death under arbitrary contention, the 100 TB
  * operating condition (the streaming ingester, the takedown job and
  * the nightly compactor are separate processes that all die sometimes).
  *
  * What is asserted, and why it is interleaving-independent:
  *  - DISJOINT-KEY STORM (both tiers): each writer owns a private id
  *    space and applies its committed verbs to a private ledger; since
  *    no two writers touch the same key, the union of the ledgers IS
  *    the result of EVERY serializable order of the committed verbs —
  *    so "visible rows == union" at each phase barrier and at the end
  *    proves no commit was lost, duplicated, resurrected or torn by a
  *    racing writer, regardless of which interleaving the storm
  *    actually took. The end check is exact code-level multiset
  *    equality against a deterministic re-encode of the ground truth
  *    (per-row encode is deterministic), plus the search-hash check
  *    against a crash-free fresh build — the same final gate the
  *    single-walker soak uses.
  *  - CONTESTED-KEY STORM (upserts of a SHARED id pool): under
  *    contention the winner per key is whichever upsert committed last
  *    — any of the committed candidates is a correct serializable
  *    outcome — so the assertions are the interleaving-independent
  *    core of upsert atomicity: every pool id stays EXACTLY-ONCE visible
  *    (a torn tombstone+segment pair would leave 0 or 2 rows), and its
  *    visible codes are bit-equal to the encode of ONE committed
  *    candidate (never a mix, never a vector that lost and resurrected,
  *    never one that was only staged). Which candidate won is genuinely
  *    order-dependent and is pinned by AnnIndexConcurrencySpec's
  *    deterministic interleavings instead.
  *  - WEDGE RECOVERY UNDER CONTENTION: a publish-torn death wedges the
  *    chain for EVERY writer (all fail loudly on the truncated top
  *    manifest); every wedged writer calls repair itself, CONCURRENTLY
  *    and un-serialized (repair is contractually concurrent-safe — see
  *    its doc and AnnIndexRepairRaceSpec), respecting the STALE
  *    WINDOW — `repair(staleAfterMs = 1200)` retried past
  *    IllegalStateException — because with concurrent writers a
  *    `staleAfterMs = -1` repair (what the single-walker soak can
  *    safely use) could catch ANOTHER writer's microseconds-old
  *    in-flight publish between its create and its body write and
  *    delete a commit that was about to succeed — exactly the hazard
  *    the production stale window exists for, and this spec exercises
  *    the production recovery discipline, not the single-writer
  *    shortcut.
  *
  * dedupKey is None throughout: the keyed contract is a SINGLE logical
  * stream's replay namespace (see [[AnnIndex.appendIvfPq]]) — racing
  * independent writers with shared keys would suppress each other's
  * commits by design, and the keyed replay path is already soaked by
  * the single-walker spec's streaming leg. */
class AnnIndexMultiWriterSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  private def vec(id: Long, gen: Int): Seq[Float] = {
    val rng = new scala.util.Random(id * 7919L + gen * 104729L)
    val base = Array.tabulate(dim)(j =>
      if (j == (id % 4).toInt * 2) 10.0f else 0.0f)
    base.map(x => x + rng.nextGaussian().toFloat * 0.2f).toSeq
  }

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  private def ivfModel(e: org.apache.spark.sql.DataFrame) = {
    val cents = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(graft.functions.VectorFunctions.normalize(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    import graft.plans.SketchExpressions.nearestCentroids
    val samples = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .select(Pq.residualExpr(col("embedding"),
        element_at(nearestCentroids(col("embedding"), cents, 1), 1), cents).as("r"))
      .collect().map(_.getSeq[Double](0).toArray)
    (cents, Pq.codebooks(samples, m = 4))
  }

  private def causeChain(t: Throwable): Iterator[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)

  /** Wedge recovery — deliberately UN-serialized: every wedged writer
    * calls repair directly, concurrently, exactly as production's
    * separate processes would (no shared JVM mutex exists there). The
    * round-16 spec serialized these through a test-side gate because
    * repair raced getFileStatus against a peer's delete; repair is now
    * contractually concurrent-safe by SUPERSEDE-NEVER-DELETE: it
    * republishes the last complete generation over the corpse through
    * the put-if-absent committer (one winner; losers re-evaluate) and
    * never frees a contended slot — see its doc; this soak plus
    * AnnIndexRepairRaceSpec hold it to that. Stale-window-respecting (see class doc): an
    * incomplete top manifest younger than the window is an IN-FLIGHT
    * publish — wait for it to either complete (repair then reports
    * healthy) or age into a corpse (repair then supersedes it). */
  private def unwedge(dir: String): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      assert(attempts <= 60, s"unwedge($dir) did not converge")
      try { AnnIndex.repair(spark, dir, staleAfterMs = 1200); done = true }
      catch {
        case _: IllegalStateException => Thread.sleep(300) // in-flight
        case _: AnnIndex.InjectedCrash =>
          // a kill armed by a CONCURRENT writer fired inside THIS
          // repairer's own supersede publish (repair shares tryPublish's
          // publish-torn seam) — a repairer dying mid-supersede is just
          // another dead writer, and the documented runbook is to re-run
          // repair; the retry loop does exactly that
      }
    }
  }

  // SEED MATRIX: one passing storm on one seed proves little — the
  // round-16 SQ8 catch (an unclassified ChecksumException wedge) was
  // scheduler-luck on a single seed. Each tier runs THREE seeds: the
  // original at full depth, plus two trimmed-but-kill-boosted seeds
  // (fewer rounds, higher kill probability — different interleaving
  // families at bounded wall, with the per-seed kill-point-coverage
  // assertion still satisfiable).
  for ((seed, i) <- Seq(16161L, 16171L, 16181L).zipWithIndex)
    test(s"multi-writer crash soak: IVF-PQ tier — 3 writers x seeded verbs x seeded kill points, seed $seed") {
      if (i == 0)
        runStorm("ivf", nWriters = 3, phases = 4, roundsPerPhase = 10,
          seed = seed)
      else
        runStorm("ivf", nWriters = 3, phases = 2, roundsPerPhase = 8,
          seed = seed, boostKills = true)
    }

  for ((seed, i) <- Seq(16162L, 16172L, 16182L).zipWithIndex)
    test(s"multi-writer crash soak: SQ8 tier — 3 writers x seeded verbs x seeded kill points, seed $seed") {
      if (i == 0)
        runStorm("sq", nWriters = 3, phases = 4, roundsPerPhase = 10,
          seed = seed)
      else
        runStorm("sq", nWriters = 3, phases = 2, roundsPerPhase = 8,
          seed = seed, boostKills = true)
    }

  private def runStorm(tier: String, nWriters: Int, phases: Int,
                       roundsPerPhase: Int, seed: Long,
                       boostKills: Boolean = false): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory(s"ann_mw_$tier").toString
    val dir = s"$root/idx"
    // wedged chains are read (loudly) many times; scoped to THIS dir
    AnnIndex.manifestRetryOverride.put(dir, 2)
    try stormImpl(tier, nWriters, phases, roundsPerPhase, seed, root, dir,
      boostKills)
    finally {
      AnnIndex.manifestRetryOverride.remove(dir)
      AnnIndex.testKillPoint.remove(dir)
    }
  }

  private def stormImpl(tier: String, nWriters: Int, phases: Int,
                        roundsPerPhase: Int, seed: Long, root: String,
                        dir: String, boostKills: Boolean): Unit = {
    // base corpus (ids 0..39 — nobody's id space; never mutated) seeds
    // the index and the frozen model both tiers encode against
    val baseRows = (0L until 40L).map(i => (i, vec(i, 0)))
    val e0 = df(baseRows)
    val (cents, cbs) = ivfModel(e0)
    val sqM = Sq.fit(e0, "embedding")
    if (tier == "ivf")
      AnnIndex.buildIvfPq(e0, "vec_id", "embedding", dir, cents, cbs)
    else
      AnnIndex.buildSq(e0, "vec_id", "embedding", dir, sqM, Some(cents))

    // per-writer state: disjoint id space, private committed ledger,
    // private seeded RNG (deterministic verb/kill sequences; only the
    // INTERLEAVING is nondeterministic — the assertions don't need it)
    // curSqCents: the SQ coarse quantizer of the moment — the barrier
    // interludes below grow it (rebalanceSq/splitCellSq), and merge
    // shards must be built against the grown table or mergeSq's
    // model-mismatch require rejects them. Updated ONLY at barriers
    // (writers quiesced), read freely by writer rounds.
    @volatile var curSqCents = cents
    val ledgers = Array.fill(nWriters)(
      scala.collection.mutable.LinkedHashMap[Long, Seq[Float]]())
    val rngs = Array.tabulate(nWriters)(w => new scala.util.Random(seed + w))
    val nextIds = Array.tabulate(nWriters)(w => 1000000L * (w + 1))
    val fired = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    def firedInc(p: String): Unit =
      fired.computeIfAbsent(p, _ =>
        new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
    val shardCounter = new java.util.concurrent.atomic.AtomicInteger

    def groundTruth: Seq[(Long, Seq[Float])] =
      baseRows ++ ledgers.flatMap(_.toSeq)

    def visibleCodes() = {
      val codes =
        if (tier == "ivf") AnnIndex.load(spark, dir).codes
        else AnnIndex.loadSq(spark, dir).codes
      codes.select("neighbor_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    def checkVisible(at: String): Unit = {
      val got = visibleCodes()
      val want = groundTruth.map(_._1).sorted
      assert(got == want,
        s"[$tier/$at] visible ids != union of committed ledgers: " +
          s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    }

    def writerRound(w: Int): Unit = {
      val rng = rngs(w)
      val ledger = ledgers(w)
      def freshIds(n: Int): Seq[Long] = {
        val ids = (nextIds(w) until nextIds(w) + n).toSeq
        nextIds(w) += n; ids
      }
      val v = rng.nextDouble()
      var verb =
        if (v < 0.25) "append" else if (v < 0.45) "upsert"
        else if (v < 0.60) "delete" else if (v < 0.72) "compact"
        else if (v < 0.87) "merge" else "expire"
      if ((verb == "upsert" || verb == "delete") && ledger.size < 5)
        verb = "append"

      val gen = rng.nextInt(1 << 20)
      val rows: Seq[(Long, Seq[Float])] = verb match {
        case "append" => freshIds(4).map(i => (i, vec(i, gen)))
        case "merge" => freshIds(3).map(i => (i, vec(i, gen)))
        case "upsert" =>
          rng.shuffle(ledger.keys.toVector).take(3).map(i => (i, vec(i, gen)))
        case _ => Seq.empty
      }
      val delIds: Seq[Long] =
        if (verb == "delete") rng.shuffle(ledger.keys.toVector).take(2)
        else Seq.empty
      val srcDir: String = if (verb == "merge") {
        val d = s"$root/shard${shardCounter.incrementAndGet()}"
        if (tier == "ivf")
          AnnIndex.buildIvfPq(df(rows), "vec_id", "embedding", d, cents, cbs)
        else
          AnnIndex.buildSq(df(rows), "vec_id", "embedding", d, sqM,
            Some(curSqCents))
        d
      } else ""

      def runVerb(): Unit = (tier, verb) match {
        case ("ivf", "append") =>
          AnnIndex.appendIvfPq(df(rows), "vec_id", "embedding", dir)
        case ("ivf", "upsert") =>
          AnnIndex.upsertBatchIvfPq(df(rows), "vec_id", "embedding", dir)
        case ("ivf", "merge") => AnnIndex.merge(spark, dir, srcDir)
        case ("sq", "append") =>
          AnnIndex.appendSq(df(rows), "vec_id", "embedding", dir)
        case ("sq", "upsert") =>
          AnnIndex.upsertBatchSq(df(rows), "vec_id", "embedding", dir)
        case ("sq", "merge") => AnnIndex.mergeSq(spark, dir, srcDir)
        case (_, "delete") =>
          AnnIndex.delete(delIds.toDF("vec_id"), "vec_id", dir)
        case (_, "compact") => AnnIndex.compact(spark, dir)
        case (_, "expire") =>
          // generous keepLast: concurrent expire is under test, but a
          // writer's pinned generation falling out from under it should
          // stay the rare raced path, not every round's
          AnnIndex.expire(spark, dir, keepLast = 6)
        case other => fail(s"unknown verb $other")
      }

      // arm a seeded kill into the SHARED dir — whoever reaches the
      // point next takes the death (arbitrary victim, by design)
      val k = rng.nextDouble()
      val kill =
        if (verb == "expire") { if (k < 0.6) "" else "expire-torn" }
        else if (boostKills) {
          // trimmed matrix seeds: fewer rounds, so kill more often —
          // keeps every point's expected fire count well above the
          // per-seed coverage bar at a fraction of the full-depth wall
          if (k < 0.30) "" else if (k < 0.475) "stage"
          else if (k < 0.65) "staged" else if (k < 0.825) "publish-torn"
          else "published"
        }
        else if (k < 0.50) "" else if (k < 0.62) "stage"
        else if (k < 0.74) "staged" else if (k < 0.87) "publish-torn"
        else "published"
      if (kill.nonEmpty) AnnIndex.testKillPoint.put(dir, kill)

      // execute with the documented multi-writer runbook
      var done = false
      var committed = false
      var attempts = 0
      while (!done) {
        attempts += 1
        assert(attempts <= 15, s"[$tier/w$w] $verb did not converge")
        try { runVerb(); done = true; committed = true }
        catch {
          case c: AnnIndex.InjectedCrash =>
            firedInc(c.point)
            c.point match {
              case "published" =>
                // the commit is durable; the caller just never heard —
                // without a dedup key a blind re-run would double-apply,
                // so the runbook is: verify-then-stop (here: stop; the
                // phase barrier verifies)
                done = true; committed = true
              case "publish-torn" =>
                // every writer is now wedged; recover through the
                // stale-window repair gate, then re-run
                unwedge(dir)
              case _ => // stage/staged/expire-torn: nothing visible (or
                        // a durable partial for expire) — re-run
            }
          case e: java.io.IOException
              if e.getMessage != null && e.getMessage.contains("truncated") =>
            // someone ELSE's torn wedge (or a live publish outrunning
            // this suite's tiny 50 ms reader budget): recover, re-run
            unwedge(dir)
          case e: IllegalArgumentException
              if e.getMessage != null &&
                e.getMessage.contains("expired or never published") =>
            // a concurrent expire dropped the generation this verb had
            // pinned between refresh and load — re-run on the fresh one
          case e: Throwable
              if causeChain(e).exists {
                case fnf: java.io.FileNotFoundException =>
                  // NARROW guard (a blanket FNFE retry would mask
                  // genuine write-path bugs as benign raced expires):
                  // only the known raced-expire surface — a reclaimed
                  // data/tomb segment or model artifact under THIS
                  // index — re-runs; any other FNFE fails the soak
                  val m = Option(fnf.getMessage).getOrElse("")
                  m.contains(dir) && (m.contains("/data/") ||
                    m.contains("/tomb/") || m.contains("/model-"))
                case _ => false
              } =>
            // a concurrent expire reclaimed a dropped generation's
            // artifact out from under this verb's pinned scan — re-run
        }
      }
      // the ledger is single-owner (only writer w mutates it; the
      // barrier reads it after the phase's futures are joined)
      if (committed) verb match {
        case "append" | "upsert" | "merge" =>
          rows.foreach { case (i, vv) => ledger(i) = vv }
        case "delete" => delIds.foreach(ledger.remove)
        case _ => // compact/expire never change the visible set
      }
    }

    // SQ MAINTENANCE INTERLUDE — splitCellSq / rebalanceSq inside the
    // storm, run at the phase BARRIER (writers quiesced): the verbs'
    // corpus contract needs a consistent snapshot of the raw vectors
    // (a free-running pass could read a ledger mid-upsert and re-key a
    // row from a stale vector — a caller contract violation, not a
    // protocol property), and the storm's value here is arbitrary
    // death on the crash-debris-laden contended index: seeded kills,
    // the repair runbook, and the grown table feeding the NEXT phase's
    // contention (appends/merges/upserts all run against it). The
    // in-flight-race abort (a writer committing mid-policy) is pinned
    // deterministically by AnnRebalanceSpec's competing-commit test.
    // SQ-only by the same reasoning that keeps retrain out of the
    // storm: an IVF split re-encodes rows, which would break END GAME
    // 1's frozen-model code equality; the SQ split is a pure re-key
    // (codes bit-identical), so every end-game assertion survives it.
    val maintRng = new scala.util.Random(seed ^ 0x5DEECE66DL)
    def sqInterlude(phase: Int): Unit = {
      val corpus = df(groundTruth) // barrier: ledgers quiesced
      val k = maintRng.nextDouble()
      val kill =
        if (k < 0.25) "" else if (k < 0.45) "stage"
        else if (k < 0.65) "staged" else if (k < 0.85) "publish-torn"
        else "published"
      if (kill.nonEmpty) AnnIndex.testKillPoint.put(dir, kill)
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        assert(attempts <= 10, "[sq] maintenance interlude did not converge")
        try {
          if (phase % 2 == 1)
            AnnIndex.rebalanceSq(corpus, "vec_id", "embedding", dir,
              maxImbalance = 2.0, maxSplits = 2): Unit
          else {
            val idx = AnnIndex.loadSq(spark, dir)
            val byCell = idx.codes
              .select(col("cell").cast("int"), col("neighbor_id"))
              .collect().groupBy(_.getInt(0))
            val (cell, members) = byCell.maxBy(_._2.length)
            val truthMap = groundTruth.toMap
            val m0 = truthMap(members.head.getLong(1))
              .map(_.toDouble).toArray
            AnnIndex.splitCellSq(corpus, "vec_id", "embedding", dir,
              cell, Array(m0, m0.map(_ + 0.5)))
          }
          done = true
        } catch {
          case c: AnnIndex.InjectedCrash =>
            firedInc(c.point)
            c.point match {
              case "published" => done = true
              case "publish-torn" => unwedge(dir)
              case _ => // stage/staged: nothing visible — re-run
            }
        }
      }
      AnnIndex.testKillPoint.remove(dir)
      curSqCents = AnnIndex.loadSq(spark, dir).centroids
        .getOrElse(curSqCents)
      checkVisible(s"phase $phase post-maintenance")
    }

    // phases of free-running contention with a serializability barrier
    // between them (writers quiesce; the visible set must equal the
    // union of the committed ledgers — true of every serial order)
    val pool = Executors.newFixedThreadPool(nWriters)
    try {
      for (phase <- 1 to phases) {
        val futures = (0 until nWriters).map { w =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit =
              for (_ <- 1 to roundsPerPhase) writerRound(w)
          })
        }
        futures.foreach(_.get(300, TimeUnit.SECONDS))
        AnnIndex.testKillPoint.remove(dir) // a lingering unconsumed arm
        checkVisible(s"phase $phase barrier")
        if (tier == "sq") sqInterlude(phase)
      }
    } finally pool.shutdownNow()

    // the seeds must actually have exercised every kill point
    Seq("stage", "staged", "publish-torn", "published").foreach { p =>
      val n = Option(fired.get(p)).fold(0)(_.get)
      assert(n >= 2, s"[$tier] kill point '$p' fired only $n times under " +
        "contention — reweight the seed")
    }

    // END GAME 1: exact code-level equality — the visible (cell, codes)
    // multiset must equal a deterministic re-encode of the ground truth
    // (per-row encode is deterministic, so this catches a single
    // flipped byte anywhere in any surviving segment)
    val truth = groundTruth
    if (tier == "ivf") {
      val got = AnnIndex.load(spark, dir).codes
        .select(col("neighbor_id"), col("_cell").cast("int"), col("codes"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Any](2)))
        .sortBy(_._1).toSeq
      val want = Pq.ivfPqEncode(df(truth), "vec_id", "embedding", cents, cbs)
        .select(col("neighbor_id"), col("_cell").cast("int"), col("codes"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Any](2)))
        .sortBy(_._1).toSeq
      assert(got == want, s"[$tier] surviving codes diverged from a " +
        "deterministic re-encode of the committed ground truth")
    } else {
      val got = AnnIndex.loadSq(spark, dir).codes
        .select(col("neighbor_id"), col("codes"))
        .collect().map(r => (r.getLong(0), r.getSeq[Any](1)))
        .sortBy(_._1).toSeq
      val want = Sq.encode(df(truth), "vec_id", "embedding", sqM)
        .select(col("neighbor_id"), col("codes"))
        .collect().map(r => (r.getLong(0), r.getSeq[Any](1)))
        .sortBy(_._1).toSeq
      assert(got == want, s"[$tier] surviving codes diverged from a " +
        "deterministic re-encode of the committed ground truth")
    }

    // END GAME 2: the survivor searches identically to a crash-free
    // fresh build of the same ground truth (the sequential replay)
    val q = df(truth.take(8))
    val seqDir = s"$root/seq"
    if (tier == "ivf") {
      AnnIndex.buildIvfPq(df(truth), "vec_id", "embedding", seqDir, cents, cbs)
      val got = AnnIndex.topK(AnnIndex.load(spark, dir), q, "vec_id",
        "embedding", k = 3, nprobe = 2).collect().map(_.toSeq).toSet
      val want = AnnIndex.topK(AnnIndex.load(spark, seqDir), q, "vec_id",
        "embedding", k = 3, nprobe = 2).collect().map(_.toSeq).toSet
      assert(got == want,
        s"[$tier] post-storm search diverged from a sequential replay")
    } else {
      // replay under the FINAL quantizer (the interludes grew it); SQ
      // scoring is cell-independent, so this only aligns the layouts
      AnnIndex.buildSq(df(truth), "vec_id", "embedding", seqDir, sqM,
        Some(curSqCents))
      val got = AnnIndex.topKSq(AnnIndex.loadSq(spark, dir), q, "vec_id",
        "embedding", k = 3).collect().map(_.toSeq).toSet
      val want = AnnIndex.topKSq(AnnIndex.loadSq(spark, seqDir), q, "vec_id",
        "embedding", k = 3).collect().map(_.toSeq).toSet
      assert(got == want,
        s"[$tier] post-storm search diverged from a sequential replay")
    }

    // maintenance after the storm: one expire reclaims every orphan the
    // contended crashes strewed about, and the index still serves
    AnnIndex.expire(spark, dir, keepLast = 1, orphanGraceMs = -1000)
    checkVisible("post-expire")
    val liveSegs =
      if (tier == "ivf") AnnIndex.load(spark, dir).batches.length
      else AnnIndex.loadSq(spark, dir).batches.length
    val dataDirs = new java.io.File(s"$dir/data").list().length
    assert(dataDirs == liveSegs,
      s"[$tier] expire left ${dataDirs - liveSegs} crash orphans in data/")
  }

  test("contested-id upsert storm: racing upserts of a shared key pool stay atomic and exactly-once visible") {
    val root = java.nio.file.Files
      .createTempDirectory("ann_mw_contested").toString
    val dir = s"$root/idx"
    AnnIndex.manifestRetryOverride.put(dir, 2)
    try {
      val pool = (100L until 112L).toVector // 12 contested ids
      val baseRows = (0L until 40L).map(i => (i, vec(i, 0))) ++
        pool.map(i => (i, vec(i, 0)))
      val e0 = df(baseRows)
      val (cents, cbs) = ivfModel(e0)
      AnnIndex.buildIvfPq(e0, "vec_id", "embedding", dir, cents, cbs)

      val nWriters = 3
      // committed candidate vectors per contested id (the initial build
      // is candidate 0); only COMMITTED upserts are added
      val candidates = new java.util.concurrent.ConcurrentHashMap[Long,
        java.util.concurrent.ConcurrentLinkedQueue[Seq[Float]]]()
      pool.foreach { i =>
        val q = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Float]]()
        q.add(vec(i, 0)); candidates.put(i, q)
      }

      def writerStorm(w: Int): Unit = {
        val rng = new scala.util.Random(777L + w)
        for (round <- 1 to 10) {
          val gen = 1000 + w * 100 + round
          val ids = rng.shuffle(pool).take(1 + rng.nextInt(3))
          val rows = ids.map(i => (i, vec(i, gen)))
          val k = rng.nextDouble()
          val kill =
            if (k < 0.55) "" else if (k < 0.70) "stage"
            else if (k < 0.80) "staged" else if (k < 0.90) "publish-torn"
            else "published"
          if (kill.nonEmpty) AnnIndex.testKillPoint.put(dir, kill)
          var done = false
          var committed = false
          var attempts = 0
          while (!done) {
            attempts += 1
            assert(attempts <= 15, s"[contested/w$w] upsert did not converge")
            try {
              AnnIndex.upsertBatchIvfPq(df(rows), "vec_id", "embedding", dir)
              done = true; committed = true
            } catch {
              case c: AnnIndex.InjectedCrash => c.point match {
                case "published" => done = true; committed = true
                case "publish-torn" => unwedge(dir)
                case _ => // re-run
              }
              case e: java.io.IOException if e.getMessage != null &&
                  e.getMessage.contains("truncated") => unwedge(dir)
            }
          }
          if (committed)
            rows.foreach { case (i, v) => candidates.get(i).add(v) }
        }
      }

      val pool2 = Executors.newFixedThreadPool(nWriters)
      try {
        val futures = (0 until nWriters).map { w =>
          pool2.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = writerStorm(w)
          })
        }
        futures.foreach(_.get(300, TimeUnit.SECONDS))
      } finally pool2.shutdownNow()
      AnnIndex.testKillPoint.remove(dir)

      // exactly-once visible per contested id (a torn upsert — tombstone
      // without segment or vice versa — would leave 0 or 2 rows)
      val visible = AnnIndex.load(spark, dir).codes
        .filter(col("neighbor_id").isin(pool.map(Long.box): _*))
        .select(col("neighbor_id"), col("_cell").cast("int"), col("codes"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Any](2))))
      assert(visible.map(_._1).sorted.toSeq == pool.sorted,
        s"contested ids not exactly-once visible: ${visible.map(_._1).sorted.toSeq}")

      // ... and each visible row is bit-equal to the encode of ONE
      // COMMITTED candidate (never a mix, never an uncommitted stage)
      val candRows = pool.flatMap { i =>
        import scala.jdk.CollectionConverters._
        candidates.get(i).asScala.zipWithIndex.map { case (v, j) =>
          (i * 1000 + j, i, v)
        }
      }
      val candEnc = Pq.ivfPqEncode(
          candRows.map { case (cid, _, v) => (cid, v) }.toDF("vec_id", "embedding"),
          "vec_id", "embedding", cents, cbs)
        .select(col("neighbor_id"), col("_cell").cast("int"), col("codes"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Any](2))))
        .toMap
      val candByid = candRows.groupBy(_._2)
      visible.foreach { case (id, enc) =>
        val allowed = candByid(id).map { case (cid, _, _) => candEnc(cid) }
        assert(allowed.contains(enc),
          s"contested id $id's visible codes match NO committed upsert — " +
            "a lost/torn/mixed write survived the storm")
      }
    } finally {
      AnnIndex.manifestRetryOverride.remove(dir)
      AnnIndex.testKillPoint.remove(dir)
    }
  }
}
