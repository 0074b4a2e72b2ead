package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Persisted IVF-PQ index — the build-once / query-many shape every
  * production ANN deployment actually runs (Faiss `write_index` /
  * `read_index` + `add`, Lucene's segment files): the expensive offline
  * job (train + encode the corpus) lands a directory of parquet
  * artifacts; online query batches open the directory and never touch
  * the raw vectors again; corpus growth lands as APPENDED immutable
  * segments, not rebuilds.
  *
  * Layout under `dir/`:
  *   - `centroids/`  `(cell INT 1-based, vec ARRAY<DOUBLE>)` — the
  *     coarse quantizer; nlist rows.
  *   - `codebooks/`  `(s INT 0-based, code INT 1-based,
  *     vec ARRAY<DOUBLE>)` — the m residual sub-codebooks; m×ncode rows.
  *   - `data/batch-<n>/cell=X/…parquet` — immutable code segments
  *     (`neighbor_id, codes`), each PARTITIONED BY `cell`. Partitioning
  *     by cell is the scale lever: a query batch probes a bounded set
  *     of cells (≤ nlist, usually ≪), and the probe filter becomes a
  *     parquet PartitionFilter in EVERY segment scan — at 100 TB the
  *     difference between reading nprobe/nlist of the index and all
  *     of it.
  *   - `manifest/m-<n>` — one line per live segment (`batch-<id> nrows`).
  *     The CURRENT index state is the highest manifest; a segment not
  *     listed in any manifest does not exist to readers.
  *   - `meta/` one row `(dim, nlist, m, ncode)` — load-time model check.
  *
  * Snapshot semantics come from two rules (the Iceberg/Delta core,
  * reduced to parquet + rename):
  *  - DATA IS IMMUTABLE AND INVISIBLE UNTIL COMMITTED: a build or
  *    append first finishes its whole `batch-<n>` tree, then publishes
  *    it by writing the next manifest via stage+atomic-rename. A writer
  *    that dies mid-batch leaves an orphan no reader ever lists.
  *  - READERS PIN A MANIFEST: [[load]] resolves the highest manifest
  *    ONCE and unions exactly those segments, so an open [[Loaded]]
  *    handle is a consistent snapshot — a concurrent append never
  *    changes (or half-changes) what it scans. Reopen to see new data.
  *
  * [[appendIvfPq]] reads the model FROM THE INDEX (never from the
  * caller), so appended codes are always encoded against the same
  * centroids/codebooks as the original build — per-row encode is
  * deterministic, hence build(all) ≡ build(part) + append(rest), which
  * is exactly what q144 hash-gates. Single writer assumed (the
  * [[VersionedTable]] streaming-sink convention); concurrent readers
  * are always safe. Model arrays are parameter-sized (nlist, m×ncode
  * rows), so load-time collects are a few KB regardless of corpus
  * size. */
object AnnIndex {

  /** An opened index snapshot: driver-side model literals + the lazy
    * union of the manifest's segment scans
    * (`neighbor_id, _cell, codes` — [[Pq.ivfPqEncode]]'s schema). */
  final case class Loaded(centroids: Array[Array[Double]],
                          cbs: Array[Array[Array[Double]]],
                          codes: DataFrame, nrows: Long,
                          batches: Seq[Long]) {
    def nlist: Int = centroids.length
    def m: Int = cbs.length
  }

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Highest committed manifest id, or None on a fresh/absent index. */
  private def currentManifestId(f: org.apache.hadoop.fs.FileSystem,
                                dir: String): Option[Long] = {
    val mdir = path(s"$dir/manifest")
    if (!f.exists(mdir)) None
    else f.listStatus(mdir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("m-"))
      .flatMap(st => scala.util.Try(st.getPath.getName.drop(2).toLong).toOption)
      .maxOption
  }

  /** Segments of manifest `id`: (batchId, nrows) per line. */
  private def readManifest(f: org.apache.hadoop.fs.FileSystem, dir: String,
                           id: Long): Seq[(Long, Long)] = {
    val in = f.open(path(s"$dir/manifest/m-$id"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, n) = line.trim.split("\\s+")
      (b.stripPrefix("batch-").toLong, n.toLong)
    }.toSeq
  }

  /** Stage+rename-publish manifest `id` with the given segment list. */
  private def writeManifest(f: org.apache.hadoop.fs.FileSystem, dir: String,
                            id: Long, segs: Seq[(Long, Long)]): Unit = {
    f.mkdirs(path(s"$dir/manifest"))
    val tmp = path(s"$dir/manifest/_tmp.m-$id")
    val out = f.create(tmp, true)
    try out.write(segs.map { case (b, n) => s"batch-$b $n" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, path(s"$dir/manifest/m-$id")))
      throw new java.io.IOException(s"manifest m-$id publish failed")
  }

  /** Encode `delta` with the index model and land it as segment
    * `batch-<id>` (complete before the caller publishes a manifest).
    * The encode input is spread across cores first (a compact delta
    * arrives as ONE file → one scan split → the whole encode serializes
    * on one task — the landing-dir trap), and the ENCODED rows are
    * shuffled by cell before the partitioned write so each segment
    * holds ≤ nlist files (one per populated cell) instead of
    * tasks × cells small files — the file-count term that otherwise
    * dominates manifest-union listings as segments accumulate. The
    * shuffle moves (id, cell, codes) — post-compression bytes, not
    * vectors — and at production nlist (thousands, [[graft.operators
    * .Similarity.autoNlist]]) it is as parallel as the cluster. */
  private def writeSegment(delta: DataFrame, idCol: String, vecCol: String,
                           dir: String, batchId: Long,
                           centroids: Array[Array[Double]],
                           cbs: Array[Array[Array[Double]]]): Long = {
    val spark = delta.sparkSession
    val seg = s"$dir/data/batch-$batchId"
    Pq.ivfPqEncode(graft.operators.Spread.toCores(delta), idCol, vecCol,
        centroids, cbs)
      .withColumnRenamed("_cell", "cell")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(seg)
    spark.read.parquet(seg).count()
  }

  /** Build and atomically publish a FRESH index at `dir` (replacing any
    * index already there). The corpus pass is [[Pq.ivfPqEncode]] —
    * assignment + residual + PQ encode fused into one map-only
    * projection — plus the partitioned segment write. */
  def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
                 dir: String, centroids: Array[Array[Double]],
                 cbs: Array[Array[Array[Double]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val f = fs(spark, dir)
    val target = path(dir)
    val parent = Option(target.getParent).getOrElse(path("."))
    f.mkdirs(parent)
    val tmp = path(parent.toString + s"/_tmp.${target.getName}")
    f.delete(tmp, true)

    centroids.zipWithIndex
      .map { case (v, i) => (i + 1, v.toSeq) }.toSeq
      .toDF("cell", "vec")
      .repartition(1).write.parquet(s"$tmp/centroids")
    cbs.zipWithIndex
      .flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (v, j) => (s, j + 1, v.toSeq) } }.toSeq
      .toDF("s", "code", "vec")
      .repartition(1).write.parquet(s"$tmp/codebooks")
    Seq((centroids.head.length, centroids.length, cbs.length,
        cbs.head.length))
      .toDF("dim", "nlist", "m", "ncode")
      .repartition(1).write.parquet(s"$tmp/meta")
    val n = writeSegment(corpus, idCol, vecCol, tmp.toString, 0L,
      centroids, cbs)
    writeManifest(f, tmp.toString, 0L, Seq((0L, n)))

    f.delete(target, true)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
  }

  /** Append `delta` to a live index as a new immutable segment. The
    * encode model is read FROM THE INDEX, so appended codes are
    * bit-consistent with the build; the segment becomes visible only
    * with the manifest publish at the end (readers mid-append see the
    * previous snapshot).
    *
    * `segmentId` makes the append IDEMPOTENT for at-least-once callers
    * (foreachBatch replay after a crash): a segment already in the
    * current manifest is a committed duplicate delivery — the append is
    * skipped entirely. A crash BETWEEN segment write and manifest
    * publish leaves an unlisted (invisible) segment; the replay
    * overwrites it and publishes — either way the manifest lists the
    * segment exactly once. */
  def appendIvfPq(delta: DataFrame, idCol: String, vecCol: String,
                  dir: String, segmentId: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    val f = fs(spark, dir)
    val idx = load(spark, dir)
    val mid = currentManifestId(f, dir).get
    val batchId = segmentId.getOrElse(idx.batches.max + 1)
    if (!idx.batches.contains(batchId)) {
      val n = writeSegment(delta, idCol, vecCol, dir, batchId,
        idx.centroids, idx.cbs)
      val segs = readManifest(f, dir, mid) :+ (batchId, n)
      writeManifest(f, dir, mid + 1, segs)
    }
  }

  /** Continuous index ingestion: every micro-batch lands as one
    * idempotent [[appendIvfPq]] segment (segment id = foreachBatch id +
    * 1 — deterministic across checkpoint restarts, so an at-least-once
    * redelivery is the no-op replay path above). Requires an index
    * seeded by [[buildIvfPq]] (which owns segment 0); the stream owns
    * segments 1…. Readers keep their snapshot isolation — a query
    * serving from [[load]] never observes a half-applied micro-batch. */
  def streamAppend(updates: DataFrame, idCol: String, vecCol: String,
                   dir: String, checkpoint: String,
                   trigger: org.apache.spark.sql.streaming.Trigger)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        appendIvfPq(batch.toDF(), idCol, vecCol, dir,
          segmentId = Some(id + 1))
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Compact all live segments into one (Iceberg `rewriteDataFiles`,
    * Lucene's merge): read the current snapshot's union, rewrite it as
    * a single new segment (cell-partitioned when the family has cells —
    * IVF-PQ; flat for SQ8), publish a manifest listing ONLY that
    * segment. Readers pinned on older manifests keep working — their
    * batch dirs are untouched until [[expire]]. No-op on a
    * single-segment index. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val mid = currentManifestId(f, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed manifest under $dir"))
    val segs = readManifest(f, dir, mid)
    if (segs.length > 1) {
      val newId = segs.map(_._1).max + 1
      val union = segs.map { case (b, _) =>
        spark.read.parquet(s"$dir/data/batch-$b") }
        .reduce(_ unionByName _)
      val writer =
        if (union.columns.contains("cell"))
          union.repartition(col("cell")).write.partitionBy("cell")
        else union.write
      writer.mode("overwrite").parquet(s"$dir/data/batch-$newId")
      val n = spark.read.parquet(s"$dir/data/batch-$newId").count()
      writeManifest(f, dir, mid + 1, Seq((newId, n)))
    }
  }

  // ------------------------------------------------------------- SQ8

  /** An opened SQ8 snapshot: the 2×dim affine model + the lazy segment
    * union (`neighbor_id, codes, recon_norm` — [[Sq.encode]]'s
    * schema). SQ has no coarse cells, so segments are flat scans; the
    * probe-pruning lever does not apply (search is a full codes scan by
    * design — the cheap tier's trade). */
  final case class LoadedSq(model: graft.operators.Sq.Model,
                            codes: DataFrame, nrows: Long,
                            batches: Seq[Long]) {
    def dim: Int = model.dim
  }

  private def writeSqSegment(delta: DataFrame, idCol: String,
                             vecCol: String, dir: String, batchId: Long,
                             m: graft.operators.Sq.Model): Long = {
    val spark = delta.sparkSession
    val seg = s"$dir/data/batch-$batchId"
    graft.operators.Sq.encode(graft.operators.Spread.toCores(delta),
        idCol, vecCol, m)
      .write.mode("overwrite").parquet(seg)
    spark.read.parquet(seg).count()
  }

  /** Build and atomically publish a fresh SQ8 index at `dir` — same
    * staging/manifest protocol as [[buildIvfPq]], with the
    * parameter-sized model persisted as (i, mn, step, inv) rows. */
  def buildSq(corpus: DataFrame, idCol: String, vecCol: String,
              dir: String, m: graft.operators.Sq.Model): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val f = fs(spark, dir)
    val target = path(dir)
    val parent = Option(target.getParent).getOrElse(path("."))
    f.mkdirs(parent)
    val tmp = path(parent.toString + s"/_tmp.${target.getName}")
    f.delete(tmp, true)

    (0 until m.dim).map(i => (i, m.mins(i), m.steps(i), m.invSteps(i)))
      .toDF("i", "mn", "step", "inv")
      .repartition(1).write.parquet(s"$tmp/model")
    Seq((m.dim, "sq8")).toDF("dim", "kind")
      .repartition(1).write.parquet(s"$tmp/meta")
    val n = writeSqSegment(corpus, idCol, vecCol, tmp.toString, 0L, m)
    writeManifest(f, tmp.toString, 0L, Seq((0L, n)))

    f.delete(target, true)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
  }

  /** Append a new immutable SQ8 segment — model read FROM the index,
    * same idempotent `segmentId` contract as [[appendIvfPq]]. */
  def appendSq(delta: DataFrame, idCol: String, vecCol: String,
               dir: String, segmentId: Option[Long] = None): Unit = {
    val spark = delta.sparkSession
    val f = fs(spark, dir)
    val idx = loadSq(spark, dir)
    val mid = currentManifestId(f, dir).get
    val batchId = segmentId.getOrElse(idx.batches.max + 1)
    if (!idx.batches.contains(batchId)) {
      val n = writeSqSegment(delta, idCol, vecCol, dir, batchId, idx.model)
      val segs = readManifest(f, dir, mid) :+ (batchId, n)
      writeManifest(f, dir, mid + 1, segs)
    }
  }

  /** Open the current SQ8 snapshot (model validated against meta). */
  def loadSq(spark: SparkSession, dir: String): LoadedSq = {
    val f = fs(spark, dir)
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    require(meta.schema.fieldNames.contains("kind") &&
        meta.getAs[String]("kind") == "sq8",
      s"$dir is not an sq8 index")
    val dim = meta.getAs[Int]("dim")
    val rows = spark.read.parquet(s"$dir/model").orderBy("i").collect()
    require(rows.length == dim, s"model table does not match meta ($dim dims)")
    val m = graft.operators.Sq.Model(
      rows.map(_.getAs[Double]("mn")),
      rows.map(_.getAs[Double]("step")),
      rows.map(_.getAs[Double]("inv")))
    val mid = currentManifestId(f, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed manifest under $dir"))
    val segs = readManifest(f, dir, mid)
    val codes = segs.map { case (b, _) =>
      spark.read.parquet(s"$dir/data/batch-$b") }
      .reduce(_ unionByName _)
    LoadedSq(m, codes, segs.map(_._2).sum, segs.map(_._1))
  }

  /** Query an opened SQ8 snapshot — [[Sq.topK]]'s factored-dot scan
    * over the pinned segment union. */
  def topKSq(idx: LoadedSq, queries: DataFrame, idCol: String,
             vecCol: String, k: Int = 10): DataFrame =
    graft.operators.Sq.topK(queries, idx.codes, idCol, vecCol, idx.model, k)

  /** Drop everything no CURRENT reader can reach: segments not listed
    * in the highest manifest, and all older manifests. After expiry a
    * handle pinned on an older snapshot can no longer scan — run it
    * only once in-flight readers have drained (the Iceberg
    * expire-snapshots contract). */
  def expire(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val mid = currentManifestId(f, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed manifest under $dir"))
    val live = readManifest(f, dir, mid).map(_._1).toSet
    val dataDir = path(s"$dir/data")
    if (f.exists(dataDir)) f.listStatus(dataDir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch-") &&
          !scala.util.Try(name.drop(6).toLong).toOption.exists(live))
        f.delete(st.getPath, true): Unit
    }
    f.listStatus(path(s"$dir/manifest")).foreach { st =>
      val name = st.getPath.getName
      // only manifest files (a ChecksumFileSystem's delete removes the
      // .crc sidecar with its file — never match sidecars directly, or
      // the LIVE manifest's sidecar gets deleted by the != filter)
      if (name.startsWith("m-") && name != s"m-$mid")
        f.delete(st.getPath, true): Unit
    }
  }

  /** Open a snapshot: collect the parameter-sized model tables into
    * driver literals (validated against `meta`), pin a manifest, and
    * union its segment scans lazily. `asOf` time-travels to an OLDER
    * manifest generation (any id [[versionsOf]] lists — useful to
    * reproduce a search exactly as it ran before an append, the
    * Iceberg/Delta `VERSION AS OF` read); default is the current
    * (highest) manifest. Fails loudly on an expired or unknown id. */
  def load(spark: SparkSession, dir: String, asOf: Option[Long] = None): Loaded = {
    val f = fs(spark, dir)
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val (dim, nlist, m, ncode) =
      (meta.getAs[Int]("dim"), meta.getAs[Int]("nlist"),
        meta.getAs[Int]("m"), meta.getAs[Int]("ncode"))
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    require(cents.length == nlist && cents.forall(_.length == dim),
      s"centroids table does not match meta ($nlist x $dim)")
    val cbRows = spark.read.parquet(s"$dir/codebooks")
      .orderBy("s", "code").collect()
    require(cbRows.length == m * ncode,
      s"codebooks table does not match meta ($m x $ncode)")
    val cbs = cbRows.grouped(ncode)
      .map(_.map(_.getSeq[Double](2).toArray).toArray).toArray
    val mid = asOf.getOrElse(currentManifestId(f, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed manifest under $dir")))
    require(f.exists(path(s"$dir/manifest/m-$mid")),
      s"manifest m-$mid does not exist under $dir (expired or never published)")
    val segs = readManifest(f, dir, mid)
    val codes = segs.map { case (b, _) =>
      spark.read.parquet(s"$dir/data/batch-$b") }
      .reduce(_ unionByName _)
      .select(col("neighbor_id"), col("cell").as("_cell"), col("codes"))
    Loaded(cents, cbs, codes, segs.map(_._2).sum, segs.map(_._1))
  }

  /** Published manifest generations — the snapshot ids [[load]]'s
    * `asOf` accepts (oldest first; [[expire]] collapses this to the
    * current one). */
  def versionsOf(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val mdir = path(s"$dir/manifest")
    if (!f.exists(mdir)) Seq.empty
    else f.listStatus(mdir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("m-"))
      .flatMap(st => scala.util.Try(st.getPath.getName.drop(2).toLong).toOption)
      .sorted
  }

  /** Per-cell population report over an opened snapshot — the ops-side
    * balance audit (an IVF list 100× the mean is a latency and recall
    * hazard: every query probing it scans 100× the codes; Faiss's
    * imbalance_factor). One nlist-bounded hash agg over the codes scan
    * plus a broadcast 1-row total — no sort, no collect. */
  def cellStats(idx: Loaded): DataFrame = {
    val counts = idx.codes.groupBy(col("_cell"))
      .agg(count(lit(1)).as("n_vectors"))
    val total = counts.agg(sum(col("n_vectors")).as("_t"))
    counts.crossJoin(broadcast(total))
      .select(col("_cell").cast("int").as("cell"),
        col("n_vectors"),
        bround(col("n_vectors") / col("_t"), 6).as("frac"))
  }

  /** Query an opened snapshot: [[Pq.ivfPqSearch]] over the pinned
    * segment union, with the probe set pushed into EVERY segment scan
    * as a partition filter. The probed-cell collect is bounded by nlist
    * REGARDLESS of query count (distinct over the exploded probe list),
    * so pruning is always parameter-sized; `prune = false` keeps the
    * plain cell-join plan for the corpus-as-queries shape where every
    * cell is probed anyway. */
  def topK(idx: Loaded, queries: DataFrame, idCol: String, vecCol: String,
           k: Int = 10, nprobe: Int = 4, prune: Boolean = true): DataFrame = {
    import graft.plans.SketchExpressions.nearestCentroids
    val codes =
      if (!prune) idx.codes
      else {
        val probed = queries
          .select(explode(nearestCentroids(col(vecCol), idx.centroids,
            nprobe)).as("_cell"))
          .distinct().collect().map(_.getInt(0)).sorted
        if (probed.length >= idx.nlist) idx.codes
        else idx.codes.filter(col("_cell").isin(probed.map(Int.box): _*))
      }
    Pq.ivfPqSearch(codes, queries, idCol, vecCol, idx.centroids, idx.cbs,
      k, nprobe)
  }
}
