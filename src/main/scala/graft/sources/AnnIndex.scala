package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Persisted IVF-PQ index — the build-once / query-many shape every
  * production ANN deployment actually runs (Faiss `write_index` /
  * `read_index`, Lucene's codec files): the expensive offline job
  * (train + encode the full corpus) lands a directory of parquet
  * artifacts; online query batches open the directory and never touch
  * the raw vectors again.
  *
  * Layout under `dir/` (all parquet):
  *   - `centroids/`  `(cell INT 1-based, vec ARRAY<DOUBLE>)` — the
  *     coarse quantizer; nlist rows.
  *   - `codebooks/`  `(s INT 0-based, code INT 1-based,
  *     vec ARRAY<DOUBLE>)` — the m residual sub-codebooks; m×ncode rows.
  *   - `codes/`      `(neighbor_id, codes ARRAY<INT>)` PARTITIONED BY
  *     `cell` — the corpus, m bytes-worth per row. Partitioning by cell
  *     is the scale lever: a query batch probes a bounded set of cells
  *     (≤ nlist, usually ≪), and the probe filter becomes a parquet
  *     PartitionFilter, so the scan reads ONLY the probed cell
  *     directories — at 100 TB the difference between reading
  *     nprobe/nlist of the index and reading all of it.
  *   - `meta/`       one row `(dim, nlist, m, ncode, nrows)` — load-time
  *     integrity check.
  *
  * Publish is atomic by the [[VersionedTable]] rule: the whole tree is
  * staged under a `_tmp.<name>` sibling and RENAMED into place (one
  * filesystem op on HDFS/local), so a reader either sees no index or a
  * complete one; a builder that dies mid-stage leaves only an invisible
  * `_tmp.*` orphan. Rebuild-in-place swaps the old tree out the same
  * way. Model arrays (centroids, codebooks) are parameter-sized by
  * construction — nlist and m×ncode rows — so the load-time collect is
  * a few KB regardless of corpus size. */
object AnnIndex {

  /** An opened index: driver-side model literals + the lazy codes scan
    * (`neighbor_id, _cell, codes` — [[Pq.ivfPqEncode]]'s schema). */
  final case class Loaded(centroids: Array[Array[Double]],
                          cbs: Array[Array[Array[Double]]],
                          codes: DataFrame, nrows: Long) {
    def nlist: Int = centroids.length
    def m: Int = cbs.length
  }

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  /** Build and atomically publish the index at `dir` (replacing any
    * complete index already there). The corpus pass is [[Pq.ivfPqEncode]]
    * — assignment + residual + PQ encode fused into one map-only
    * projection — plus the partitioned write; no shuffle beyond the
    * writer's own partitioning. */
  def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
                 dir: String, centroids: Array[Array[Double]],
                 cbs: Array[Array[Array[Double]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val f = fs(spark, dir)
    val target = new org.apache.hadoop.fs.Path(dir)
    val parent = Option(target.getParent).getOrElse(
      new org.apache.hadoop.fs.Path("."))
    f.mkdirs(parent)
    val tmp = new org.apache.hadoop.fs.Path(parent,
      s"_tmp.${target.getName}")
    f.delete(tmp, true)

    val enc = Pq.ivfPqEncode(corpus, idCol, vecCol, centroids, cbs)
      .withColumnRenamed("_cell", "cell")
    enc.write.partitionBy("cell").parquet(s"$tmp/codes")
    centroids.zipWithIndex
      .map { case (v, i) => (i + 1, v.toSeq) }.toSeq
      .toDF("cell", "vec")
      .repartition(1).write.parquet(s"$tmp/centroids")
    cbs.zipWithIndex
      .flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (v, j) => (s, j + 1, v.toSeq) } }.toSeq
      .toDF("s", "code", "vec")
      .repartition(1).write.parquet(s"$tmp/codebooks")
    val nrows = spark.read.parquet(s"$tmp/codes").count()
    Seq((centroids.head.length, centroids.length, cbs.length,
        cbs.head.length, nrows))
      .toDF("dim", "nlist", "m", "ncode", "nrows")
      .repartition(1).write.parquet(s"$tmp/meta")

    f.delete(target, true)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
  }

  /** Open a published index: collect the parameter-sized model tables
    * into driver literals (validated against `meta`), leave the codes
    * table as a lazy scan. */
  def load(spark: SparkSession, dir: String): Loaded = {
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val (dim, nlist, m, ncode, nrows) =
      (meta.getAs[Int]("dim"), meta.getAs[Int]("nlist"),
        meta.getAs[Int]("m"), meta.getAs[Int]("ncode"),
        meta.getAs[Long]("nrows"))
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
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("neighbor_id"), col("cell").as("_cell"), col("codes"))
    Loaded(cents, cbs, codes, nrows)
  }

  /** Query an opened index: [[Pq.ivfPqSearch]] over the persisted
    * codes, with the probe set pushed into the scan as a partition
    * filter. The probed-cell collect is bounded by nlist REGARDLESS of
    * query count (distinct over the exploded probe list), so pruning is
    * always parameter-sized; `prune = false` keeps the plain cell-join
    * plan for the corpus-as-queries shape where every cell is probed
    * anyway. */
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
