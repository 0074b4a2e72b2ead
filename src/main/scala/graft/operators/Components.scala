package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate pairs — the step that turns
  * the dedup family's PAIR output (minhash/simhash/embedding near-dups)
  * into duplicate GROUPS so one representative per group can be kept.
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with its
  * own id; each round, a vertex takes the minimum label among itself and
  * its neighbors; fixpoint = component id = minimum vertex id in the
  * component. Rounds needed = graph diameter — near-dup clusters are
  * dense and tiny (diameter 2-4), so this converges in a handful of
  * rounds, each one join + one aggregation on (src, label).
  *
  * Scale notes: the per-round frames are persisted and the previous
  * round unpersisted, so lineage does not snowball; on a real cluster
  * give the session a checkpoint dir and swap the persist for
  * `localCheckpoint()` on long chains. Convergence costs exactly ONE
  * action per round: the changed-label flag is computed inside the same
  * update join and counted while the round's frame materializes into
  * cache — no second join against the previous labels.
  */
object Components {

  /** (id, component) for every vertex that appears in `edges`
    * (undirected). Component id = min vertex id of the component.
    *
    * @param requireConvergence throw if the labels are still changing
    *   after `maxIter` rounds (a silent early exit would return WRONG
    *   components for any chain with diameter > maxIter); pass false to
    *   accept a best-effort labeling instead. */
  def labelPropagate(edges: DataFrame, aCol: String, bCol: String,
                     maxIter: Int = 20,
                     requireConvergence: Boolean = true): DataFrame = {
    val und = edges.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(edges.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // `persisted` tracks the cached handle (labels is a projection of it
    // after round 1, and unpersist must hit the exact cached plan)
    var persisted = labels
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = und
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      // the changed flag rides in the SAME frame, so counting it both
      // materializes the round into cache and detects convergence — one
      // job per round instead of update + compare-join
      val updated = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp").isNotNull && col("ncomp") < col("comp")).as("_chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = updated.filter(col("_chg")).count()
      persisted.unpersist()
      persisted = updated
      labels = updated.drop("_chg")
      iter += 1
    }
    und.unpersist()
    // hand back an auto-released copy and drop the last round's cache
    // entry — returning the persisted frame itself would leak one
    // CacheManager entry per call in long-lived sessions (labels is
    // vertex-count-sized, so the eager checkpoint is cheap and reads
    // straight from the still-cached round)
    val out = labels.localCheckpoint()
    persisted.unpersist()
    if (changed > 0) {
      val msg = s"labelPropagate did not converge in $maxIter rounds " +
        s"($changed labels still changing) — component ids would be WRONG " +
        "for chains longer than maxIter; raise maxIter"
      if (requireConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    out
  }

  /** Keep one representative per duplicate group: drop every doc whose
    * component representative (min id) is a different doc. Docs in no
    * pair are kept untouched. */
  def dedupByComponents(docs: DataFrame, idCol: String,
                        edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comps = labelPropagate(edges, aCol, bCol)
    val losers = comps.filter(col("id") =!= col("comp")).select(col("id"))
    // size-adaptive anti-join: Spark broadcasts the loser set when it
    // fits and degrades to a shuffle join when dup volume is large
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }

  /** Keep the BEST doc per duplicate group instead of the min-id one:
    * the representative maximizes `scoreCol` (quality score, length,
    * freshness…) with min id as the deterministic tie-break — the
    * "keep the highest-quality copy" policy a curated corpus wants.
    *
    * Scale: component labels join back to the (id, score) projection —
    * never the payload — and the per-component argmax is one hash
    * aggregation via `max_by`-style struct ordering; docs in no pair
    * bypass the whole path untouched. */
  def dedupKeepBest(docs: DataFrame, idCol: String, scoreCol: String,
                    edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comps = labelPropagate(edges, aCol, bCol)
    val scored = comps.join(
      docs.select(col(idCol).cast("long").as("id"), col(scoreCol).as("_score")),
      "id")
    // per-component argmax: max over (score, -id) struct — component-
    // count rows out, one Exchange on comp
    val winners = scored.groupBy(col("comp"))
      .agg(max(struct(col("_score"), (-col("id")).as("_negid"))).as("_w"))
      .select((-col("_w._negid")).cast("long").as("_winner"))
    val losers = comps.join(winners, comps("id") === winners("_winner"), "left_anti")
      .select(col("id"))
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }
}
