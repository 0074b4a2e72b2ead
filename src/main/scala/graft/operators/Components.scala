package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the step that turns
  * the dedup family's PAIR output (minhash/simhash/embedding near-dups)
  * into duplicate GROUPS so one representative per group can be kept.
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — the same public algorithm behind
  * GraphFrames' connectedComponents). Each round rewires every edge
  * toward the minimum id seen in its neighborhood:
  *
  *   large-star: for each node u with m = min(Γ(u) ∪ {u}), replace every
  *     edge to a LARGER neighbor v > u with (v, m);
  *   small-star: orient edges larger→smaller; for each node u with
  *     m = min(Γ(u)), rewire u and all its smaller neighbors onto m.
  *
  * The fixpoint of the combined step is a star forest: every non-root
  * points directly at its component's minimum id. Convergence takes
  * O(log n) rounds REGARDLESS of graph diameter — the property the
  * previous min-label-propagation implementation lacked (O(diameter)
  * rounds, so a 100 TB dup graph with one long chain could exceed any
  * fixed round budget; a planted 25-node chain now converges in 3
  * rounds instead of 24).
  *
  * Scale notes: each round is two self-aggregating passes over an
  * edge-count-sized frame (symmetrize → min per node → rewire), with the
  * round's output materialized through [[Pin.data]] — each star
  * pass references its input three times, so WITHOUT a per-round lineage
  * cut the logical plan grows ~6× per round and the driver OOMs just
  * printing it. Convergence is detected by edge-set stability: the
  * per-round count doubles as the materializing action, and a
  * set-difference check runs only on rounds where the count is
  * unchanged — exact, no hash-collision risk. Rounds shrink the frame
  * monotonically toward one edge per non-root vertex.
  */
object Components {

  /** One large-star pass: every edge from u to a larger neighbor is
    * rewired onto min(Γ(u) ∪ {u}). Output edges are oriented
    * larger→smaller by construction (v > u ≥ m). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src")
      .agg(least(min(col("dst")), col("src")).as("m"))
    sym.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star pass over larger→smaller oriented edges: node u and
    * all its (smaller) neighbors rewire onto m = min(Γ(u)). Keeps the
    * larger→smaller orientation and never emits self-loops. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("src").agg(min(col("dst")).as("m"))
    val joined = edges.join(mins, "src")
    joined.filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(joined.select(col("src"), col("m").as("dst")))
      .distinct()
  }

  /** (id, component) for every vertex that appears in `edges`
    * (undirected). Component id = min vertex id of the component.
    *
    * @param maxIter round budget; large/small-star needs O(log n)
    *   rounds, so the default covers any graph that fits on disk
    *   (2^30 nodes converge in ~30 rounds; the sf0.1 dup graph takes 2)
    * @param requireConvergence throw if the edge set is still changing
    *   after `maxIter` rounds (a silent early exit would return WRONG
    *   components); pass false to accept a best-effort labeling instead. */
  def labelPropagate(edges: DataFrame, aCol: String, bCol: String,
                     maxIter: Int = 50,
                     requireConvergence: Boolean = true): DataFrame =
    labelPropagateWithRounds(edges, aCol, bCol, maxIter, requireConvergence)._1

  /** As [[labelPropagate]], but also returns the number of alternating
    * rounds executed — the observable for scale tests asserting the
    * O(log n) bound on planted long chains. */
  def labelPropagateWithRounds(edges: DataFrame, aCol: String, bCol: String,
                               maxIter: Int = 50,
                               requireConvergence: Boolean = true): (DataFrame, Int) = {
    // Pin the RAW edge projection before anything branches off it: the
    // caller's `edges` is typically a whole sketch pipeline (LSH bands +
    // exact verify), and both the contraction input and the vertex set
    // derive from it — without this cut the pair pipeline would execute
    // once per derivation (measured: q72 on a 10x corpus spent 2/3 of
    // its 43 s recomputing the minhash pairs for the vertex frame).
    val raw = Pin.data(edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b")))
    val input = raw
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()

    // every vertex of the input graph, incl. self-loop-only ids — each
    // must come back labeled even if contraction drops it to a root
    val vertices = raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id")))
      .distinct()

    // Pin each round: a star pass references its input 3×, so the plan
    // grows geometrically without the cut (see Pin for the trade-off).
    // Lazy pins (the BpeTrain pattern): the round's own count() is a
    // full pass over the frame anyway, so materialization folds into it
    // instead of paying a separate checkpoint job per round.
    var ee = Pin.data(input, eager = false)
    var prevCount = ee.count()
    var iter = 0
    var converged = prevCount == 0L
    while (!converged && iter < maxIter) {
      val next = Pin.data(smallStar(largeStar(ee)), eager = false)
      val nextCount = next.count()
      // edge sets are distinct frames: equal count + empty one-sided
      // difference ⇔ identical sets ⇔ star-forest fixpoint. The except
      // only runs on count-stable rounds, so most rounds cost one job.
      converged = nextCount == prevCount && next.except(ee).isEmpty
      ee = next
      prevCount = nextCount
      iter += 1
    }
    // at the fixpoint ee is a star forest: (non-root, root) — roots
    // appear only on the dst side. Vertices missing from src are roots
    // (or isolated), labeled with themselves.
    val out = Pin.data(vertices
      .join(ee.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("dst"), col("id")).as("comp")))
    if (!converged) {
      val msg = s"large/small-star did not converge in $maxIter rounds — " +
        "component ids would be WRONG; this indicates a bug (the " +
        "algorithm needs O(log n) rounds), not an undersized budget"
      if (requireConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    (out, iter)
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
    // Materialize the loser ids ONCE (dup-count-sized, ids only): the
    // final anti-join's left side is typically a multi-branch frame
    // (docsWithDups unions two scans), and the optimizer pushes an
    // anti-join BELOW a union — duplicating this whole subtree (the
    // docs⋈comps score join and the argmax aggregation) once per
    // branch, i.e. two extra corpus-sized passes at warehouse scale.
    // Same pin classification as the comps frames it derives from.
    val losers = Pin.data(
      comps.join(winners, comps("id") === winners("_winner"), "left_anti")
        .select(col("id")))
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }
}
