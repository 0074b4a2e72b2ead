package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns
  * (array<float>) — SURVEY.md north-star similarity ops.
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k. The query side is broadcast
  *    (queries are usually << corpus), so the corpus never shuffles — each
  *    partition scores its local rows against every query and a partial
  *    top-k is taken before the final shuffle (TakeOrdered semantics via
  *    window on (query, score)).
  *  - `lshTopK`: random-hyperplane LSH. Corpus and queries are bucketed by
  *    sign-bit sketches under `tables` independent hyperplane sets; only
  *    same-bucket pairs are scored. At 100 TB the bucket join replaces the
  *    full cross product — recall tunes with tables x planesPerTable.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query row.
    * Output: (query id, neighbor id, cosine), k rows per query. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int = 10): DataFrame = {
    // norms hoisted to one per ROW (not per pair): same IEEE results as
    // cosine(), a third of the per-pair flops.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      norm2(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      norm2(col(vecCol)).as("_cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("_qn") === 0.0 || col("_cn") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), bround(col("cosine"), 6).as("cosine"),
        col("_rn").cast("int").as("rank"))
  }

  /** LSH-bucketed cosine top-k: candidates = rows sharing a hyperplane
    * sign-bucket with the query in ANY of `tables` hash tables. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, dim: Int = 64,
              tables: Int = 8, planesPerTable: Int = 8,
              seed: Long = 42L): DataFrame = {
    val planeSets = (0 until tables).map(t =>
      randomPlanes(planesPerTable, dim, seed + t))

    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          explode(array(planeSets.zipWithIndex.map { case (ps, t) =>
            concat_ws(":", lit(t),
              graft.plans.SketchExpressions.hyperplaneBucket(col(vecCol), ps))
          }: _*)).as("_bucket"))

    val q = bucketed(queries, "query_id", "_qv")
    val c = bucketed(corpus, "neighbor_id", "_cv")

    val cands = c.join(q.hint("broadcast"), Seq("_bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("_qv"), col("_cv"))
      .distinct()
      .withColumn("cosine", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("neighbor_id"), bround(col("cosine"), 6).as("cosine"),
        col("_rn").cast("int").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold)
    * via LSH buckets — the embedding twin of TextDedup.minHashNearDups. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, dim: Int = 64,
                        tables: Int = 8, planesPerTable: Int = 8,
                        seed: Long = 42L): DataFrame = {
    val planeSets = (0 until tables).map(t => randomPlanes(planesPerTable, dim, seed + t))
    val b = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      explode(array(planeSets.zipWithIndex.map { case (ps, t) =>
        concat_ws(":", lit(t),
          graft.plans.SketchExpressions.hyperplaneBucket(col(vecCol), ps))
      }: _*)).as("_bucket"))
    val l = b.as("l"); val r = b.as("r")
    l.join(r, col("l._bucket") === col("r._bucket") && col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"),
        col("l._v").as("_va"), col("r._v").as("_vb"))
      .distinct()
      .withColumn("cosine", cosine(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), bround(col("cosine"), 6).as("cosine"))
  }
}
