package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Resumable staged pipeline — the make-style recovery layer a
  * multi-hour 100 TB job needs: each stage's output lands as a parquet
  * artifact under `dir/<stage>/`, completion is the committer's
  * `_SUCCESS` plus a caller-supplied `tag` marker, and a re-run SKIPS
  * every completed stage and reads its artifact instead of recomputing
  * (reference behavior: the reference app reruns its whole cleaning
  * script on any failure — at warehouse scale a crash in stage 5 of 6
  * must not re-pay stages 1-4).
  *
  * Correctness rules:
  *  - Downstream stages read the PERSISTED artifact, not live lineage —
  *    so a resumed run and a straight-through run compute on identical
  *    bytes, and each stage's cost is paid at most once.
  *  - A stage that died mid-write has no `_SUCCESS` → it recomputes
  *    (parquet overwrite replaces the partial artifact).
  *  - `tag` is the stage-code fingerprint: a changed tag invalidates
  *    the artifact. Invalidation CASCADES — once any stage recomputes,
  *    every later stage recomputes too (its inputs changed), the
  *    linear-chain make rule.
  *  - `force` recomputes everything.
  *
  * Single writer assumed (the repo-wide sink convention); concurrent
  * readers of completed artifacts are always safe. */
object StagedPipeline {

  /** One stage: `run` receives the OUTPUTS (disk-backed frames) of all
    * previous stages by name and returns this stage's output frame.
    * `tag` fingerprints the stage logic (bump it when the code
    * changes); stages run in sequence order. */
  final case class Stage(name: String,
                         run: Map[String, DataFrame] => DataFrame,
                         tag: String = "v1")

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Run (or resume) the pipeline rooted at `dir`. Returns every
    * stage's disk-backed output by name; `recomputed` names of stages
    * that actually ran are reported through `onStage(name, wasCached)`.
    */
  def run(spark: SparkSession, dir: String, stages: Seq[Stage],
          force: Boolean = false,
          onStage: (String, Boolean) => Unit = (_, _) => ()): Map[String, DataFrame] = {
    require(stages.map(_.name).distinct.length == stages.length,
      s"duplicate stage names in ${stages.map(_.name)}")
    val f = fs(spark, dir)
    var invalidated = force
    stages.foldLeft(Map.empty[String, DataFrame]) { (acc, st) =>
      val out = s"$dir/${st.name}"
      val tagFile = path(s"$out/_tag")
      val complete = !invalidated &&
        f.exists(path(s"$out/_SUCCESS")) && f.exists(tagFile) && {
          val in = f.open(tagFile)
          val t = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          t == st.tag
        }
      if (!complete) {
        invalidated = true
        st.run(acc).write.mode("overwrite").parquet(out)
        val o = f.create(tagFile, true)
        try o.write(st.tag.getBytes("UTF-8")) finally o.close()
      }
      onStage(st.name, complete)
      acc + (st.name -> spark.read.parquet(out))
    }
  }
}
