package graft.operators

import org.apache.spark.sql.DataFrame

/** Centralized "materialize and cut lineage" primitive for iterative and
  * reused frames (components rounds, minhash signature frames, ffill
  * carries, scored LM frames).
  *
  * TRADE-OFF (applies to EVERY call site, documented once here):
  * `localCheckpoint` truncates the logical plan — essential for
  * iterative algorithms whose plan otherwise grows exponentially — and
  * stores the materialized blocks EXECUTOR-LOCALLY. On a multi-executor
  * cluster, losing an executor after the checkpoint makes those blocks
  * unrecoverable mid-query (there is no lineage left to recompute them);
  * the job fails and must be rerun. On local[n] (one JVM) the caveat is
  * moot. For long multi-hour cluster jobs, construct the session with a
  * checkpoint directory on reliable storage and pass `reliable = true`
  * here — `reliable` falls back to local checkpointing (with a warning)
  * when no checkpoint dir is configured, so callers can default to the
  * safe flag without breaking local runs. */
object Pin {

  def materialize(df: DataFrame, reliable: Boolean = false): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (reliable && sc.getCheckpointDir.isDefined) df.checkpoint()
    else {
      if (reliable)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "Pin.materialize(reliable=true) without a checkpoint dir — " +
            "falling back to executor-local checkpoint (not fault-tolerant)")
      df.localCheckpoint()
    }
  }
}
