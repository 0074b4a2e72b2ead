package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory — the settings every graft operator assumes,
  * collected so a library user starts from the same contract the test
  * suite, Verify, and Bench run under:
  *
  *  - non-ANSI casts (pandas `errors='coerce'` parity: bad input → NULL,
  *    never an exception mid-pipeline);
  *  - UTC session timezone (all date/timestamp parity depends on it);
  *  - micros parquet timestamps + nanos-as-long reads (the physical
  *    types external engines and the reference data carry);
  *  - AQE on (runtime skew-join splitting and partition coalescing);
  *  - the graft SQL extensions: function library + the Levenshtein
  *    bound-prefilter optimizer rule (`plans/GraftExtensions`).
  */
object GraftSession {

  /** Pre-configured builder; compose master/app settings and call
    * `getOrCreate()`. Extensions only take effect when the builder
    * CREATES the session — on an already-running session use
    * [[attach]] instead. */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")

  /** Workstation-sized local session: `local[cores]` with shuffle
    * partitions = cores (not the 200 default — 32 threads shuffling 200
    * partitions is pure overhead), functions registered. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val s = builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()
    attach(s)
  }

  /** Apply the runtime-settable part of the contract to an EXISTING
    * session (cluster deployments build their own session): runtime
    * confs + the temp-function registry. The parquet read/write confs
    * and extensions that are builder-time-only must be set by the
    * cluster config when the session is not graft-built. */
  def attach(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.GraftFunctions.registerAll(s)
    s
  }
}
