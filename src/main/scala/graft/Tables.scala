package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet table reader with a per-JVM SCHEMA cache.
  *
  * `spark.read.parquet(path)` with no user schema runs a footer-reading
  * schema-inference Spark job on EVERY call ("parquet at <callsite>" in
  * the job log, ~40-90 ms of driver latency each at local scale, a
  * footer read per representative file at warehouse scale). The bench
  * re-reads the same handful of immutable testdata tables ~2-3 times per
  * query x 175 queries, so inference alone cost ~15-30 s of pure
  * driver-side latency per bench run (optimization guide §1/§7.3 —
  * driver planning work, and §6 — metadata caching).
  *
  * The schema is still derived from the actual files on FIRST use (so
  * the type-adaptive contracts — e.g. events.ts NANOS-vs-MICROS across
  * testdata generations — are preserved verbatim), then reused for the
  * life of the JVM. Only METADATA is cached; every query still computes
  * its result from the parquet inputs on every invocation. Keyed by
  * path: distinct scale-factor dirs never collide.
  */
object Tables {

  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Read `dir/name.parquet` with the cached (or first-use-inferred)
    * schema. */
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val p = s"$dir/$name.parquet"
    val sch = schemas.computeIfAbsent(p, pp => s.read.parquet(pp).schema)
    s.read.schema(sch).parquet(p)
  }
}
