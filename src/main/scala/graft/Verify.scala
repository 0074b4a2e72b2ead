package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // comma-separated allowlist for spot-verifying a few queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A query that THROWS must be a loud, machine-readable event: a
    // skipped query silently VANISHES from the downstream correctness
    // compare (that is how a testdata schema change dropped three green
    // queries from one round's sweep without any red signal).
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ---- streaming eligibility parity (T1-T4 end-to-end): JSON message
    // files in a landing dir -> streaming file source -> parseMessages ->
    // process (stream-static join + reason cascade) -> append parquet
    // sink, then the SAME transforms over a BATCH read of the SAME files.
    // The batch twin of this path is q50's oracle-gated checkRaw, so a
    // matching hash proves stream output == batch oracle transitively —
    // the parity the reference's async worker implies. Mismatch lands in
    // verify_failures.json like any other red query.
    if (only.forall(_.contains("stream_parity"))) {
      try {
        val artifact = streamParity(spark, sfDir, outDir)
        Files.writeString(Paths.get(s"$outDir/stream_parity.json"), artifact)
        println(artifact)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] stream_parity failed: ${e.getMessage}")
        failed("stream_parity") = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    val failJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    if (failed.nonEmpty) {
      // also on stdout so any tail-capture shows it next to the totals
      println(s"""{"verify_failures":${failed.size},"queries":${failed.keys
        .map(k => "\"" + k + "\"").mkString("[", ",", "]")}}""")
    }
    spark.stop()
  }

  /** Streaming-vs-batch eligibility parity over the q50-shaped input.
    * Returns the JSON artifact; THROWS on hash mismatch so the caller
    * records it as a verify failure. */
  def streamParity(spark: SparkSession, sfDir: String, outDir: String): String = {
    import graft.streaming.EligibilityStream
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val k = col("o_orderkey")
    // the q50 flights dim, verbatim (string keys, the three actual-time
    // shapes: empty / unparseable / +k%300 minutes)
    val flights = o.filter(k % 3 =!= 0).select(
      concat(lit("FL"), k.cast("string")).as("flight_number"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("scheduled_departure"),
      when(k % 11 === 0, lit(""))
        .when(k % 11 === 1, lit("not-a-timestamp"))
        .otherwise(date_format(
          timestamp_seconds(unix_timestamp(col("o_orderdate")) + (k % 300) * 60),
          "yyyy-MM-dd HH:mm:ss")).as("actual_departure"))
    // one eligibility_check message per even order, plus non-JSON noise
    // every 50th (exercises the parse fallback: audited, never dispatched)
    val messages = o.filter(k % 2 === 0).select(
      when(k % 50 === 0, concat(lit("corrupt line "), k.cast("string")))
        .otherwise(to_json(struct(
          lit("eligibility_check").as("type"),
          lit("2024-01-01T00:00:00Z").as("requested_at"),
          struct(lit("Jane").as("firstName"), lit("Doe").as("lastName"),
            concat(lit("FL"), k.cast("string")).as("flightNumber"),
            concat(lit("P"), k.cast("string")).as("passengerId")).as("payload"))))
        .as("value"))
    val landing = s"$outDir/_stream_landing"
    val sinkDir = s"$outDir/_stream_sink"
    val ckpt = s"$outDir/_stream_ckpt"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq(landing, sinkDir, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    messages.coalesce(4).write.text(landing)

    val stream = spark.readStream
      .schema("value STRING")
      .text(landing)
    val streamed = EligibilityStream.process(
      EligibilityStream.parseMessages(stream), flights)
      .drop("processed_at") // micro-batch wall clock, not data
    val query = streamed.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", sinkDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    val streamOut = spark.read.parquet(sinkDir)
    val batchOut = EligibilityStream.process(
      EligibilityStream.parseMessages(spark.read.text(landing)), flights)
      .drop("processed_at")

    // order-independent content hash: canonical row strings, sorted,
    // digested driver-side (row count here is requests/2 — small)
    def contentHash(df: DataFrame): (Long, String) = {
      val cols = df.columns.sorted.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))) // null marker
      val rows = df.select(concat_ws("\u0001", cols: _*).as("r"))
        .collect().map(_.getString(0)).sorted
      val d = java.security.MessageDigest.getInstance("MD5")
      rows.foreach(r => d.update(r.getBytes("UTF-8")))
      (rows.length.toLong, d.digest().map("%02x".format(_)).mkString)
    }
    val (nS, hS) = contentHash(streamOut)
    val (nB, hB) = contentHash(batchOut)
    val ok = nS == nB && hS == hB && nS > 0
    val json = s"""{"check":"stream_parity","rows_stream":$nS,"rows_batch":$nB,""" +
      s""""hash_stream":"$hS","hash_batch":"$hB","match":$ok}"""
    if (!ok) throw new IllegalStateException(s"stream/batch divergence: $json")
    json
  }
}
