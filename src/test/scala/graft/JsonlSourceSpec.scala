package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.JsonlSource

/** JSONL source contract: explicit-schema single-scan parse,
  * clean/quarantine split with raw-line preservation, ingest-order
  * stamping, roundtrip, and the streaming projection. */
class JsonlSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """not json at all""",
      "",
      """{"doc_id": 3, "text": null, "lang": "en"}""",   // null field, valid
      """{"text": "orphan, no id", "lang": "en"}""",     // missing required
      """[1, 2, 3]""",                                   // JSON, not an object
      """{"doc_id": 4, "text": "extra keys ok", "lang": "de", "extra": 9}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-000.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("readSplit: clean parses the schema, quarantine keeps raw lines + reasons") {
    val dir = writeFixture()
    val (clean, quar) = JsonlSource.readSplit(spark, dir, schema,
      required = Seq("doc_id"))
    val cleanRows = clean.orderBy("doc_id")
      .select("doc_id", "text", "lang").as[(Long, Option[String], String)]
      .collect().toSeq
    assert(cleanRows == Seq(
      (1L, Some("hello world"), "en"),
      (2L, Some("bonjour"), "fr"),
      (3L, None, "en"),                 // null field survives as null
      (4L, Some("extra keys ok"), "de") // extra keys ignored by schema
    ))
    val reasons = quar.select("reason", "raw_line")
      .as[(String, String)].collect().toSeq
    assert(reasons.map(_._1).sorted ==
      Seq("blank_line", "invalid_json", "invalid_json", "missing_required_field"))
    // the raw line is preserved verbatim for repair
    assert(reasons.exists(r => r._1 == "invalid_json" && r._2 == "not json at all"))
    // a non-object JSON value (bare array) is invalid against the
    // struct schema → corrupt-record capture classifies it invalid_json
    assert(reasons.exists(r => r._1 == "invalid_json" && r._2 == "[1, 2, 3]"))
    // one scan covers every input line exactly once
    assert(clean.count() + quar.count() == 8)
  }

  test("required-field check distinguishes an absent key from an explicit null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_nv").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "present and non-null", "lang": "en"}""",
      """{"doc_id": 2, "lang": "en"}""",                 // text key ABSENT
      """{"doc_id": 3, "text": null, "lang": "en"}""")   // text key present, null
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-000.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (clean, quar) = JsonlSource.readSplit(spark, dir, schema,
      required = Seq("text"))
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val reasons = quar.select("raw_line", "reason").as[(String, String)]
      .collect().toMap
    assert(reasons(lines(1)) == "missing_required_field")
    assert(reasons(lines(2)) == "null_required_field")
  }

  test("ingest id: stable, unique, ascending in file order within a partition") {
    val dir = writeFixture()
    val (clean, quar) = JsonlSource.readSplit(spark, dir, schema, Seq("doc_id"))
    val ids = clean.select(JsonlSource.IngestId).as[Long].collect() ++
      quar.select(JsonlSource.IngestId).as[Long].collect()
    assert(ids.distinct.length == ids.length)
    // doc 1 arrived before doc 4 in the file → lower ingest id
    val byDoc = clean.select(col("doc_id"), col(JsonlSource.IngestId))
      .as[(Long, Long)].collect().toMap
    assert(byDoc(1L) < byDoc(2L) && byDoc(2L) < byDoc(3L) && byDoc(3L) < byDoc(4L))
  }

  test("roundtrip: writeJsonl → readSplit reparses every row, nulls kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_rt").toString
    val df = Seq((10L, Some("a b c"), "en"), (11L, None, "fr"))
      .toDF("doc_id", "text", "lang")
    JsonlSource.writeJsonl(df, s"$dir/out")
    // ignoreNullFields=false → the null key is present on disk
    val rawLines = spark.read.text(s"$dir/out").as[String].collect()
    assert(rawLines.exists(_.contains(""""text":null""")))
    val (clean, quar) = JsonlSource.readSplit(spark, s"$dir/out", schema, Seq("doc_id"))
    assert(quar.count() == 0)
    val back = clean.orderBy("doc_id").select("doc_id", "text", "lang")
      .as[(Long, Option[String], String)].collect().toSeq
    assert(back == Seq((10L, Some("a b c"), "en"), (11L, None, "fr")))
  }

  test("streamParsed: the same projection over a landing stream, corrupt flagged") {
    val dir = writeFixture()
    val q = JsonlSource.streamParsed(spark, dir, schema, Seq("doc_id"))
      .writeStream.format("memory").queryName("jsonl_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("jsonl_stream")
    assert(out.count() == 8)
    assert(out.filter(col("_corrupt").isNull).count() == 4)
    assert(out.filter(col("_corrupt") === "invalid_json")
      .select("value").as[String].head() == "not json at all")
  }
}
