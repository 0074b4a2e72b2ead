package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingest/export — the lingua franca of
  * LLM training corpora (one document object per line; The Pile,
  * RedPajama, Dolma, and most crawl dumps ship this shape). Restates
  * [[CsvSource]]'s source contract for the corpus world:
  *
  *  - EXPLICIT schema, never inferred: `spark.read.json` without a
  *    schema runs a full inference pass first — an extra 100 TB scan.
  *    Here the caller states the schema and the read is ONE text scan.
  *  - `_ingest_id` stamped at read time (monotonically_increasing_id —
  *    stable within a read; the file-order semantics dedup/ffill rely
  *    on, SURVEY.md §4).
  *  - Malformed lines are QUARANTINED with the raw line preserved, not
  *    dropped — the P3 clean/quarantine split applied at the source.
  *    Both halves come from the SAME parsed projection (one scan, two
  *    filters); a line is quarantined when it is blank, not JSON, or
  *    (optionally) missing a required field.
  *
  * Streaming: [[streamParsed]] is the same stateless projection over a
  * file-source landing stream — callers fan the `_corrupt` flag into a
  * clean sink and an audit sink (the S8/S14 pattern). */
object JsonlSource {

  val IngestId: String = CsvSource.IngestId

  private val CorruptRec = "_corrupt_rec"

  /** The shared parse projection: raw line → (parsed struct, corrupt
    * reason). PERMISSIVE `from_json` never nulls the struct — malformed
    * input yields an all-null row — so invalid JSON is detected the
    * documented way: a corrupt-record column in the parse schema, which
    * PERMISSIVE fills with the raw text exactly when parsing failed.
    * A JSON value that is not an object (bare scalar/array) also lands
    * there. `required` fields catch the remaining hole, with the two
    * failure shapes kept DISTINGUISHABLE for repair tooling: a key that
    * is ABSENT from the object quarantines as `missing_required_field`
    * (checked against `json_object_keys` on the raw line), while a key
    * that is present but explicitly `null` (`{"text": null}`) — a
    * different upstream bug — quarantines as `null_required_field`.
    * Both are quarantined either way: a load-bearing field must be
    * non-null for the clean partition's contract to mean anything. */
  private def parseProjection(raw: DataFrame, schema: StructType,
                              required: Seq[String]): DataFrame = {
    require(!schema.fieldNames.contains(CorruptRec),
      s"schema must not define $CorruptRec — reserved for corrupt-record capture")
    val parseSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(CorruptRec,
        org.apache.spark.sql.types.StringType))
    val parsed = raw.withColumn("_j", from_json(col("value"), parseSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptRec)))
    // absent key vs explicit null: json_object_keys on the raw line
    // sees what the object actually SAID; the parsed struct cannot
    // (from_json maps both shapes to a null field). Branch order makes
    // the two reasons disjoint: a row only reaches the null check when
    // every required key is present.
    val absent: Option[Column] = required.foldLeft(Option.empty[Column]) {
      (acc, f) => val c = !array_contains(json_object_keys(col("value")), f)
        Some(acc.fold(c)(_ || c))
    }
    val nulled: Option[Column] = required.foldLeft(Option.empty[Column]) {
      (acc, f) => val c = col(s"_j.$f").isNull
        Some(acc.fold(c)(_ || c))
    }
    parsed.withColumn("_corrupt",
      when(length(trim(col("value"))) === 0, lit("blank_line"))
        .when(col(s"_j.$CorruptRec").isNotNull, lit("invalid_json"))
        .when(absent.getOrElse(lit(false)), lit("missing_required_field"))
        .when(nulled.getOrElse(lit(false)), lit("null_required_field"))
        .otherwise(lit(null).cast("string")))
  }

  /** One text scan → (clean, quarantine). Clean carries the schema's
    * columns + `_ingest_id`; quarantine carries the raw line, the
    * reason, and `_ingest_id` (so a repaired line can rejoin in ingest
    * order). */
  def readSplit(spark: SparkSession, path: String, schema: StructType,
                required: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val raw = spark.read.text(path)
      .withColumn(IngestId, monotonically_increasing_id())
    val p = parseProjection(raw, schema, required)
    val clean = p.filter(col("_corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"_j.$f").as(f)) :+ col(IngestId): _*)
    val quarantine = p.filter(col("_corrupt").isNotNull)
      .select(col("value").as("raw_line"), col("_corrupt").as("reason"),
        col(IngestId))
    (clean, quarantine)
  }

  /** JSONL export: every row as one JSON object per line. Null fields
    * are kept (`ignoreNullFields=false`) so a roundtrip preserves the
    * schema's shape, not just the populated keys. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("value"))
      .write.mode("overwrite").text(path)

  /** Streaming parse over a landing dir: the [[parseProjection]] on a
    * file-source text stream — stateless, parallel by file split. The
    * output keeps the schema columns + `_corrupt`; route
    * `_corrupt IS NULL` to the clean sink and the rest (with `value`)
    * to the audit sink. */
  def streamParsed(spark: SparkSession, dir: String, schema: StructType,
                   required: Seq[String] = Nil): DataFrame = {
    val raw = spark.readStream.schema("value STRING").text(dir)
    parseProjection(raw, schema, required)
      .select(schema.fieldNames.map(f => col(s"_j.$f").as(f)) ++
        Seq(col("value"), col("_corrupt")): _*)
  }
}
