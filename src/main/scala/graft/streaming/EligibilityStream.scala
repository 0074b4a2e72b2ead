package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Eligibility

/** Structured-Streaming restatement of the reference's Kafka/CDC
  * eligibility path (SURVEY.md §2.9 T1-T6; kafkaworker.js:41-150,
  * supabaseWatcher.js:28-66).
  *
  * The reference consumes an outbox topic message-at-a-time, audits every
  * raw message, dispatches on `type === 'eligibility_check'`, looks up the
  * latest flight row, applies the >= 120-minute rule, and appends a
  * reason-coded result with a processed_at stamp. Here each step is a
  * streaming DataFrame transform: the same code runs on `readStream`
  * (Kafka or file source) and on a batch DataFrame — which is how the
  * tests drive it with MemoryStream.
  *
  * Scale: the flights dim is a stream-static join (broadcast when small);
  * parsing and the rule cascade are stateless projections, so the stream
  * needs no state store at all — arbitrary parallelism by input partition.
  */
object EligibilityStream {

  /** Message envelope the reference produces (kafkaworker.js:66-69). */
  val messageSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("requested_at", StringType),
    StructField("payload", StructType(Seq(
      StructField("firstName", StringType),
      StructField("lastName", StringType),
      StructField("flightNumber", StringType),
      StructField("passengerId", StringType))))))

  /** T2/F35 — parse the raw message value as JSON; malformed payloads fall
    * back to a raw envelope instead of being dropped
    * (kafkaworker.js:47-51's try/catch). Input column: `value` string. */
  def parseMessages(raw: DataFrame): DataFrame = {
    val parsed = from_json(col("value"), messageSchema)
    raw
      .withColumn("_parsed", parsed)
      .withColumn("is_json", col("_parsed").isNotNull && col("_parsed.type").isNotNull)
      .withColumn("type", col("_parsed.type"))
      .withColumn("flight_number", col("_parsed.payload.flightNumber"))
      .withColumn("passenger_id", col("_parsed.payload.passengerId"))
      .withColumn("raw", when(!col("is_json"), col("value")))
      .drop("_parsed")
  }

  /** T1/S14 — audit projection: every raw message, JSON or not, with a
    * receive stamp (kafka_messages insert, kafkaworker.js:54-63). */
  def audit(raw: DataFrame): DataFrame =
    raw.select(col("value").as("message_content"),
      current_timestamp().as("received_at"))

  /** T3/T4 — dispatch + enrich + rule + stamp: filter eligibility_check
    * messages, join the (already per-key-latest) flights dim, apply the
    * reason-code cascade, stamp processed_at. */
  def process(messages: DataFrame, flightsLatest: DataFrame,
              flightKeyCol: String = "flight_number",
              scheduledCol: String = "scheduled_departure",
              actualCol: String = "actual_departure"): DataFrame = {
    val checks = messages
      .filter(col("is_json") && col("type") === "eligibility_check")
      .select(col("flight_number").cast(LongType).as(flightKeyCol),
        col("passenger_id"))
    Eligibility.check(checks, flightsLatest, flightKeyCol, scheduledCol, actualCol)
      .withColumn("processed_at", current_timestamp())
      .select(col("passenger_id"), col(flightKeyCol), col("delay_minutes"),
        col("reason"), col("eligible"), col("processed_at"))
  }
}
