package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flight-delay insurance eligibility — the reference's flagship analytic
  * query (SURVEY.md §2.10 M10; server.js:212-314, kafkaworker.js:67-140).
  *
  * Semantics: look up the most recent flight row per flight number (W4),
  * compute delay minutes between scheduled and actual departure (F23), apply
  * the >= 120-minute rule (P9), and emit one of the reference's reason codes:
  * flight_not_found / missing_time_data / invalid_time_format /
  * delay_threshold_met / delay_below_threshold (server.js:289-303).
  *
  * Spark-first: requests JOIN (per-key-latest flights) is a broadcast hash
  * join when the flight dim is small, a shuffled hash join otherwise; the
  * when-cascade is one codegen'd projection. No per-row lookups.
  */
object Eligibility {

  val ThresholdMinutes = 120L

  /** Reduce a flights table to its latest row per flight number —
    * row_number over (partition by key, order by scheduled desc). */
  def latestPerFlight(flights: DataFrame, keyCol: String, timeCol: String,
                      tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(timeCol).desc +: tieBreak.map(col(_).asc)): Seq[Column]
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    flights.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Core rule: enrich requests with flight times and emit
    * (delay_minutes, eligible, reason). Expects `requests` to carry
    * `flightKeyCol`, and `flights` to carry scheduled/actual timestamp
    * columns (already reduced to one row per key). */
  def check(requests: DataFrame, flights: DataFrame, flightKeyCol: String,
            scheduledCol: String, actualCol: String): DataFrame = {
    val joined = requests.join(flights, Seq(flightKeyCol), "left")
    val sched = col(scheduledCol)
    val act   = col(actualCol)
    val delay = ((unix_timestamp(act) - unix_timestamp(sched)) / 60.0)

    joined
      .withColumn("delay_minutes",
        when(sched.isNotNull && act.isNotNull, round(delay).cast("long")))
      .withColumn("reason",
        when(sched.isNull && act.isNull, lit("flight_not_found"))
          .when(sched.isNull || act.isNull, lit("missing_time_data"))
          .when(col("delay_minutes") >= ThresholdMinutes, lit("delay_threshold_met"))
          .otherwise(lit("delay_below_threshold")))
      .withColumn("eligible", col("reason") === "delay_threshold_met")
  }
}
