package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipelines.CleaningPipelines
import graft.operators.{Dedup, FfillRepair}
import graft.functions.{CleanFunctions => CF}

/** THROWAWAY measurement probe (round 19): stage-by-stage driver wall
  * of the q37 transactions pipeline — construction vs pin jobs vs
  * analysis. Not a query; deleted after the optimization lands. */
object ProbeClean {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
      r
    }

    // replica of QueriesClean.transactionsInput (private there)
    def input(): DataFrame = {
      val o = Tables.read(spark, sfDir, "orders")
      val k = col("o_orderkey") % 7013
      def money(mul: Int, off: Int): Column = {
        val cents = (k * mul + off) % 1000000L
        concat(lit("$"), format_number((cents / 100).cast(LongType), 0),
          lit("."), lpad((cents % 100).cast(StringType), 2, "0"))
      }
      o.select(
        col("o_orderkey").cast(LongType).as(CleaningPipelines.IngestId),
        when(k % 97 === 0, lit("4AN"))
          .otherwise((lit(40000L) + (k * 7) % 9999L).cast(StringType)).as("transactionid"),
        when(k % 89 === 0, lit("not-a-date"))
          .when(k % 4 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .when(k % 4 === 1, date_format(col("o_orderdate"), "dd/MM/yyyy"))
          .when(k % 4 === 2, date_format(col("o_orderdate"), "MM/dd/yyyy"))
          .otherwise(date_format(col("o_orderdate"), "yyyy/MMM/dd")).as("transactiondate"),
        when(k % 101 === 0, lit(null).cast(StringType))
          .otherwise(concat(lit("P"), lpad(((k * 3) % 90000L).cast(StringType), 5, "0")))
          .as("passengerid"),
        when(k % 83 === 0, lit(""))
          .when(k % 103 === 0, lit(null).cast(StringType))
          .otherwise(concat(chr(k % 26 + 65), (k % 99999L + 1).cast(StringType))).as("flightid"),
        when(k % 107 === 0, lit(null).cast(StringType))
          .otherwise(money(11, 3)).as("ticketprice"), money(13, 7).as("taxes"),
        money(17, 1).as("baggagefees"), money(19, 9).as("totalamount"))
    }

    (1 to 3).foreach { pass =>
      println(s"---- pass $pass ----")
      val df0raw = timeIt("input construct")(input())
      val df0 = timeIt("withIngestId+norm")(
        CleaningPipelines.withIngestId(CleaningPipelines.normalizeColumns(df0raw)))
      val moneyCols = Seq("ticketprice", "taxes", "baggagefees", "totalamount")
      val rep = timeIt("repairIds (incl pin jobs)")(
        FfillRepair.repairIds(df0, "transactionid", CleaningPipelines.IngestId,
          seed = 40000L, out = "_id_rep"))
      val df = timeIt("money+date withColumns")(
        rep.withColumn("transactionid", col("_id_rep").cast(StringType))
          .drop("_id_rep")
          .transform(d => moneyCols.foldLeft(d)((dd, c) =>
            dd.withColumn(c, CF.cleanMoney(col(c)))))
          .withColumn("transactiondate",
            CF.toIsoDate(CF.parseDateMulti(col("transactiondate")))))
      val exactDup = timeIt("dupFlag all-cols")(
        Dedup.dupFlag(df, df.columns.filterNot(_ == CleaningPipelines.IngestId).toSeq,
          CleaningPipelines.IngestId, "_row_dup"))
      val idDup = timeIt("dupFlag id")(
        Dedup.dupFlag(exactDup, Seq("transactionid"), CleaningPipelines.IngestId, "_id_dup"))
      val valid = CF.validTransactionId(col("transactionid")) &&
        col("transactiondate").isNotNull &&
        CF.validPassengerId(col("passengerid")) &&
        CF.validFlightId(col("flightid")) &&
        !col("_row_dup") && !col("_id_dup")
      val flagged = timeIt("split flag")(
        idDup.withColumn("_valid", coalesce(valid, lit(false))))
      val clean = timeIt("clean filter+select")(
        flagged.filter(col("_valid")).drop("_valid", "_row_dup", "_id_dup")
          .select(Seq("_ingest_id", "transactionid", "transactiondate",
            "passengerid", "flightid", "ticketprice", "taxes", "baggagefees",
            "totalamount").map(col): _*))
      timeIt("noop write (exec)")(
        clean.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
