package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import graft.sources.CsvSource
import graft.pipelines.CleaningPipelines

class CsvSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S1/S16: all-string ingest with sanitized header and ingest id") {
    val dir = Files.createTempDirectory("graftcsv")
    val f = dir.resolve("in.csv")
    Files.writeString(f,
      "TransactionID,Transaction Date,Total$Amount\n40001,2023-01-10,\"$1,540.00\"\n4AN,01/18/2023,99.50\n")
    val df = CsvSource.readAllString(spark, f.toString)
    assert(df.columns.toSeq == Seq("transactionid", "transaction_date", "total_amount", "_ingest_id"))
    assert(df.schema.fields.take(3).forall(_.dataType.typeName == "string"))
    val rows = df.orderBy("_ingest_id").collect()
    assert(rows.length == 2 && rows.head.getString(0) == "40001")
  }

  test("S8: quarantine round-trip blanks nulls and keeps header") {
    val dir = Files.createTempDirectory("graftq")
    val df = Seq((Some("a"), None: Option[String]), (None, Some("b")))
      .toDF("x", "y")
    CsvSource.writeQuarantine(df, dir.resolve("q").toString)
    val back = spark.read.option("header", "true").csv(dir.resolve("q").toString)
    assert(back.count() == 2)
  }

  test("S16: dynamic DDL from header + _raw fallback for typed tables") {
    val dir = Files.createTempDirectory("graftddl")
    val f = dir.resolve("in.csv")
    Files.writeString(f, "Some Key,Total$Amount\nA,1\n")
    val t1 = CsvSource.createTableFromHeader(spark, f.toString, "graft_ddl_t",
      Some(dir.resolve("t").toString))
    assert(t1 == "graft_ddl_t")
    val schema = spark.table("graft_ddl_t").schema
    assert(schema.fieldNames.toSeq == Seq("some_key", "total_amount", "inserted_at"))
    assert(schema("some_key").dataType.typeName == "string")

    // pre-existing TYPED table of the same name → parallel _raw target
    spark.sql("CREATE TABLE graft_ddl_typed (k INT) USING parquet " +
      s"LOCATION '${dir.resolve("typed")}'")
    val t2 = CsvSource.createTableFromHeader(spark, f.toString, "graft_ddl_typed",
      Some(dir.resolve("typed_raw").toString))
    assert(t2 == "graft_ddl_typed_raw")
    assert(spark.catalog.tableExists("graft_ddl_typed_raw"))
    Seq("graft_ddl_t", "graft_ddl_typed", "graft_ddl_typed_raw")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("S6/S7: upsert — latest incoming version wins, others survive") {
    import graft.sources.UpsertSink
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val incoming = Seq((2L, "b2", 21.0, 1), (2L, "b3", 22.0, 2), (4L, "d", 40.0, 1))
      .toDF("k", "name", "bal", "version")
    val got = UpsertSink.upsert(existing, incoming, Seq("k"), "version")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b3", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // idempotent: re-applying the same batch changes nothing
    val again = UpsertSink.upsert(
      UpsertSink.upsert(existing, incoming, Seq("k"), "version"),
      incoming, Seq("k"), "version")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(again == got)
  }

  test("bucketed tables join with NO shuffle exchange (co-located join)") {
    import graft.sources.Bucketing
    val dir = Files.createTempDirectory("graftbucket")
    val facts = (1L to 200L).map(i => (i % 40, i, i * 1.5)).toDF("k", "id", "amt")
    val dims = (0L until 40L).map(i => (i, s"dim_$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "graft_b_facts", 8, Seq("k"), dir.resolve("f").toString)
    Bucketing.writeBucketed(dims, "graft_b_dims", 8, Seq("k"), dir.resolve("d").toString)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.readBucketed(spark, "graft_b_facts")
        .join(Bucketing.readBucketed(spark, "graft_b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 200)
      // and a groupBy on the bucket key also skips the exchange
      val agg = Bucketing.readBucketed(spark, "graft_b_facts")
        .groupBy("k").sum("amt")
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("graft_b_facts", "graft_b_dims")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("end-to-end: dirty CSV file through the transactions pipeline") {
    val dir = Files.createTempDirectory("grafte2e")
    val f = dir.resolve("txn.csv")
    Files.writeString(f,
      """TransactionID,TransactionDate,PassengerID,FlightID,TicketPrice,Taxes,BaggageFees,TotalAmount
        |40001,2023-01-10,P12345,AA123,"$1,540.00",1.00,0.00,2.00
        |4AN,01/18/2023,P20000,DL45,250.50,1.00,0.00,2.00
        |40009,garbage,P30000,UA9,99.99,1.00,0.00,2.00
        |""".stripMargin)
    val in = CsvSource.readAllString(spark, f.toString)
    val r = CleaningPipelines.transactions(in)
    assert(r.clean.count() == 2)      // 4AN repaired to 40002, parsed dates
    assert(r.quarantine.count() == 1) // garbage date
    CsvSource.writeQuarantine(r.quarantine, dir.resolve("quar").toString)
    assert(Files.list(dir.resolve("quar")).count() > 0)
  }
}
