package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.warehouse.Warehouse

/** M8 — config-driven staging → pre-fact → dimension → fact executor
  * (table_configs.json semantics). The q51 oracle hash-checks the fact
  * output; this spec asserts each LAYER's state across two batches. */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = Warehouse.bookingSales
  private val dims = Seq("segment")
  private val measures = Seq("amount")

  private def batch(rows: (String, String, Double, Long)*) =
    rows.toDF("booking_reference", "segment", "amount", "_ingest_id")

  test("two batches: upserted staging/pre-fact, SCD2 dim, fact points at current version") {
    val b1 = batch(("BR1", "WEB", 10.0, 1L), ("BR2", "AGENT", 20.0, 2L),
      // two versions of BR3 in one batch: the later ingest id must win
      ("BR3", "WEB", 30.0, 3L), ("BR3", "WEB", 35.0, 4L))
    val l0 = Warehouse.emptyLayers(cfg, b1, dims, measures, "_ingest_id")
    val l1 = Warehouse.run(cfg, b1, l0, dims, measures, "_ingest_id",
      lit(java.sql.Date.valueOf("2024-01-01")))

    assert(l1.staging.count() == 3) // staging_on_conflict collapsed BR3
    assert(l1.preFact.filter(col("booking_reference") === "BR3")
      .select("amount").as[Double].head() == 35.0)
    assert(l1.dimension.count() == 3 &&
      l1.dimension.filter(col("is_current")).count() == 3)
    assert(l1.fact.count() == 3)

    // batch 2: BR1 changes segment (SCD2 close+reopen), BR2 only measure,
    // BR4 is new
    val b2 = batch(("BR1", "MOBILE", 11.0, 5L), ("BR2", "AGENT", 21.0, 6L),
      ("BR4", "WEB", 40.0, 7L))
    val l2 = Warehouse.run(cfg, b2, l1, dims, measures, "_ingest_id",
      lit(java.sql.Date.valueOf("2024-06-01")))

    // staging/pre-fact: accumulated, latest version per key
    assert(l2.staging.count() == 4)
    assert(l2.preFact.filter(col("booking_reference") === "BR2")
      .select("amount").as[Double].head() == 21.0)
    assert(l2.preFact.filter(col("booking_reference") === "BR3")
      .select("amount").as[Double].head() == 35.0) // untouched key survives

    // dimension: BR1 has a closed 2024-01 version and an open 2024-06 one
    val br1 = l2.dimension.filter(col("booking_reference") === "BR1")
      .orderBy("valid_from")
      .select(col("segment"), date_format(col("valid_from"), "yyyy-MM-dd"),
        date_format(col("valid_to"), "yyyy-MM-dd"), col("is_current"))
      .as[(String, String, Option[String], Boolean)].collect.toSeq
    assert(br1 == Seq(
      ("WEB", "2024-01-01", Some("2024-06-01"), false),
      ("MOBILE", "2024-06-01", None, true)))
    // BR2's attribute did not change: still one open version
    assert(l2.dimension.filter(col("booking_reference") === "BR2").count() == 1)

    // fact: latest measures, dim pointer at the CURRENT dimension version
    val facts = l2.fact
      .select(col("booking_reference"), col("amount"),
        date_format(col("dim_valid_from"), "yyyy-MM-dd"))
      .as[(String, Double, String)].collect.toSet
    assert(facts == Set(
      ("BR1", 11.0, "2024-06-01"),
      ("BR2", 21.0, "2024-01-01"),
      ("BR3", 35.0, "2024-01-01"),
      ("BR4", 40.0, "2024-06-01")))
  }

  test("pitJoin picks the dim version valid on each fact date") {
    import graft.operators.Scd2
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      (1L, 10.0, d("1990-01-01"), Some(d("1995-01-01")), false),
      (1L, 20.0, d("1995-01-01"), None, true),
      (2L, 5.0, d("1993-01-01"), None, true))
      .toDF("key", "bal", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (100L, 1L, d("1994-06-01")), // version 1
      (101L, 1L, d("1995-01-01")), // boundary: new version opens ON asOf
      (102L, 2L, d("1992-01-01")), // before any version -> NULL
      (103L, 3L, d("1996-01-01"))) // unknown key -> NULL
      .toDF("fid", "fkey", "fdate")
    val got = Scd2.pitJoin(facts, dim, "fkey", "key", "fdate")
      .select(col("fid"), col("bal")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(100L -> Some(10.0), 101L -> Some(20.0),
      102L -> None, 103L -> None))
  }

  test("config mirrors table_configs.json and rejects undeclared SCD types") {
    assert(cfg.naturalKey == Seq("booking_reference") && cfg.scdType == 2 &&
      cfg.stagingTable == "staging_booking_sales" &&
      cfg.factTable == "fact_booking_sales")
    val b = batch(("BR1", "WEB", 1.0, 1L))
    val l0 = Warehouse.emptyLayers(cfg, b, dims, measures, "_ingest_id")
    intercept[IllegalArgumentException] {
      Warehouse.run(cfg.copy(scdType = 1), b, l0, dims, measures,
        "_ingest_id", lit(java.sql.Date.valueOf("2024-01-01")))
    }
  }
}
