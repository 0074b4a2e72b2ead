package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.operators.{Checksum, Chunk, Outliers, Reshape}

/** Reshape (pivot/melt), group-wise outliers, RAG chunking, and the
  * order-insensitive table checksum. */
class ReshapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val sales = Seq(
    (2023L, "F", 10.0), (2023L, "F", 20.0), (2023L, "O", 5.0),
    (2024L, "O", 7.0), (2024L, "P", 1.0)
  ).toDF("yr", "status", "amt")

  test("pivotWide: explicit values, two aggs per cell, empty cell semantics") {
    val wide = Reshape.pivotWide(sales, Seq("yr"), "status",
      Seq("F", "O", "P"),
      Seq("cnt" -> count(lit(1)), "amt" -> sum(col("amt"))))
    assert(wide.columns.toSeq ==
      Seq("yr", "F_cnt", "F_amt", "O_cnt", "O_amt", "P_cnt", "P_amt"))
    val by = wide.collect().map(r => r.getLong(0) -> r).toMap
    assert(by(2023L).getLong(1) == 2 && by(2023L).getDouble(2) == 30.0)
    // empty cells are NULL for BOTH aggs (multi-agg pivot goes through
    // per-cell structs, not FILTER aggregates — count included)
    assert(by(2023L).isNullAt(5) && by(2023L).isNullAt(6)) // no P rows
    assert(by(2024L).isNullAt(1) && by(2024L).getLong(5) == 1)
  }

  test("meltLong inverts a wide frame back to (id, variable, value) rows") {
    val wide = Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b")
    val long = Reshape.meltLong(wide, Seq("id"), Seq("a", "b"), "v", "x")
    assert(long.columns.toSeq == Seq("id", "v", "x"))
    assert(long.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet == Set((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L), (2L, "b", 40L)))
  }

  test("zscore flags exactly the planted outlier with correct moments") {
    // group g: 99 values of 10.0 and one 1000.0 -> the 1000 is >3 sigma;
    // group h: constant -> zero variance, no outliers (and no div-by-zero)
    val rows = (1 to 99).map(i => ("g", i.toLong, 10.0)) :+ ("g", 100L, 1000.0)
    val df = (rows ++ (1 to 50).map(i => ("h", 200L + i, 42.0)))
      .toDF("grp", "id", "v")
    val out = Outliers.zscore(df, Seq("grp"), "v", 3.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("grp") == "g" && r.getAs[Long]("id") == 100L)
    assert(r.getAs[Long]("grp_n") == 100L)
    assert(math.abs(r.getAs[Double]("grp_mean") - 19.9) < 1e-6)
    // sigma = sqrt(E[x^2] - mean^2) = sqrt(98515.99 - 396.01) = 98.5^ish
    assert(r.getAs[Double]("z") > 9.0)
  }

  test("tokenChunks: full coverage, overlap, short tail, tiny doc") {
    val words = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words), (2L, "only three words")).toDF("doc_id", "text")
    val chunks = Chunk.tokenChunks(df, "text", "doc_id", chunkSize = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts 1, 49, 97 -> lengths 64, 64, 54
    assert(d1.map(_._3).toSeq == Seq(64L, 64L, 54L))
    // consecutive chunks share exactly 16 tokens
    val (c0, c1) = (d1(0)._4.split(" "), d1(1)._4.split(" "))
    assert(c0.takeRight(16).sameElements(c1.take(16)))
    // every token appears in some chunk
    assert(d1.flatMap(_._4.split(" ")).toSet.size == 150)
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == 3L)
  }

  test("tableChecksum: order-insensitive, change-sensitive, dup-pair safe") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      .toDF("k", "tag")
    def sum(df: org.apache.spark.sql.DataFrame): Set[Row] =
      Checksum.tableChecksum(df, Seq("tag"), Seq("k", "tag")).collect().toSet
    val expected = sum(base)
    // arbitrary reordering/partitioning must not change the checksum
    assert(sum(base.repartition(7, col("k")).sortWithinPartitions(desc("k")))
      == expected)
    // a single changed row must change its group's checksum
    val changed = Seq((1L, "a"), (2L, "b"), (99L, "a"), (4L, "c")).toDF("k", "tag")
    assert(sum(changed) != expected)
    // a duplicated pair XORs to the same hash but count+sum catch it
    val dupped = Seq((1L, "a"), (1L, "a"), (3L, "a")).toDF("k", "tag")
    val once = Seq((3L, "a")).toDF("k", "tag")
    val dRow = sum(dupped).head
    val oRow = sum(once).head
    assert(dRow.getAs[Long]("xor_hash") == oRow.getAs[Long]("xor_hash"))
    assert(dRow.getAs[Long]("n_rows") != oRow.getAs[Long]("n_rows"))
  }

  test("diffTables reports added/removed/changed keys and drops unchanged") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val right = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    val diff = Checksum.diffTables(left, right, "k", Seq("v"))
      .as[(Long, String)].collect().toSet
    assert(diff == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
    val summary = Checksum.diffSummary(left, right, "k", Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(summary == Map("removed" -> 1L, "changed" -> 1L,
      "added" -> 1L, "unchanged" -> 1L))
  }
}
