package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Morton z-order layout: bit-interleave correctness against a reference
  * implementation, bucket prefixes, clustering locality. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave: bit i of column j lands at output i*k + j. */
  private def zRef(xs: Seq[Long], bits: Int): Long = {
    val k = xs.size
    xs.zipWithIndex.map { case (x, j) =>
      (0 until bits).map(i => ((x >> i) & 1L) << (i * k + j)).sum
    }.sum
  }

  test("zValue matches the reference interleave on exhaustive small inputs") {
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == zRef(Seq(x, y), 4), s"($x,$y)") }
    // all 256 z-values distinct (interleave is a bijection on the domain)
    assert(got.map(_._3).distinct.length == 256)
  }

  test("zValue masks to the requested bits and supports 3 columns") {
    val df = Seq((65536L + 5L, 2L, 3L)).toDF("a", "b", "c")
    val z = df.select(Layout.zValue(Seq(col("a"), col("b"), col("c")),
      bits = 4).as("z")).as[Long].head
    assert(z == zRef(Seq(5L, 2L, 3L), 4)) // 65536 masked away
  }

  test("zBucket is the z-range prefix; neighbors in both dims co-bucket") {
    // 16x16 grid, 4 buckets -> quadrants: bucket = top 2 of 8 bits
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val b = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zBucket(Layout.zValue(Seq(col("x"), col("y")), 4), 4, 2, 4).as("b"))
      .as[(Long, Long, Long)].collect().map { case (x, y, bb) => ((x, y), bb) }.toMap
    // quadrants of the grid = the 2 top interleaved bits (y msb, x msb)
    rows.foreach { case (x, y) =>
      val want = ((y >> 3) << 1) | (x >> 3)
      assert(b((x, y)) == want, s"($x,$y)") }
  }

  test("zBucketStats: per-bucket bounds are tight on BOTH dimensions") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val stats = Layout.zBucketStats(rows.toDF("x", "y"), Seq("x", "y"),
      bits = 6, numBuckets = 16).collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      val (nRows, minX, maxX, minY, maxY) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nRows == 64L * 64L / 16L)
      // each of the 16 buckets covers a 16x16 tile: span 15 on both dims —
      // a single-column sort would leave one dimension's span at 63
      assert(maxX - minX == 15L && maxY - minY == 15L, r.toString) }
  }

  test("clusterByZ range-partitions by z: partitions hold contiguous z-ranges") {
    val rows = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toSeq
    val parted = Layout.clusterByZ(rows.toDF("x", "y"), Seq(col("x"), col("y")),
      bits = 5)
    val ranges = parted
      .select(spark_partition_id().as("pid"), col("_zval"))
      .groupBy("pid").agg(min("_zval").as("lo"), max("_zval").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    // non-overlapping, ordered ranges == contiguous z-clustered files
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
