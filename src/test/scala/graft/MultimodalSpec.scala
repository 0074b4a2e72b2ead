package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: the codec is a stub, but the Spark-side contract
  * (schema, batch shape, null behavior, determinism) is what a real
  * decoder swap relies on — that is what these tests pin down. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, "a much longer payload with plenty of bytes to chunk"),
    (3L, "x")).toDF("doc_id", "text")

  test("asMedia produces the media schema with binary payloads") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    assert(m.columns.toSeq == Seq("media_id", "payload", "media_type"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val types = m.select("media_type").as[String].collect.toSet
    assert(types.subsetOf(Set("image/png", "image/jpeg", "audio/wav")))
  }

  test("fakeDecode: deterministic metadata, null payload -> null meta") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
      .withColumn("payload", when(col("media_id") === 3, lit(null)).otherwise(col("payload")))
      .withColumn("meta", Multimodal.fakeDecode(col("payload")))
    val rows = m.orderBy("media_id").collect()
    val meta1 = rows(0).getStruct(3)
    assert(meta1.getInt(0) >= 1 && meta1.getInt(0) <= 1920)
    assert(meta1.getInt(1) >= 1 && meta1.getInt(1) <= 1080)
    assert(Set("rgb", "rgba").contains(meta1.getString(2)))
    assert(rows(2).isNullAt(3), "null payload must decode to null meta")
    // decode is a pure function of the bytes: two runs agree
    val again = Multimodal.asMedia(docs, "doc_id", "text")
      .withColumn("meta", Multimodal.fakeDecode(col("payload")))
      .orderBy("media_id").collect()(0).getStruct(3)
    assert(again == meta1)
  }

  test("byteHistogram counts every byte exactly once") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
      .withColumn("hist", Multimodal.byteHistogram(col("payload")))
      .withColumn("hist_total", aggregate(col("hist"), lit(0), (a, x) => a + x))
      .withColumn("payload_len", length(col("payload")))
    m.collect().foreach { r =>
      assert(r.getAs[Int]("hist_total") == r.getAs[Int]("payload_len"))
      assert(r.getSeq[Int](r.fieldIndex("hist")).length == 16)
    }
  }

  test("frameSample keeps every stride-th fixed-size chunk") {
    val m = Multimodal.asMedia(docs.filter(col("doc_id") === 2), "doc_id", "text")
    val frames = Multimodal.frameSample(m, chunkBytes = 8, stride = 2)
      .orderBy("frame_idx").collect()
    // 52 bytes -> 7 chunks -> indices 0,2,4,6 kept
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6))
    // all sampled frames except the tail are exactly chunkBytes long
    val lens = frames.map(_.getAs[Array[Byte]]("frame").length).toSeq
    assert(lens.init.forall(_ == 8) && lens.last <= 8)
  }
}
