package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: payloads carry REAL container headers and
  * decodeHeader parses them back byte-for-byte; schema, batch shape,
  * null behavior and determinism are what a pixel-codec swap relies on. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "hello world"), // png
    (1L, "a much longer payload with plenty of bytes to chunk"), // jpeg
    (2L, "gif body"), // gif
    (3L, "x"), // png
    (4L, "jpeg again, different COM length")).toDF("doc_id", "text")

  test("asMedia produces the media schema with binary payloads") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    assert(m.columns.toSeq == Seq("media_id", "payload", "media_type"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val types = m.select("media_type").as[String].collect.toSet
    assert(types == Set("image/png", "image/jpeg", "image/gif"))
  }

  test("decodeHeader parses PNG/JPEG/GIF headers; null payload -> null meta") {
    val m = Multimodal.asMedia(docs, "doc_id", "text")
      .withColumn("payload", when(col("media_id") === 3, lit(null)).otherwise(col("payload")))
      .withColumn("meta", Multimodal.decodeHeader(col("payload")))
    val rows = m.orderBy("media_id").collect()
    // width/height/format must round-trip the id arithmetic of the shim
    for (r <- rows if !r.isNullAt(3)) {
      val id = r.getLong(0)
      val meta = r.getStruct(3)
      assert(meta.getInt(0) == (id % 1920 + 1).toInt, s"width of $id")
      assert(meta.getInt(1) == (id % 1080 + 1).toInt, s"height of $id")
      val expectFmt = (id % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "gif"
      }
      assert(meta.getString(2) == expectFmt, s"format of $id")
    }
    assert(rows(3).isNullAt(3), "null payload must decode to null meta")
  }

  test("decodeHeader: JPEG marker scan survives shifted SOF offsets and rejects garbage") {
    // ids 1 and 4 embed different COM lengths -> SOF sits at different
    // offsets; both must decode. Random text bytes must NOT decode.
    val m = Multimodal.asMedia(docs.filter(col("doc_id") % 3 === 1), "doc_id", "text")
      .withColumn("meta", Multimodal.decodeHeader(col("payload")))
    assert(m.filter(col("meta").isNull).count() == 0)
    val garbage = docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", Multimodal.decodeHeader(col("payload")))
    assert(garbage.filter(col("meta").isNotNull).count() == 0)
  }

  test("decodeAvHeader parses WAV/MP4 headers; garbage and nulls reject") {
    val m = Multimodal.asAvMedia(docs, "doc_id", "text")
      .withColumn("meta", Multimodal.decodeAvHeader(col("payload")))
    val rows = m.orderBy("media_id").collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val meta = r.getStruct(3)
      assert(meta != null, s"meta of $id")
      if (id % 2 == 0) { // wav
        val channels = (id / 2 % 2 + 1).toInt
        val rate = (8000 + (id % 5) * 8000).toInt
        val bits = ((id % 3 + 1) * 8).toInt
        val textBytes = docs.filter(col("doc_id") === id)
          .select(length(encode(col("text"), "UTF-8"))).as[Int].head.toLong
        assert(meta.getString(0) == "wav" && meta.getInt(1) == channels &&
          meta.getInt(2) == rate && meta.getInt(3) == bits, s"wav fields of $id")
        assert(meta.getLong(4) == textBytes * 1000L / (rate * channels * bits / 8),
          s"wav duration of $id")
        assert(meta.isNullAt(5) && meta.isNullAt(6), s"wav has no dims ($id)")
      } else { // mp4
        assert(meta.getString(0) == "mp4" &&
          meta.getLong(4) == (id * 37) % 100000 + 1000 &&
          meta.getInt(5) == (id % 1920 + 1).toInt &&
          meta.getInt(6) == (id % 1080 + 1).toInt, s"mp4 fields of $id")
        assert(meta.isNullAt(1) && meta.isNullAt(2) && meta.isNullAt(3),
          s"mp4 has no audio fields ($id)")
      }
    }
    val garbage = docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", Multimodal.decodeAvHeader(col("payload")))
    assert(garbage.filter(col("meta").isNotNull).count() == 0)
    val nulls = docs.select(lit(null).cast("binary").as("payload"))
      .withColumn("meta", Multimodal.decodeAvHeader(col("payload")))
    assert(nulls.filter(col("meta").isNotNull).count() == 0)
  }

  test("decodeAvHeader: version-1 mvhd/tkhd (64-bit times) also decode") {
    // hand-built v1 boxes — the shim only emits v0, so cover v1 here:
    // mvhd v1 = 120 bytes (8+4+8+8+4+8+4+2+10+36+24+4),
    // tkhd v1 = 104 bytes (8+4+8+8+4+4+8+8+8+36+4+4)
    def be32(v: Long): Seq[Byte] =
      Seq(24, 16, 8, 0).map(s => ((v >> s) & 0xFF).toByte)
    def be64(v: Long): Seq[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    def cc(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq
    val matrix = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
    val mvhd = be32(120) ++ cc("mvhd") ++ Seq[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(600) ++ be64(1234) ++
      be32(0x00010000L) ++ Seq[Byte](1, 0) ++ Seq.fill(10)(0.toByte) ++
      matrix ++ Seq.fill(24)(0.toByte) ++ be32(2)
    val tkhd = be32(104) ++ cc("tkhd") ++ Seq[Byte](1, 0, 0, 7) ++
      be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++ be64(1234) ++
      Seq.fill(16)(0.toByte) ++ matrix ++
      be32(640L << 16) ++ be32(480L << 16)
    val trak = be32(8 + 104) ++ cc("trak") ++ tkhd
    val moov = be32(8 + 120 + 112) ++ cc("moov") ++ mvhd ++ trak
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("isom") ++ be32(0)
    val payload = (ftyp ++ moov).toArray
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(Multimodal.decodeAvHeader(col("payload")).as("meta"))
      .selectExpr("meta.format", "meta.duration_ms", "meta.width", "meta.height")
      .as[(String, Long, Int, Int)].head
    // duration 1234 ticks at timescale 600 -> 2056 ms (floor)
    assert(got == ("mp4", 1234L * 1000 / 600, 640, 480))
  }

  test("asModernMedia WEBP flavors round-trip the id arithmetic; MP3 decodes") {
    // ids 0/1/2 rotate VP8 / VP8L / VP8X, 3 is MP3; id 4 wraps to VP8
    val m = Multimodal.asModernMedia(docs, "doc_id", "text")
      .withColumn("img", Multimodal.decodeHeader(col("payload")))
      .withColumn("av", Multimodal.decodeAvHeader(col("payload")))
      .orderBy("media_id").collect()
    for (r <- m; id = r.getLong(0) if id % 4 < 3) {
      val img = r.getStruct(r.fieldIndex("img"))
      assert(img != null, s"webp $id must decode")
      assert(img.getInt(0) == (id % 1920 + 1).toInt, s"width of $id")
      assert(img.getInt(1) == (id % 1080 + 1).toInt, s"height of $id")
      assert(img.getString(2) == "webp")
      assert(r.isNullAt(r.fieldIndex("av")), s"webp $id is not a/v")
    }
    val mp3 = m(3)
    assert(mp3.isNullAt(mp3.fieldIndex("img")), "mp3 is not an image")
    val av = mp3.getStruct(mp3.fieldIndex("av"))
    assert(av.getString(0) == "mp3")
    assert(av.getInt(1) == 2)      // id 3 odd -> stereo
    assert(av.getInt(2) == 44100)  // srIdx = 3 % 3 = 0
    // CBR estimate: (4 frame bytes + body) * 8 / kbps, bIdx = 3%14+1 = 4
    val bodyLen = "x".getBytes("UTF-8").length
    assert(av.getLong(4) == (4L + bodyLen) * 8 / 56)
  }

  test("MP3 decode: ID3 skip, bare-sync accept, and rejection contract") {
    import graft.plans.AvExpressions
    def dec(hex: String) = Seq(hex).toDF("h")
      .select(AvExpressions.avMeta(unhex(col("h"))).as("m"))
      .select(col("m.format"), col("m.channels"), col("m.sample_rate"),
        col("m.duration_ms")).collect()(0)
    // bare frame sync at offset 0 (no ID3): MPEG1 L3 128kbps 44100 joint
    // stereo + 96 body bytes -> (4 + 96) * 8 / 128 = 6 ms
    val bare = dec("FFFB90" + "40" + "00" * 96)
    assert(bare.getString(0) == "mp3" && bare.getInt(1) == 2 &&
      bare.getInt(2) == 44100 && bare.getLong(3) == 6L)
    // ID3v2 tag with 5-byte body, sync after it
    val tagged = dec("494433040000" + "00000005" + "00" * 5 + "FFFBC0C0" + "00" * 60)
    assert(tagged.getString(0) == "mp3" && tagged.getInt(1) == 1 &&
      tagged.getInt(2) == 44100)
    // sync NOT at 0 and no ID3 anchor -> null (contract: arbitrary
    // binaries with FF Ex somewhere inside must not "decode")
    assert(dec("00FFFB9040" + "00" * 40).isNullAt(0))
    // Layer II frame (layer bits 10) -> null (only Layer III decoded)
    assert(dec("FFFD9040" + "00" * 40).isNullAt(0))
    // reserved sample-rate index -> null
    assert(dec("FFFB9C40" + "00" * 40).isNullAt(0))
    // truncated: ID3 header promising more than present -> null
    assert(dec("4944330400000000007F").isNullAt(0))
    // ID3-prefixed binary whose only FF Ex pair sits far past the 4 KB
    // padding window -> null (the ID3 path honors the same strictness
    // as the offset-0 rule; an unbounded scan would "decode" any
    // 'ID3'-prefixed blob containing those two bytes anywhere)
    val farSync = "494433040000" + "00000000" + "00" * 5000 + "FFFB9040" + "00" * 40
    assert(dec(farSync).isNullAt(0))
    // sync within the padding window (64 pad bytes after the tag) decodes
    val padded = dec("494433040000" + "00000000" + "00" * 64 + "FFFB9040" + "00" * 40)
    assert(padded.getString(0) == "mp3" && padded.getInt(2) == 44100)
  }

  test("WEBP decode: truncation and unknown first chunk reject") {
    import graft.plans.ImageExpressions
    def dec(hex: String) = Seq(hex).toDF("h")
      .select(ImageExpressions.imageMeta(unhex(col("h"))).as("m")).collect()(0)
    // VP8 chunk but sync code corrupted -> null
    val badSync = "52494646" + "2C000000" + "57454250" + "56503820" + "16000000" +
      "000000" + "FF012A" + "0A00" + "0A00" + "00" * 10
    assert(dec(badSync).isNullAt(0))
    // unknown first chunk id -> null
    val alph = "52494646" + "2C000000" + "57454250" + "414C5048" + "16000000" + "00" * 22
    assert(dec(alph).isNullAt(0))
    // VP8L needs only 25 bytes total: 3x4 (w-1=3, h-1=... pack 3 | 4<<14)
    val bits = 3L | (4L << 14)
    val lHex = "52494646" + "11000000" + "57454250" + "5650384C" + "05000000" +
      "2F" + f"${bits & 0xFF}%02X${(bits >> 8) & 0xFF}%02X${(bits >> 16) & 0xFF}%02X${(bits >> 24) & 0xFF}%02X"
    val l = dec(lHex)
    assert(l.getStruct(0).getInt(0) == 4 && l.getStruct(0).getInt(1) == 5)
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

  test("resizeSpec fits within bounds, preserves aspect, never upscales") {
    val dims = Seq((1L, 1920, 1080), (2L, 100, 50), (3L, 256, 1024), (4L, 0, 0))
      .toDF("id", "w", "h")
    val got = dims.select(col("id"),
        Multimodal.resizeSpec(col("w"), col("h"), 256, 256).as("rs"))
      .select(col("id"), col("rs.target_w"), col("rs.target_h"), col("rs.scale"))
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 256, 144, 0.133333)) // downscale, aspect kept
    assert(got(2L) == (2L, 100, 50, 1.0))       // small image untouched
    assert(got(3L) == (3L, 64, 256, 0.25))      // height-bound wins
    assert(got(4L)._2 == 1 && got(4L)._3 == 1)  // degenerate dims clamp to 1
  }

  test("dHash64: deterministic, brightness-structure-sensitive, tail-local edits stay near") {
    import graft.multimodal.{Multimodal => M}
    // identical payloads hash identically
    val p = Seq((1L, "the quick brown fox jumps over the lazy dog " * 8))
      .toDF("id", "s").select(encode(col("s"), "UTF-8").as("p"))
    val h2 = p.union(p).select(M.dHash64(col("p"))).as[Long].collect()
    assert(h2(0) == h2(1))
    // a trailing same-length edit moves only the last cells' means:
    // hamming must stay <= 3 (the planted-twin contract)
    val body = "w" + ("abcdefgh" * 40) // 321 bytes, ~5 bytes per cell
    val twin = body.dropRight(2) + "zq"
    val far = "zyxw" * 80 + "q" // same length, different structure
    val hs = Seq(body, twin, far).toDF("s")
      .select(M.dHash64(encode(col("s"), "UTF-8"))).as[Long].collect()
    assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) <= 3,
      s"tail edit moved ${java.lang.Long.bitCount(hs(0) ^ hs(1))} bits")
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) > 3,
      "structurally different payloads must not be near")
    // NULL / empty payloads yield NULL, not a crash or zero
    val n = Seq((1, "")).toDF("i", "s")
      .select(M.dHash64(when(col("i") === 2, encode(col("s"), "UTF-8"))))
      .collect().head
    assert(n.isNullAt(0))
    assert(Seq((1, "")).toDF("i", "s")
      .select(M.dHash64(encode(col("s"), "UTF-8"))).collect().head.isNullAt(0))
  }

  test("mediaNearDups surfaces exactly the planted twins via the blocked join") {
    import graft.multimodal.{Multimodal => M}
    val rng = new scala.util.Random(7)
    def randText() = Seq.fill(60)(
      ("a" + rng.alphanumeric.take(6).mkString)).mkString(" ")
    val base = (0L until 40L).map(i => (i, randText())).toDF("doc_id", "text")
    val twins = base.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        concat(col("text").substr(lit(1), length(col("text")) - 2),
          lit("zq")).as("text"))
    val media = M.asMedia(base, "doc_id", "text")
      .unionByName(M.asMedia(twins, "doc_id", "text")
        .withColumn("media_id", col("media_id") + lit(500000L)))
    val pairs = M.mediaNearDups(media, "payload", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 40L by 2).map(i => (i, i + 500000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missing planted twins: ${(expected -- pairs).take(5)}")
    // no unrelated pair sneaks under the hamming bound
    assert((pairs -- expected).isEmpty,
      s"false near-dups: ${(pairs -- expected).take(5)}")
  }

  test("frameSample keeps every stride-th fixed-size chunk") {
    val m = Multimodal.asMedia(docs.filter(col("doc_id") === 1), "doc_id", "text")
    val frames = Multimodal.frameSample(m, chunkBytes = 8, stride = 2)
      .orderBy("frame_idx").collect()
    // payload = 16 + (1 % 7 + 1) = 18 header bytes + 52 text bytes = 70
    // -> 9 chunks -> indices 0,2,4,6,8 kept
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    val lens = frames.map(_.getAs[Array[Byte]]("frame").length).toSeq
    assert(lens.init.forall(_ == 8) && lens.last <= 8)
  }
}
