package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and per-item transforms
  * (decode, feature-extract, frame-sample) are expressed as distributed
  * column operations so a 100 TB corpus partitions like any other table.
  *
  * The header decode is REAL: [[decodeHeader]] parses PNG / GIF / JPEG
  * container headers and [[decodeAvHeader]] parses WAV/RIFF and
  * MP4/ISO-BMFF from the raw bytes (public byte-layout specs, no codec
  * library — see graft.plans.ImageMeta / graft.plans.AvMeta). Pixel and
  * sample decoding would bind here the same way (a batch codec over the
  * payload column); the byte-histogram and frame-sampling transforms
  * below already operate on the full payload bytes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))))))

  /** Decode container metadata (width/height/format) from the payload
    * bytes — PNG signature+IHDR, GIF87a/89a logical screen, JPEG marker
    * scan to SOFn. NULL payload or unrecognized container -> NULL meta
    * (a decoder's failure contract). One codegen-adjacent projection,
    * no shuffle. */
  def decodeHeader(payload: Column): Column =
    graft.plans.ImageExpressions.imageMeta(payload)

  /** Decode audio/video container metadata from the payload bytes —
    * WAV/RIFF chunk walk (channels, sample rate, bit depth, duration
    * from data size / byte rate) and MP4/ISO-BMFF box walk (mvhd
    * timescale+duration, tkhd 16.16 track dimensions). NULL payload or
    * unrecognized container -> NULL meta. Same contract and cost shape
    * as [[decodeHeader]]: one projection, no shuffle. */
  def decodeAvHeader(payload: Column): Column =
    graft.plans.AvExpressions.avMeta(payload)

  /** Test-data shim: wrap a string column as a binary media payload that
    * carries a REAL image header — a valid PNG, JPEG, or GIF header
    * (rotating on id) with dimensions derived from the id, followed by
    * the text bytes as the opaque body. The JPEG variant inserts a
    * variable-length COM segment before SOF0 so the marker scan in
    * [[decodeHeader]] is exercised at varying offsets. */
  def asMedia(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val id = col(idCol).cast(LongType)
    val w = (id % 1920 + 1).cast(IntegerType)
    val h = (id % 1080 + 1).cast(IntegerType)
    val fmt = id % 3 // 0 = png, 1 = jpeg, 2 = gif
    def beHex16(c: Column) = lpad(hex(c), 4, "0")
    def beHex32(c: Column) = lpad(hex(c), 8, "0")
    def leHex16(c: Column) =
      concat(lpad(hex(c % 256), 2, "0"), lpad(hex((c / 256).cast(IntegerType)), 2, "0"))
    val comLen = (id % 7 + 1).cast(IntegerType) // COM payload bytes

    // PNG: signature, IHDR length+type, w/h u32be, bitdepth/color/etc
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
      beHex32(w), beHex32(h), lit("0806000000"))
    // JPEG: SOI, COM (variable length), SOF0 (len 17, precision 8,
    // h u16be, w u16be, 3 components)
    val jpgHex = concat(lit("FFD8FFFE"), beHex16(comLen + 2),
      repeat(lit("78"), comLen),
      lit("FFC0001108"), beHex16(h), beHex16(w), lit("03"))
    // GIF: GIF89a, logical screen w/h u16le
    val gifHex = concat(lit("474946383961"), leHex16(w), leHex16(h))

    val headerHex = when(fmt === 0, pngHex).when(fmt === 1, jpgHex).otherwise(gifHex)
    df.select(id.as("media_id"),
      concat(unhex(headerHex), encode(col(strCol), "UTF-8")).as("payload"),
      when(fmt === 0, "image/png").when(fmt === 1, "image/jpeg")
        .otherwise("image/gif").as("media_type"))
  }

  /** Test-data shim for a/v: wrap a string column as a binary payload
    * carrying a REAL audio/video container header — a valid WAV (even
    * ids) or MP4 (odd ids) built from the id arithmetic, body = text
    * bytes. The WAV inserts a variable-length LIST chunk between `fmt `
    * and `data` and the MP4 a variable-length `free` box before `moov`,
    * so the chunk/box walks in [[decodeAvHeader]] are exercised at
    * varying offsets (the q42 COM-segment trick). */
  def asAvMedia(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val id = col(idCol).cast(LongType)
    def beHex16(c: Column) = lpad(hex(c), 4, "0")
    def beHex32(c: Column) = lpad(hex(c), 8, "0")
    def leHex16(c: Column) =
      concat(lpad(hex(c % 256), 2, "0"), lpad(hex((c / 256) % 256), 2, "0"))
    def leHex32(c: Column) =
      concat(lpad(hex(c % 256), 2, "0"), lpad(hex((c / 256) % 256), 2, "0"),
        lpad(hex((c / 65536) % 256), 2, "0"), lpad(hex((c / 16777216) % 256), 2, "0"))

    val dataLen = length(encode(col(strCol), "UTF-8")).cast(LongType)
    // WAV fields (even ids)
    val channels = (id / 2 % 2 + 1).cast(LongType)         // 1 or 2
    val rate = (lit(8000L) + (id % 5) * 8000L)             // 8k..40k
    val bits = ((id % 3 + 1) * 8)                          // 8/16/24
    val byteRate = rate * channels * bits / 8
    val blockAlign = channels * bits / 8
    val listLen = (id % 7 + 1) * 2                         // even, 2..14
    val riffSize = lit(4L) + (8L + 16L) + (lit(8L) + listLen) + (lit(8L) + dataLen)
    val wavHex = concat(
      lit("52494646"), leHex32(riffSize), lit("57415645"),          // RIFF/WAVE
      lit("666D7420"), leHex32(lit(16L)), leHex16(lit(1L)),          // fmt , PCM
      leHex16(channels), leHex32(rate), leHex32(byteRate),
      leHex16(blockAlign), leHex16(bits),
      lit("4C495354"), leHex32(listLen), repeat(lit("4C"), listLen.cast(IntegerType)),
      lit("64617461"), leHex32(dataLen))                             // data

    // MP4 fields (odd ids); timescale 1000 so duration IS milliseconds
    val durMs = (id * 37) % 100000 + 1000
    val w = (id % 1920 + 1).cast(LongType)
    val h = (id % 1080 + 1).cast(LongType)
    val freeLen = (id % 7).cast(LongType)                  // 0..6 body bytes
    val unityMatrix = "000100000000000000000000" +
      "000000000001000000000000" + "000000000000000040000000"
    val mvhdHex = concat(beHex32(lit(108L)), lit("6D766864"), lit("00000000"),
      lit("0000000000000000"), beHex32(lit(1000L)), beHex32(durMs),
      lit("00010000"), lit("0100"), repeat(lit("00"), 10),
      lit(unityMatrix), repeat(lit("00"), 24), beHex32(lit(2L)))
    val tkhdHex = concat(beHex32(lit(92L)), lit("746B6864"), lit("00000007"),
      lit("0000000000000000"), beHex32(lit(1L)), lit("00000000"),
      beHex32(durMs), repeat(lit("00"), 8), repeat(lit("00"), 8),
      lit(unityMatrix), beHex32(w * 65536L), beHex32(h * 65536L))
    val mp4Hex = concat(
      beHex32(lit(16L)), lit("6674797069736F6D"), beHex32(lit(0L)),   // ftyp isom
      beHex32(freeLen + 8L), lit("66726565"), repeat(lit("00"), freeLen.cast(IntegerType)),
      beHex32(lit(8L + 108L + 8L + 92L)), lit("6D6F6F76"),            // moov
      mvhdHex, beHex32(lit(100L)), lit("7472616B"), tkhdHex)          // trak

    val headerHex = when(id % 2 === 0, wavHex).otherwise(mp4Hex)
    df.select(id.as("media_id"),
      concat(unhex(headerHex), encode(col(strCol), "UTF-8")).as("payload"),
      when(id % 2 === 0, "audio/wav").otherwise("video/mp4").as("media_type"))
  }

  /** Test-data shim for the modern-web formats: wrap a string column as
    * a binary payload carrying a REAL WEBP (all three first-chunk
    * flavors — lossy `VP8 `, lossless `VP8L`, extended `VP8X`, rotating
    * on id) or MP3 (ID3v2 tag of varying size + MPEG1 Layer III frame
    * header, bitrate/sample-rate/mode derived from the id), body = text
    * bytes. Every header field is id arithmetic, so an oracle can
    * recompute the expected decode without parsing bytes. */
  def asModernMedia(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val id = col(idCol).cast(LongType)
    def hex8(c: Column) = lpad(hex(c % 256), 2, "0")
    def leHex16(c: Column) = concat(hex8(c), hex8(c / 256))
    def leHex24(c: Column) = concat(hex8(c), hex8(c / 256), hex8(c / 65536))
    def leHex32(c: Column) = concat(hex8(c), hex8(c / 256), hex8(c / 65536),
      hex8(c / 16777216))

    val dataLen = length(encode(col(strCol), "UTF-8")).cast(LongType)
    val w = (id % 1920 + 1).cast(LongType)
    val h = (id % 1080 + 1).cast(LongType)
    val fmt = id % 4 // 0 = VP8, 1 = VP8L, 2 = VP8X, 3 = MP3

    // WEBP variants: RIFF size = 4 (WEBP) + 8 (chunk hdr) + chunk payload
    val vp8Hex = concat(lit("52494646"), leHex32(lit(22L) + dataLen),
      lit("57454250"), lit("56503820"), leHex32(lit(10L) + dataLen),
      lit("000000"), lit("9D012A"), leHex16(w), leHex16(h))
    val vp8lBits = (w - 1) + (h - 1) * 16384L // 14-bit fields of a u32le
    val vp8lHex = concat(lit("52494646"), leHex32(lit(17L) + dataLen),
      lit("57454250"), lit("5650384C"), leHex32(lit(5L) + dataLen),
      lit("2F"), leHex32(vp8lBits))
    val vp8xHex = concat(lit("52494646"), leHex32(lit(22L) + dataLen),
      lit("57454250"), lit("56503858"), leHex32(lit(10L) + dataLen),
      lit("00"), lit("000000"), leHex24(w - 1), leHex24(h - 1))

    // MP3: ID3v2.4 tag with id%7 pad bytes, then an MPEG1 Layer III
    // frame header — bitrate index 1..14, sample-rate index 0..2,
    // mono for even ids
    val pad = (id % 7).cast(LongType)
    val bIdx = (id % 14 + 1).cast(LongType)
    val srIdx = (id % 3).cast(LongType)
    val mp3Hex = concat(lit("494433"), lit("0400"), lit("00"),
      lit("000000"), hex8(pad), repeat(lit("00"), pad.cast(IntegerType)),
      lit("FFFB"), hex8(bIdx * 16 + srIdx * 4),
      when(id % 2 === 0, lit("C0")).otherwise(lit("00")))

    val headerHex = when(fmt === 0, vp8Hex).when(fmt === 1, vp8lHex)
      .when(fmt === 2, vp8xHex).otherwise(mp3Hex)
    df.select(id.as("media_id"),
      concat(unhex(headerHex), encode(col(strCol), "UTF-8")).as("payload"),
      when(fmt === 3, "audio/mpeg").otherwise("image/webp").as("media_type"))
  }

  /** Byte-histogram feature vector (16 buckets) — a real, distributed
    * feature-extract over the raw bytes: one pass per payload inside
    * codegen, no shuffle. */
  def byteHistogram(payload: Column, buckets: Int = 16): Column = {
    // hex() → two chars per byte; bucket by first hex nibble.
    val hexed = hex(payload)
    val idxs = sequence(lit(1), greatest((length(hexed) / 2).cast(IntegerType), lit(1)))
    val nibbles = transform(idxs, i => conv(hexed.substr(i * 2 - 1, lit(1)), 16, 10).cast(IntegerType))
    transform(sequence(lit(0), lit(buckets - 1)),
      b => size(filter(nibbles, n => n === b)))
  }

  /** Media content DIFFERENCE HASH — see [[graft.plans.DHash64]]: the
    * pHash-family near-dup sketch, one long per payload, computed in a
    * single byte pass. The coarse-grid/difference structure is the
    * public dHash; the luminance extractor is the environment-stubbed
    * step (raw bytes as deterministic fake grayscale — a deployment
    * binds a decode-to-luma codec here, nothing else changes). */
  def dHash64(payload: Column): Column =
    graft.plans.ImageExpressions.dHash64(payload)

  /** Media content near-dup pairs: [[dHash64]] per payload, then the
    * SAME blocked Hamming search the text SimHash family runs
    * ([[graft.operators.TextDedup.packedNearDups]] — 4 × 16-bit chunk
    * blocking, pigeonhole-complete for hamming ≤ 3, `bit_count(a^b)`
    * verify). One fixed-width row per payload on the shuffle regardless
    * of media size; returns (id_a, id_b, hamming). */
  def mediaNearDups(media: DataFrame, payloadCol: String, idCol: String,
                    maxHamming: Int = 3): DataFrame =
    graft.operators.TextDedup.packedNearDups(
      media.select(col(idCol).as("_id"), dHash64(col(payloadCol)).as("_ph")),
      maxHamming, 4, 16)

  /** Resize PLAN for decoded media: target dimensions fitting within
    * `maxW` x `maxH` with aspect ratio preserved and no upscaling, plus
    * the scale factor — the metadata half of a thumbnail stage, as a
    * pure codegen'd projection over the decoded header. The pixel
    * resampling itself would bind a codec over the payload column (not
    * available in this environment); the per-item target geometry a
    * resize scheduler needs is real and distributed. */
  def resizeSpec(width: Column, height: Column, maxW: Int, maxH: Int): Column = {
    require(maxW > 0 && maxH > 0, s"bounds must be positive, got ${maxW}x$maxH")
    val scale = least(lit(1.0),
      lit(maxW.toDouble) / width.cast(DoubleType),
      lit(maxH.toDouble) / height.cast(DoubleType))
    struct(
      greatest(round(width * scale).cast(IntegerType), lit(1)).as("target_w"),
      greatest(round(height * scale).cast(IntegerType), lit(1)).as("target_h"),
      bround(scale, 6).as("scale"))
  }

  /** Frame-sampling shape: split the payload into fixed-size chunks and
    * keep every `stride`-th — the batch geometry of video frame sampling,
    * over opaque bytes. */
  def frameSample(df: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val total = length(col("payload"))
    val nChunks = ceil(total.cast(DoubleType) / chunkBytes).cast(IntegerType)
    df.withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(nChunks - 1, lit(0))),
          i => i % stride === 0)))
      .withColumn("frame",
        col("payload").substr((col("frame_idx") * chunkBytes + 1).cast(IntegerType), lit(chunkBytes)))
      .select(col("media_id"), col("frame_idx"), col("frame"))
  }
}
