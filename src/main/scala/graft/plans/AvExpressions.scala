package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real audio/video container-header decoding as pure byte arithmetic —
  * the a/v twin of [[ImageMeta]]. Container formats are public
  * specifications:
  *
  *  - WAV (RIFF, Microsoft/IBM multimedia spec): `RIFF` + u32le size +
  *    `WAVE`, then a chunk walk (`id` 4CC + u32le size, sizes padded to
  *    even): the `fmt ` chunk carries audio format, channel count,
  *    sample rate, byte rate, block align and bits per sample as
  *    little-endian fields; the `data` chunk's size over the byte rate
  *    gives the duration. The walk is a real loop, so optional chunks
  *    (`LIST`, `fact`, …) before `data` are skipped correctly.
  *  - MP4 (ISO/IEC 14496-12 ISO base media file format): a box tree
  *    (u32be size + 4CC type, size 1 = u64be largesize); `moov/mvhd`
  *    carries timescale + duration (version 0: u32 pair; version 1:
  *    u32 timescale + u64 duration), `moov/trak/tkhd` carries track
  *    width/height as 16.16 fixed-point at the end of the box.
  *  - MP3 (ISO/IEC 11172-3 Layer III + ID3v2 informal standard): an
  *    optional `ID3` tag (10-byte header, syncsafe-u28 size, +10 if the
  *    footer flag is set) is skipped, then the stream is scanned for the
  *    first frame sync (`FF` + 3 set bits); the 4-byte frame header
  *    carries MPEG version, layer, bitrate index, sample-rate index and
  *    channel mode. Only Layer III is decoded (the format's namesake
  *    profile); duration is the standard CBR estimate —
  *    remaining-bytes x 8 / bitrate.
  *
  * Output: struct(format, channels, sample_rate, bits, duration_ms,
  * width, height) — audio fields NULL for video-only metadata and vice
  * versa; the whole struct NULL when the payload matches neither
  * container (a decoder's failure contract, same as ImageMeta).
  */
case class AvMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    def u(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3).toLong << 24)) & 0xFFFFFFFFL
    def be32(i: Int): Long =
      ((u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)) & 0xFFFFFFFFL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourCC(i: Int, s: String): Boolean =
      i + 4 <= n && b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
        b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

    if (n >= 44 && fourCC(0, "RIFF") && fourCC(8, "WAVE")) {
      // ---- WAV: chunk walk over [12, n) ----
      var p = 12
      var channels = -1; var rate = -1L; var byteRate = -1L; var bits = -1
      var dataLen = -1L
      while (p + 8 <= n && (channels < 0 || dataLen < 0)) {
        val size = le32(p + 4)
        if (fourCC(p, "fmt ") && p + 8 + 16 <= n) {
          channels = le16(p + 10)
          rate = le32(p + 12)
          byteRate = le32(p + 16)
          bits = le16(p + 22)
        } else if (fourCC(p, "data")) {
          // size may legitimately exceed the bytes present (streaming
          // writes); duration uses the declared size
          dataLen = size
        }
        p += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
        if (size > Int.MaxValue - 16) p = n    // corrupt size: stop
      }
      if (channels < 0) null
      else {
        val dur: Any =
          if (dataLen >= 0 && byteRate > 0) dataLen * 1000L / byteRate else null
        new GenericInternalRow(Array[Any](UTF8String.fromString("wav"),
          channels, rate.toInt, bits, dur, null, null))
      }
    } else if (n >= 16 && fourCC(4, "ftyp")) {
      // ---- MP4: box walk. boxEnd = start of next sibling, or -1 ----
      def boxSize(p: Int): Long = {
        if (p + 8 > n) return -1L
        val s = be32(p)
        if (s == 1L) { if (p + 16 > n) -1L else be64(p + 8) }
        else if (s == 0L) (n - p).toLong // box extends to EOF
        else s
      }
      var timescale = -1L; var duration = -1L
      var width = -1; var height = -1
      def walkTrak(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end && width < 0) {
          val s = boxSize(p)
          if (s < 8) return
          if (fourCC(p + 4, "tkhd") && p + s <= end) {
            val v = u(p + 8)
            val base = if (v == 1) p + 8 + 4 + 8 + 8 + 4 + 4 + 8 else p + 8 + 4 + 4 + 4 + 4 + 4 + 4
            // base -> 8 reserved + layer/altgroup/volume/reserved (8) + matrix (36)
            val wOff = base + 8 + 8 + 36
            if (wOff + 8 <= p + s && wOff + 8 <= n) {
              val w = (be32(wOff) >> 16).toInt
              val h = (be32(wOff + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          }
          p += s.toInt
        }
      }
      def walkMoov(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val s = boxSize(p)
          if (s < 8) return
          if (fourCC(p + 4, "mvhd") && p + s <= end) {
            val v = u(p + 8)
            if (v == 1 && p + 40 <= n) {
              timescale = be32(p + 28); duration = be64(p + 32)
            } else if (v == 0 && p + 32 <= n) {
              timescale = be32(p + 20); duration = be32(p + 24)
            }
          } else if (fourCC(p + 4, "trak")) {
            walkTrak(p + 8, math.min(end, p + s.toInt))
          }
          p += s.toInt
        }
      }
      var p = 0
      var found = false
      while (p + 8 <= n && !found) {
        val s = boxSize(p)
        if (s < 8) p = n
        else {
          if (fourCC(p + 4, "moov")) {
            walkMoov(p + 8, math.min(n, p + s.toInt))
            found = true
          }
          p += s.toInt
        }
      }
      if (!found || timescale <= 0) null
      else new GenericInternalRow(Array[Any](UTF8String.fromString("mp4"),
        null, null, null, duration * 1000L / timescale,
        if (width > 0) width else null, if (height > 0) height else null))
    } else {
      // ---- MP3: skip ID3v2 if present, find frame sync, read header ----
      var p = 0
      val hasId3 = n >= 10 && u(0) == 'I' && u(1) == 'D' && u(2) == '3'
      if (hasId3) {
        val tagSize = ((u(6) & 0x7F) << 21) | ((u(7) & 0x7F) << 14) |
          ((u(8) & 0x7F) << 7) | (u(9) & 0x7F)
        p = 10 + tagSize + (if ((u(5) & 0x10) != 0) 10 else 0) // footer flag
        // real MP3s may pad between tag and first frame — scan for sync,
        // but only within a small padding window: an unbounded scan would
        // reopen exactly the hole the offset-0 strictness below closes
        // (any 'ID3'-prefixed binary with an FF Ex pair ANYWHERE in its
        // body would "decode" as mp3 with garbage bitrate/duration)
        val scanEnd = math.min(n, p + 4096)
        while (p + 4 <= scanEnd && !(u(p) == 0xFF && (u(p + 1) & 0xE0) == 0xE0)) p += 1
        if (p + 4 > scanEnd ||
            !(u(p) == 0xFF && (u(p + 1) & 0xE0) == 0xE0)) p = n // reject
      }
      // without an ID3 anchor the sync must sit at offset 0 — scanning
      // arbitrary binaries for FF Ex would break the null-on-unrecognized
      // contract (any payload with those two bytes would "decode")
      if (p + 4 > n ||
          !(u(p) == 0xFF && (u(p + 1) & 0xE0) == 0xE0)) null
      else {
        val version = (u(p + 1) >> 3) & 3     // 0=2.5, 2=MPEG2, 3=MPEG1
        val layer = (u(p + 1) >> 1) & 3       // 1 = Layer III
        val bitrateIdx = (u(p + 2) >> 4) & 15
        val srIdx = (u(p + 2) >> 2) & 3
        val mode = (u(p + 3) >> 6) & 3        // 3 = mono
        val sampleRate =
          if (srIdx == 3) -1
          else if (version == 3) Array(44100, 48000, 32000)(srIdx)
          else if (version == 2) Array(22050, 24000, 16000)(srIdx)
          else if (version == 0) Array(11025, 12000, 8000)(srIdx)
          else -1
        val kbps =
          if (bitrateIdx == 0 || bitrateIdx == 15) -1 // free/bad
          else if (version == 3)
            Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(bitrateIdx - 1)
          else Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(bitrateIdx - 1)
        if (layer != 1 || sampleRate < 0 || kbps < 0) null
        else new GenericInternalRow(Array[Any](UTF8String.fromString("mp3"),
          if (mode == 3) 1 else 2, sampleRate, null,
          (n - p).toLong * 8L / kbps, null, null))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AvMeta =
    copy(child = newChild)
}

object AvExpressions {
  def avMeta(payload: Column): Column =
    ColumnBridge.column(AvMeta(ColumnBridge.expression(payload)))
}
