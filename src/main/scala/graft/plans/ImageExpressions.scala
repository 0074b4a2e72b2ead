package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-header decoding as pure byte arithmetic over a `binary`
  * payload column — no codec library. Container formats are public
  * specifications:
  *
  *  - PNG (RFC 2083 / W3C): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
  *    first chunk must be IHDR; width and height are big-endian u32 at
  *    byte offsets 16 and 20.
  *  - GIF (GIF87a/GIF89a spec): 6-byte magic, then logical-screen width
  *    and height as little-endian u16 at offsets 6 and 8.
  *  - JPEG (ITU T.81): `FF D8` (SOI), then marker segments scanned in
  *    order — each `FF mm` with a big-endian u16 length (standalone
  *    markers TEM/RSTn excepted, fill `FF` bytes allowed) — until a
  *    start-of-frame marker SOFn (C0-CF minus C4/C8/CC, which are
  *    DHT/JPG/DAC); the frame header carries height then width as
  *    big-endian u16 at +5/+7. The scan is a real loop, so metadata
  *    position varies per file (e.g. after COM/APPn segments).
  *  - WEBP (RIFF container, Google spec): `RIFF` + u32le size + `WEBP`,
  *    then one of three first chunks — `VP8 ` (lossy: 3-byte frame tag,
  *    sync `9D 01 2A`, then 14-bit width/height in u16le fields),
  *    `VP8L` (lossless: `2F` signature, then width-1 / height-1 as two
  *    14-bit fields of a u32le), `VP8X` (extended: canvas width-1 /
  *    height-1 as u24le at payload offsets 4 and 7).
  *
  * Output: struct(width INT, height INT, format STRING), or NULL when
  * the payload matches no container (a decoder's failure contract).
  */
case class ImageMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def be32(i: Int): Int =
      ((u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)) & 0x7FFFFFFF
    def row(w: Int, h: Int, fmt: String): InternalRow =
      new GenericInternalRow(Array[Any](w, h, UTF8String.fromString(fmt)))

    val n = b.length
    if (n >= 24 &&
        u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
        u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A &&
        u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R') {
      row(be32(16), be32(20), "png")
    } else if (n >= 10 &&
        u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
        (u(4) == '7' || u(4) == '9') && u(5) == 'a') {
      row(u(6) | (u(7) << 8), u(8) | (u(9) << 8), "gif")
    } else if (n >= 25 &&
        u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'E' && u(10) == 'B' && u(11) == 'P') {
      def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
      def le24(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16)
      def le32(i: Int): Long = (le16(i).toLong | (le16(i + 2).toLong << 16)) & 0xFFFFFFFFL
      // first chunk id at 12, payload at 20
      if (n >= 30 && u(12) == 'V' && u(13) == 'P' && u(14) == '8' && u(15) == ' ' &&
          u(23) == 0x9D && u(24) == 0x01 && u(25) == 0x2A) {
        row(le16(26) & 0x3FFF, le16(28) & 0x3FFF, "webp")
      } else if (u(12) == 'V' && u(13) == 'P' && u(14) == '8' && u(15) == 'L' &&
          u(20) == 0x2F) {
        val bits = le32(21)
        row(((bits & 0x3FFF) + 1).toInt, (((bits >> 14) & 0x3FFF) + 1).toInt, "webp")
      } else if (n >= 30 && u(12) == 'V' && u(13) == 'P' && u(14) == '8' && u(15) == 'X') {
        row(le24(24) + 1, le24(27) + 1, "webp")
      } else null
    } else if (n >= 4 && u(0) == 0xFF && u(1) == 0xD8) {
      // marker-segment scan for SOFn
      var p = 2
      var out: InternalRow = null
      var done = false
      while (!done && p + 1 < n) {
        if (u(p) != 0xFF) done = true // desync — not a valid stream
        else {
          var q = p + 1
          while (q < n && u(q) == 0xFF) q += 1 // fill bytes
          if (q >= n) done = true
          else {
            val m = u(q)
            val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
            if (isSof) {
              // segment: len u16 at q+1, precision u8 at q+3,
              // height u16 at q+4, width u16 at q+6
              if (q + 7 < n) out = row(be16(q + 6), be16(q + 4), "jpeg")
              done = true
            } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) {
              p = q + 1 // standalone marker, no length field
            } else if (q + 2 < n) {
              val len = be16(q + 1)
              if (len < 2) done = true else p = q + 1 + len
            } else done = true
          }
        }
      }
      out
    } else null
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

/** Difference hash (dHash — the pHash family's cheapest member) over a
  * media payload: 65 equal-span cells of mean "luminance", bit j set iff
  * cell j+1 is brighter than cell j, packed MSB-first into one long
  * (TextDedup.packBits' bit order, so the SimHash 4×16-bit chunk
  * blocking join applies verbatim). The structure is the public dHash
  * (difference of a coarse grid, invariant to global brightness/scale
  * shifts); the LUMINANCE EXTRACTOR is the environment-stubbed step —
  * pixel codecs are not available here, so raw payload bytes stand in
  * as the deterministic fake (documented contract: a real deployment
  * swaps in a decode-to-grayscale batch codec; every Spark-side shape —
  * one pass per payload, one long on the shuffle, the blocking join —
  * is identical). One byte pass per row, no allocation beyond two
  * 65-slot arrays; NULL/empty payload → NULL. */
case class DHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n == 0) null
    else {
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      var i = 0
      while (i < n) {
        val cell = ((i.toLong * 65L) / n).toInt
        sums(cell) += (b(i) & 0xFF)
        cnts(cell) += 1
        i += 1
      }
      def mean(j: Int): Double =
        if (cnts(j) == 0) 0.0 else sums(j).toDouble / cnts(j)
      var acc = 0L
      var j = 0
      while (j < 64) {
        acc = acc * 2L + (if (mean(j + 1) > mean(j)) 1L else 0L)
        j += 1
      }
      acc
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object ImageExpressions {
  def imageMeta(payload: Column): Column =
    ColumnBridge.column(ImageMeta(ColumnBridge.expression(payload)))

  def dHash64(payload: Column): Column =
    ColumnBridge.column(DHash64(ColumnBridge.expression(payload)))
}
