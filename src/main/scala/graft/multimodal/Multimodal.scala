package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and per-item transforms
  * (decode, feature-extract, frame-sample) are expressed as distributed
  * column operations so a 100 TB corpus partitions like any other table.
  *
  * The actual codec step is STUBBED: this container has no image/audio
  * libraries, so `fakeDecode` derives deterministic pseudo-metadata from
  * the bytes. The Spark-side contract — schema, batch shape, partitioning,
  * null behavior — is real and tested; swapping in a real decoder means
  * replacing ONLY the marked expressions (e.g. with a JNI-backed UDF or a
  * `mapInArrow` batch over the payload column).
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

  /** Wrap any string column as a binary media payload (test-data shim). */
  def asMedia(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"),
      encode(col(strCol), "UTF-8").as("payload"),
      element_at(typedLit(Seq("image/png", "image/jpeg", "audio/wav")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("media_type"))

  /** ??? STUB — deterministic fake decode. A real implementation binds an
    * image codec here; everything downstream (schema, partitioning, null
    * handling) is production-shaped. Null payload → null meta, matching a
    * decoder's failure contract. */
  def fakeDecode(payload: Column): Column =
    when(payload.isNull, lit(null).cast(mediaSchema("meta").dataType))
      .otherwise(struct(
        (crc32(payload) % 1920 + 1).cast(IntegerType).as("width"),
        (crc32(payload) % 1080 + 1).cast(IntegerType).as("height"),
        when(crc32(payload) % 2 === 0, "rgb").otherwise("rgba").as("format")))

  /** Byte-histogram feature vector (16 buckets) — a real, distributed
    * feature-extract over the raw bytes (no stub): one pass per payload
    * inside codegen, no shuffle. */
  def byteHistogram(payload: Column, buckets: Int = 16): Column = {
    // hex() → two chars per byte; bucket by first hex nibble.
    val hexed = hex(payload)
    val idxs = sequence(lit(1), greatest((length(hexed) / 2).cast(IntegerType), lit(1)))
    val nibbles = transform(idxs, i => conv(hexed.substr(i * 2 - 1, lit(1)), 16, 10).cast(IntegerType))
    transform(sequence(lit(0), lit(buckets - 1)),
      b => size(filter(nibbles, n => n === b)))
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
