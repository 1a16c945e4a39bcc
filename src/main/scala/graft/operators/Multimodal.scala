package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batch-shaped partition passes.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — schema, batching, partition-wise
  * processing, metadata extraction — is real: swap `decodeStub` for a
  * JNI/codec call and the operator is production-shaped. At cluster scale
  * the binary column stays columnar (parquet binary), partitions are sized
  * by `spark.sql.files.maxPartitionBytes`, and the decode pass is
  * mapPartitions so per-partition library init (codec contexts) happens
  * once, not per row.
  */
object Multimodal {

  /** Typed metadata extracted without decoding: byte length, an 8-byte
    * header prefix (hex), and a modality guess from the header. Pure
    * column expressions — cheap, pushdown-friendly.
    */
  def withBinaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("header_hex", hex(substring(col(binCol), 1, 8)))

  final case class MediaFeatures(width: Int, height: Int, channels: Int, checksum: Long)

  /** STUB decode: deterministic pseudo-features from the byte content.
    * Real implementation: per-partition codec init + actual decode.
    */
  def decodeStub(bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 16 + (math.abs(h) % 1920).toInt
    MediaFeatures(w, 16 + (math.abs(h >> 11) % 1080).toInt, 3, h)
  }

  /** Partition-wise feature extraction over a binary column. The
    * `mapPartitions` boundary is where a real pipeline initializes its
    * decoder once per partition (the per-batch shape Pandas-UDF pipelines
    * use); rows stream through without materializing the partition.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // real pipeline: init codec context here, once per partition
      rows.map { r =>
        val f = decodeStub(r.getAs[Array[Byte]](binIdx))
        (r.getLong(idIdx), f.width, f.height, f.channels, f.checksum)
      }
    }.toDF(idCol, "width", "height", "channels", "checksum")
  }

  /** REAL decode + resize for RAW 8-bit grayscale payloads — no codec
    * library needed (each byte IS a pixel), so this path is fully
    * implemented, not stubbed: height derives from length/width,
    * block-mean pooling resamples to (targetW × targetH), and mean/stddev
    * luminance come from the full-resolution pixels. Compressed codecs
    * (JPEG/PNG/...) still route through [[decodeStub]] until a codec
    * library is present; the partition/batch shape is identical.
    */
  def resizeRawGrayscale(spark: SparkSession, df: DataFrame, idCol: String,
      binCol: String, widthCol: String, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val wIdx = df.schema.fieldIndex(widthCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val w = r.getInt(wIdx)
        if (bytes == null || w <= 0 || bytes.length < w) None
        else {
          val h = bytes.length / w
          // block-mean pooling: output pixel = integer mean of its source
          // rectangle (deterministic; pure integer arithmetic)
          val thumb = new Array[Byte](targetW * targetH)
          var ty = 0
          while (ty < targetH) {
            val y0 = ty * h / targetH
            val y1 = math.max(y0 + 1, (ty + 1) * h / targetH)
            var tx = 0
            while (tx < targetW) {
              val x0 = tx * w / targetW
              val x1 = math.max(x0 + 1, (tx + 1) * w / targetW)
              var sum = 0L; var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) { sum += bytes(y * w + x) & 0xff; n += 1; x += 1 }
                y += 1
              }
              thumb(ty * targetW + tx) = (sum / n).toByte
              tx += 1
            }
            ty += 1
          }
          var s = 0.0; var s2 = 0.0
          val total = w * h
          var i = 0
          while (i < total) { val v = (bytes(i) & 0xff).toDouble; s += v; s2 += v * v; i += 1 }
          val mean = s / total
          val stddev = math.sqrt(math.max(0.0, s2 / total - mean * mean))
          Some((r.getLong(idIdx), w, h, thumb, mean, stddev))
        }
      }
    }.toDF(idCol, "width", "height", "thumbnail", "mean_luminance", "stddev_luminance")
  }

  /** Frame-sampling shape for video-like payloads: split the byte stream
    * into fixed-size "frames", keep every `stride`-th — the plumbing of a
    * frame sampler with a stubbed decoder.
    */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col(binCol)).cast(DoubleType) / frameBytes).cast(IntegerType)
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame", expr(s"substring($binCol, frame_idx * $frameBytes + 1, $frameBytes)"))
  }
}
