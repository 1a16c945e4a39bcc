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
