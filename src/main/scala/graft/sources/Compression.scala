package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Magic-byte compression inference (reference S1: transformer infers
  * gzip/zstd/none from Content-Encoding, extension, and magic bytes —
  * lib/rust/transformer/src/main.rs:205-251).
  *
  * Spark's text source already dispatches on file extension; this covers
  * the reference's extra case — misnamed files — by sniffing leading
  * bytes via the binaryFile source and decompressing in a partition pass.
  * Multi-member gzip streams decode fully (GZIPInputStream handles
  * concatenated members).
  */
object Compression {

  val GzipMagic: Array[Byte] = Array(0x1f.toByte, 0x8b.toByte)
  val ZstdMagic: Array[Byte] = Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte)

  def codecOf(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == GzipMagic(0) && bytes(1) == GzipMagic(1)) "gzip"
    else if (bytes.length >= 4 && bytes.take(4).sameElements(ZstdMagic)) "zstd"
    else "none"

  /** Read a directory of possibly-misnamed text files as `{path, line}`
    * rows, inferring the codec per file from its magic bytes. gzip and
    * plain are decoded here; zstd is recognized and routed to Spark's
    * codec (by extension) or rejected with a clear error.
    */
  def readLinesInferred(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val decoded = codecOf(bytes) match {
          case "gzip" =>
            val in = new BufferedReader(new InputStreamReader(
              new GZIPInputStream(new java.io.ByteArrayInputStream(bytes)),
              StandardCharsets.UTF_8))
            Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
          case "zstd" =>
            sys.error(s"zstd payload with wrong extension: $p — rename to .zst for codec dispatch")
          case _ =>
            new String(bytes, StandardCharsets.UTF_8).linesIterator.toVector
        }
        decoded.map(l => (p, l))
      }
      .toDF("path", "line")
  }
}
