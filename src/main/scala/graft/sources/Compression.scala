package graft.sources

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Magic-byte compression inference (reference S1: transformer infers
  * gzip/zstd/none from Content-Encoding, extension, and magic bytes —
  * lib/rust/transformer/src/main.rs:205-251), with STREAMING decode: each
  * task opens its file through the Hadoop filesystem, sniffs the leading
  * bytes, wraps the open stream in the matching decompressor, and yields
  * lines lazily — per-task memory is one read buffer, never the whole
  * decompressed object (the reference streams the same way,
  * main.rs:537-543). zstd decodes via the zstd-jni Spark already ships for
  * parquet; gzip via java.util.zip (multi-member streams decode fully).
  *
  * Parallelism is per-file — inherent to non-splittable gzip/zstd objects,
  * matching the reference's one-object-per-message model. At 100 TB the
  * unit of work stays a single log object; many objects spread across
  * tasks via the path repartition below.
  */
object Compression {

  val GzipMagic: Array[Byte] = Array(0x1f.toByte, 0x8b.toByte)
  val ZstdMagic: Array[Byte] = Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte)

  def codecOf(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == GzipMagic(0) && bytes(1) == GzipMagic(1)) "gzip"
    else if (bytes.length >= 4 && bytes.take(4).sameElements(ZstdMagic)) "zstd"
    else "none"

  /** Lazy `(path, line)` iterator over one file, codec inferred from magic
    * bytes on the open stream (no extension trust, no full-file buffering).
    * The stream closes on exhaustion and, as a backstop, on task end.
    */
  def openLines(fs: FileSystem, p: Path): Iterator[(String, String)] = {
    val raw = fs.open(p)
    // loop to 4 bytes: a single read() may legally return short (network
    // filesystems), which would misclassify a compressed file as text
    val head = new Array[Byte](4)
    var n = 0
    var r = 0
    while (n < 4 && r >= 0) {
      r = raw.read(head, n, 4 - n)
      if (r > 0) n += r
    }
    raw.seek(0L)
    val in: InputStream = codecOf(head.take(math.max(n, 0))) match {
      case "gzip" => new GZIPInputStream(raw)
      case "zstd" => new com.github.luben.zstd.ZstdInputStream(raw)
      case _      => raw
    }
    val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[(String, String)] {
      private var nextLine: String = reader.readLine()
      override def hasNext: Boolean = nextLine != null
      override def next(): (String, String) = {
        val l = nextLine
        nextLine = reader.readLine()
        if (nextLine == null) closeOnce()
        (p.toString, l)
      }
    }
  }

  /** Read a directory of possibly-misnamed text files as `{path, line}`
    * rows, inferring the codec per file from its magic bytes.
    */
  def readLinesInferred(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hconf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    val files = fs.globStatus(root) match {
      case null | Array() =>
        // not a glob match: treat as a directory listing
        if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty
      case matched => matched.toIndexedSeq.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
    }
    val paths = files.filter(_.isFile).map(_.getPath.toString)
    val parallelism = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(paths)
      .repartition(parallelism)
      .mapPartitions { it =>
        it.flatMap { p =>
          val hp = new Path(p)
          openLines(hp.getFileSystem(hconf.value), hp)
        }
      }
      .toDF("path", "line")
  }
}
