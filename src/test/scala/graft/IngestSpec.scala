package graft

import java.nio.file.Files

import graft.sources.{Compression, Framing}
import graft.streaming.Ingest
import graft.transform.managed.CloudTrail
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end ingest: raw line → transform → resolve → hour-partitioned
  * lake, plus compression inference and the CloudTrail managed mapping
  * (FIXTURES.md F1).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val ctLine =
    """{"eventVersion":"1.08","eventTime":"2023-01-10T21:31:12Z","eventSource":"iam.amazonaws.com","eventName":"AddUserToGroup","awsRegion":"us-east-1","sourceIPAddress":"1.2.3.4","userAgent":"aws-cli/2.9","userIdentity":{"type":"Root","principalId":"AIDA1","arn":"arn:aws:iam::123456789012:root","accountId":"123456789012","accessKeyId":"AKIA1","userName":"root"},"requestParameters":{"userName":"bob"},"responseElements":null,"requestID":"r-1","eventID":"e-1","eventType":"AwsApiCall","managementEvent":true,"readOnly":false,"recipientAccountId":"123456789012"}"""

  test("cloudtrail managed transform maps the F1 fixture to ECS") {
    val framed = Framing.preTransformJsonParse(
      Seq(ctLine, "not json at all").toDF("message"))
    val out = CloudTrail(framed)
    val rows = out.collect()
    assert(rows.length == 1) // non-JSON line has no ts → aborted
    val r = rows.head
    assert(out.select("event.action").head.getString(0) == "AddUserToGroup")
    assert(out.select("cloud.account.id").head.getString(0) == "123456789012")
    assert(out.select("related.ip").head.getSeq[String](0) == Seq("1.2.3.4"))
    assert(out.select("related.user").head.getSeq[String](0) == Seq("root"))
    assert(out.select("aws.cloudtrail.request_parameters").head.getString(0)
      == """{"userName":"bob"}""")
    assert(out.select("ecs.version").head.getString(0) == "8.5.0")
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString
      == "2023-01-10T21:31:12Z")
  }

  test("streaming ingest: landing json → transform → lake with sidelining") {
    val tmp = Files.createTempDirectory("graft_ingest")
    val landing = tmp.resolve("landing").toString
    val lake = tmp.resolve("lake").toString
    val side = tmp.resolve("side").toString
    val ckpt = tmp.resolve("ckpt").toString
    Seq(
      """{"ts":"2024-01-01T05:30:00Z","event_type":"click","user_id":"7"}""",
      """{"ts":"2024-01-01T06:10:00Z","event_type":"error","user_id":"8"}""",
      """{"ts":"2024-01-01T06:20:00Z","event_type":"error","user_id":"not-a-number"}"""
    ).toDF("value").coalesce(1).write.text(landing)

    val landingSchema = StructType(Seq(
      StructField("ts", StringType), StructField("event_type", StringType),
      StructField("user_id", StringType)))
    val target = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("user_id", LongType)))
    val p = Ingest.Pipeline(
      transform = df => df.withColumn("ts", to_timestamp(col("ts"))),
      target = target, lakePath = lake, sidelinePath = side)
    Ingest.runOnce(spark, landing, landingSchema, p, ckpt)

    val lakeDf = graft.lake.Lake.read(spark, lake)
    assert(lakeDf.count() == 2)
    assert(lakeDf.select("ts_hour").as[String].collect().toSet
      == Set("2024-01-01-05", "2024-01-01-06"))
    val sidelined = spark.read.option("recursiveFileLookup", "true").json(side)
    assert(sidelined.count() == 1)
    // exactly-once: re-running with the same checkpoint ingests nothing new
    Ingest.runOnce(spark, landing, landingSchema, p, ckpt)
    assert(graft.lake.Lake.read(spark, lake).count() == 2)
  }

  test("batch backfill ledger: re-runs are no-ops, new files process incrementally") {
    val tmp = Files.createTempDirectory("graft_backfill")
    val landing = tmp.resolve("landing")
    Files.createDirectories(landing)
    val lake = tmp.resolve("lake").toString
    val side = tmp.resolve("side").toString
    val ledger = tmp.resolve("ledger").toString
    def drop(name: String, lines: String*): Unit =
      Files.write(landing.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
    drop("a.json", """{"ts":"2024-01-01T05:30:00Z","event_type":"click","user_id":"7"}""")
    drop("b.json", """{"ts":"2024-01-01T06:10:00Z","event_type":"error","user_id":"8"}""")
    val landingSchema = StructType(Seq(
      StructField("ts", StringType), StructField("event_type", StringType),
      StructField("user_id", StringType)))
    val target = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("user_id", LongType)))
    val p = Ingest.Pipeline(
      transform = df => df.withColumn("ts", to_timestamp(col("ts"))),
      target = target, lakePath = lake, sidelinePath = side)
    assert(Ingest.backfillOnce(spark, landing.toString, landingSchema, p, ledger) == 2)
    assert(graft.lake.Lake.read(spark, lake).count() == 2)
    // idempotent: the ledger makes a re-run a no-op
    assert(Ingest.backfillOnce(spark, landing.toString, landingSchema, p, ledger) == 0)
    assert(graft.lake.Lake.read(spark, lake).count() == 2)
    // incremental: only the NEW file processes on the next run
    drop("c.json", """{"ts":"2024-01-01T07:00:00Z","event_type":"view","user_id":"9"}""")
    assert(Ingest.backfillOnce(spark, landing.toString, landingSchema, p, ledger) == 1)
    val lakeDf = graft.lake.Lake.read(spark, lake)
    assert(lakeDf.count() == 3)
    assert(lakeDf.select("ts_hour").as[String].collect().toSet
      == Set("2024-01-01-05", "2024-01-01-06", "2024-01-01-07"))
    assert(spark.read.parquet(ledger).count() == 3)
  }

  test("queue-source ingest: identical pipeline from a non-file stream (S9 parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val tmp = Files.createTempDirectory("graft_qingest")
    val lake = tmp.resolve("lake").toString
    val side = tmp.resolve("side").toString
    val ckpt = tmp.resolve("ckpt").toString
    val landingSchema = StructType(Seq(
      StructField("ts", StringType), StructField("event_type", StringType),
      StructField("user_id", StringType)))
    val target = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("user_id", LongType)))
    // same Pipeline contract as the file test; only the framing differs
    // (queue messages arrive as a `value` payload, Kafka-style)
    val p = Ingest.Pipeline(
      transform = df => df
        .select(from_json(col("value"), landingSchema).as("j")).select("j.*")
        .withColumn("ts", to_timestamp(col("ts"))),
      target = target, lakePath = lake, sidelinePath = side)

    val input = MemoryStream[String](spark)
    input.addData(
      """{"ts":"2024-01-01T05:30:00Z","event_type":"click","user_id":"7"}""",
      """{"ts":"2024-01-01T06:20:00Z","event_type":"error","user_id":"not-a-number"}""")
    Ingest.startFromStream(input.toDF(), p, ckpt, Trigger.AvailableNow())
      .awaitTermination()
    assert(graft.lake.Lake.read(spark, lake).count() == 1)
    assert(spark.read.option("recursiveFileLookup", "true").json(side).count() == 1)

    // restart from the same checkpoint: old messages are not reprocessed,
    // new ones are — queue offsets live in the checkpoint (exactly-once)
    input.addData(
      """{"ts":"2024-01-01T07:00:00Z","event_type":"click","user_id":"9"}""")
    Ingest.startFromStream(input.toDF(), p, ckpt, Trigger.AvailableNow())
      .awaitTermination()
    val lakeDf = graft.lake.Lake.read(spark, lake)
    assert(lakeDf.count() == 2)
    import spark.implicits._
    assert(lakeDf.select("ts_hour").as[String].collect().toSet
      == Set("2024-01-01-05", "2024-01-01-07"))
  }

  test("magic-byte inference decodes misnamed gzip next to plain text") {
    val tmp = Files.createTempDirectory("graft_gz")
    val gzPath = tmp.resolve("mislabeled.log") // gzip content, no .gz ext
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("line-a\nline-b\n".getBytes("UTF-8")); gz.close()
    Files.write(gzPath, bos.toByteArray)
    Files.write(tmp.resolve("plain.log"), "line-c\n".getBytes("UTF-8"))
    val out = Compression.readLinesInferred(spark, tmp.toString)
    assert(out.select("line").as[String].collect().sorted.toSeq
      == Seq("line-a", "line-b", "line-c"))
  }

  test("magic-byte inference decodes misnamed zstd via zstd-jni") {
    val tmp = Files.createTempDirectory("graft_zst")
    val bos = new java.io.ByteArrayOutputStream()
    val zs = new com.github.luben.zstd.ZstdOutputStream(bos)
    zs.write("zline-1\nzline-2\n".getBytes("UTF-8")); zs.close()
    Files.write(tmp.resolve("mislabeled.json"), bos.toByteArray)
    val out = Compression.readLinesInferred(spark, tmp.toString)
    assert(out.select("line").as[String].collect().sorted.toSeq
      == Seq("zline-1", "zline-2"))
  }

  test("openLines is lazy: first lines of a large gzip stream come without full decode") {
    val tmp = Files.createTempDirectory("graft_lazy")
    val f = tmp.resolve("big.log")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(f))
    val w = new java.io.PrintWriter(gz)
    (1 to 200000).foreach(i => w.println(s"line-$i"))
    w.close()
    val hp = new org.apache.hadoop.fs.Path(f.toString)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = Compression.openLines(fs, hp)
    // pull only the head of the iterator — a buffering implementation would
    // have to decode all 200k lines before yielding the first
    assert(it.take(3).map(_._2).toList == List("line-1", "line-2", "line-3"))
    assert(it.hasNext) // stream still open, rest not materialized
  }

  test("metadata routing: key patterns route, skip, and default per object") {
    val tmp = Files.createTempDirectory("graft_route")
    Files.write(tmp.resolve("acct_CloudTrail-Digest_x.json"), "d1\nd2\n".getBytes("UTF-8"))
    Files.write(tmp.resolve("acct_CloudTrail-Insights_y.json"), "i1\n".getBytes("UTF-8"))
    Files.write(tmp.resolve("acct_CloudTrail_z.json"), "r1\nr2\nr3\n".getBytes("UTF-8"))
    Files.write(tmp.resolve("junk_manifest.checksum"), "x\n".getBytes("UTF-8"))
    val routed = Framing.routeByFileMetadata(
      spark.read.text(tmp.toString),
      Seq(
        Framing.MetadataRoute("checksum", None), // skip
        Framing.MetadataRoute("Digest", Some("digest")),
        Framing.MetadataRoute("Insights", Some("insights"))))
    val counts = routed.groupBy("__table").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("digest" -> 2L, "insights" -> 1L, "default" -> 3L))
    val tables = Framing.routedTables(routed, Seq("digest", "insights", "default"))
    assert(tables("digest").count() == 2)
    assert(tables("default").columns.toSeq == Seq("value"))
  }

  test("streaming dedup within watermark drops re-delivered file ids") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, java.sql.Timestamp)](spark)
    val deduped = input.toDF().toDF("file_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("file_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData(("f1", t), ("f1", t), ("f2", t))
    q.processAllAvailable()
    input.addData(("f1", t)) // re-delivery in a later batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_sink").count() == 2)
  }
}
