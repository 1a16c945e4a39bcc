package graft

import graft.lake.{IcebergSurface, Lake}
import org.apache.spark.sql.functions._

/** Config-surface gate: the lake facade's layout knobs stay expressed in
  * Iceberg's partition-transform grammar (`hours(ts)`, `bucket(n, col)`)
  * and property names, so the facade swaps for the real runtime when the
  * jars appear. Spec only — no runtime claim (sandbox has no
  * iceberg-spark-runtime; see Lake's scaladoc).
  */
class IcebergSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("partition transforms render in Iceberg DDL grammar") {
    import IcebergSurface._
    assert(Hour("ts").render == "hours(ts)")
    assert(Day("ts").render == "days(ts)")
    assert(Month("ts").render == "months(ts)")
    assert(Bucket(16, "customer_id").render == "bucket(16, customer_id)")
    assert(Truncate(4, "lang").render == "truncate(4, lang)")
    assert(Identity("region").render == "region")
  }

  test("reference-shaped (column, transform) requests parse; unknown throws") {
    import IcebergSurface._
    assert(transformOf("ts", "hour") == Hour("ts"))
    assert(transformOf("id", "bucket[32]") == Bucket(32, "id"))
    assert(transformOf("s", "truncate[8]") == Truncate(8, "s"))
    assert(transformOf("region", "identity") == Identity("region"))
    val e = intercept[RuntimeException](transformOf("x", "void"))
    assert(e.getMessage.contains("void"))
    intercept[IllegalArgumentException](Bucket(0, "id"))
  }

  test("log-source table DDL is the swap-in CREATE TABLE") {
    val spec = IcebergSurface.logSourceTable("matano.aws_cloudtrail")
    assert(spec.partitionedBy == "hours(ts)")
    assert(spec.createDdl ==
      "CREATE TABLE matano.aws_cloudtrail USING iceberg " +
        "PARTITIONED BY (hours(ts)) TBLPROPERTIES " +
        "('format-version'='2', " +
        "'write.distribution-mode'='hash', " +
        "'write.parquet.compression-codec'='zstd')")
    val bucketed = IcebergSurface.bucketedTable(
      "graft.enrich", 16, "customer_id", tsCol = Some("ts"))
    assert(bucketed.partitionedBy == "hours(ts), bucket(16, customer_id)")
  }

  test("v2 + zstd properties match the facade's actual file posture") {
    val p = IcebergSurface.defaultProperties
    // row-level ops (the facade's MERGE/overwrite surface) need v2
    assert(p("format-version") == "2")
    // files the facade writes ARE zstd parquet (GraftSession codec)
    assert(p("write.parquet.compression-codec") == "zstd")
    assert(spark.conf.get("spark.sql.parquet.compression.codec") == "zstd")
  }

  test("facade hour partitioning is the materialization of hours(ts)") {
    // two events in one UTC hour share a partition value; adjacent hours
    // split — exactly Iceberg's hour transform granularity
    val df = Seq(
      (1L, "2024-03-05 12:00:01"), (2L, "2024-03-05 12:59:59"),
      (3L, "2024-03-05 13:00:00"))
      .toDF("id", "raw")
      .withColumn("ts", to_timestamp(col("raw")))
    val parts = Lake.withHourPartition(df)
      .select("id", Lake.PartitionCol).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(parts(1L) == parts(2L) && parts(1L) == "2024-03-05-12")
    assert(parts(3L) == "2024-03-05-13")
  }
}
