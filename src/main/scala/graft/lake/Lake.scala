package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake layout + maintenance: hour-partitioned columnar storage with
  * partition-level rewrite, mirroring the reference's Iceberg usage
  * (`PARTITIONED BY hours(ts)`, append commits, overwrite-partition
  * retro-updates, hourly bin-pack OPTIMIZE — IcebergMetadataWriter.kt,
  * AlertsIcebergHelper.kt:56-102, iceberg-maintenance.ts:63-66).
  *
  * This environment ships no Iceberg jars, so the physical layer is
  * hour-partitioned zstd parquet with Spark dynamic partition overwrite —
  * the same layout and commit semantics class; on a cluster with an
  * Iceberg catalog these calls become `writeTo(t).append()` /
  * `overwritePartitions()` / `CALL rewrite_data_files` with no operator
  * changes above them.
  */
object Lake {

  val PartitionCol = "ts_hour"

  /** Stamp the reference's `%Y-%m-%d-%H` partition value from event time. */
  def withHourPartition(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn(PartitionCol, date_format(col(tsCol), "yyyy-MM-dd-HH"))

  /** Append rows into hour partitions. */
  def append(df: DataFrame, path: String): Unit =
    withHourPartition(df).write.mode("append")
      .partitionBy(PartitionCol).parquet(path)

  /** Overwrite only the partitions present in `df` (retro-activation /
    * enrichment refresh path). Requires dynamic partitionOverwriteMode,
    * set per-write here so session config stays untouched.
    */
  def overwritePartitions(df: DataFrame, path: String): Unit =
    withHourPartition(df).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(PartitionCol).parquet(path)

  /** Partition-pruned read: `WHERE ts_hour IN …` prunes directories. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Bin-pack one hour partition to ~targetBytes files (the hourly
    * OPTIMIZE job): rewrite that partition's files only.
    */
  def compactHour(spark: SparkSession, path: String, hour: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val part = read(spark, path).filter(col(PartitionCol) === hour)
    val bytes = part.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, (BigDecimal(bytes) / targetBytes).setScale(0, BigDecimal.RoundingMode.CEILING).toInt)
    overwritePartitions(part.repartition(files).drop(PartitionCol), path)
  }
}
