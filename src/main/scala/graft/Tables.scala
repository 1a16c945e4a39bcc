package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; callers
  * select/filter and the scan narrows accordingly.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalize the `ts` column to session-TZ TimestampType regardless of
    * which testdata generation produced the parquet:
    *  - TIMESTAMP(NANOS) → LongType (via spark.sql.legacy.parquet.nanosAsLong,
    *    set in GraftSession/Verify/Bench): integer-divide to µs — floor
    *    semantics, matching DuckDB's epoch_us on the same values.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType: cast to
    *    TimestampType. Session TZ is UTC everywhere, so values are unchanged.
    * Projection-only, so it works on streaming frames too.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
