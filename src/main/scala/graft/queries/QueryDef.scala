package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One verifiable query: a Spark implementation plus (optionally) an
  * equivalent ANSI SQL oracle the driver runs in DuckDB on the same parquet
  * tables. Column names and values must match exactly (driver sorts columns
  * by name, then hashes values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Oracle-parity numeric helpers.
    *
    * Strategy for float-exact cross-engine results: never hash a value that
    * depends on double summation order. Instead cast each addend to a
    * decimal (exact, since inputs are 2-decimal money values), sum exactly,
    * then cast the exact decimal result to double — IEEE nearest rounding of
    * the same exact value is bit-identical in Spark and DuckDB.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  /** Exact money sum surfaced as double. */
  def msum(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Exact sum of a product expression with up to 6 true decimals. */
  def psum(c: Column): Column = sum(dec6(c)).cast(DoubleType)
  /** Exact average surfaced as double (identical division in both engines). */
  def mavg(c: Column): Column = sum(dec6(c)).cast(DoubleType) / count(lit(1))
}
