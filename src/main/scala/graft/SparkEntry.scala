package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is exposed as a named query over the driver's test tables,
  * with a DuckDB oracle where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All query definitions, in stable registration order. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ LogAnalytics.defs ++ TextPipeline.defs ++ Vectors.defs ++
      Alerting.defs ++ Search.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(allDefs.map(d => d.name -> d.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ListMap(allDefs.flatMap(d => d.oracle.map(o => d.name -> o.trim)): _*)
}
