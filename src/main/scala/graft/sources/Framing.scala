package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest framing: raw objects → `{ts, message|json}` record streams.
  *
  * Mirrors the reference transformer's line framing (reference
  * lib/rust/transformer/src/main.rs:537-617): JSON object lines become
  * `{ts: now, json: …}`, plain text lines `{ts: now, message: …}`;
  * CloudWatch Logs subscription payloads explode `logEvents[]` into one
  * record each (main.rs:547-605); `expand_records_from_payload` maps a whole
  * file to N records (main.rs:492-524). All are expressed as declarative
  * plans (from_json / explode) so Catalyst keeps them inside whole-stage
  * codegen; compression inference is Spark's built-in codec detection on the
  * text source.
  */
object Framing {

  /** Read newline-delimited text (any Spark-supported codec: .gz/.zst/...)
    * as `{ts, message}`. `ts` is ingest time, as in the reference; callers
    * overwrite it from parsed fields when the source carries event time.
    */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(current_timestamp().as("ts"), col("value").as("message"))

  /** Pre-transform parse (reference main.rs:253-265): when `message` parses
    * as a JSON object, expose it as `json` (string form, for downstream
    * get_json_object / from_json) and null the raw message; otherwise keep
    * `message`. Uses try-parse semantics: malformed JSON stays raw text.
    */
  def preTransformJsonParse(df: DataFrame): DataFrame = {
    // get_json_object returns the object itself for valid JSON, null
    // otherwise — a codegen'd validity probe with no UDF.
    val validJson = col("message").startsWith("{") &&
      get_json_object(col("message"), "$").isNotNull
    df.withColumn("json", when(validJson, col("message")))
      .withColumn("message", when(!validJson, col("message")))
  }

  /** Schema of a CloudWatch Logs subscription payload (FIXTURES.md F5). */
  val cloudwatchSchema: StructType = StructType(Seq(
    StructField("messageType", StringType),
    StructField("owner", StringType),
    StructField("logGroup", StringType),
    StructField("logStream", StringType),
    StructField("subscriptionFilters", ArrayType(StringType)),
    StructField("logEvents", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("timestamp", LongType),
      StructField("message", StringType)))))))

  /** Expand CloudWatch Logs subscription lines into one `{ts, message,
    * log_group, log_stream}` row per log event. DATA_MESSAGE only, as in the
    * reference (control messages are dropped).
    */
  def cloudwatchExpand(lines: DataFrame, messageCol: String = "message"): DataFrame = {
    val parsed = lines.select(from_json(col(messageCol), cloudwatchSchema).as("cw"))
    parsed
      .filter(col("cw.messageType") === "DATA_MESSAGE")
      .select(col("cw.logGroup").as("log_group"), col("cw.logStream").as("log_stream"),
        explode(col("cw.logEvents")).as("ev"))
      .select(
        timestamp_millis(col("ev.timestamp")).as("ts"),
        col("ev.message").as("message"),
        col("log_group"), col("log_stream"))
  }

  /** Payload expansion (UDTF-like, reference main.rs:492-524): a caller-built
    * array column → one row per element, other columns retained.
    */
  def expandRecords(df: DataFrame, recordsArray: Column, as: String = "record"): DataFrame =
    df.withColumn(as, explode(recordsArray))

  /** CSV lines with configured headers (headerless files, reference
    * main.rs:1520-1548 + csv_headers config): flexible arity (missing
    * trailing fields → null), values trimmed.
    */
  def csvWithHeaders(lines: DataFrame, headers: Seq[String], messageCol: String = "message"): DataFrame = {
    val parts = split(col(messageCol), ",")
    headers.zipWithIndex.foldLeft(lines) { case (d, (h, i)) =>
      d.withColumn(h, trim(try_element_at(parts, lit(i + 1))))
    }.drop(messageCol)
  }

  /** Table routing by record content (reference main.rs:864-917): derive a
    * `__table` column from a routing expression; downstream writers filter
    * per table (or `partitionBy(__table)` in one pass).
    */
  def routeByContent(df: DataFrame, route: Column): DataFrame =
    df.withColumn("__table", route)

  /** Split a routed frame into per-table DataFrames (fan-out one source to N
    * tables, reference S7). `tables` enumerates expected route targets.
    */
  def routedTables(df: DataFrame, tables: Seq[String]): Map[String, DataFrame] =
    tables.map(t => t -> df.filter(col("__table") === t).drop("__table")).toMap

  /** One object-metadata routing rule: key pattern → table, or skip the
    * whole object (`table = None`), reference S6's
    * `select_table_from_payload_metadata` (transformer/src/main.rs:405-490;
    * CloudTrail's Digest/Insights routing,
    * aws_cloudtrail/log_source.yml:1-9).
    */
  final case class MetadataRoute(pattern: String, table: Option[String])

  /** Table routing by object metadata: first matching rule on the source
    * file path wins; no match → `default`; a skip rule drops every record
    * of that object. Declarative — `input_file_name()` is constant per
    * file split, so the routing predicate evaluates in codegen with no
    * extra pass, and downstream `partitionBy(__table)` writers fan out in
    * the same scan.
    */
  def routeByFileMetadata(df: DataFrame, routes: Seq[MetadataRoute],
      default: String = "default"): DataFrame = {
    val tableCol = routes.foldRight(lit(default): Column) { case (r, acc) =>
      when(input_file_name().rlike(r.pattern),
        r.table.map(lit).getOrElse(lit(null))).otherwise(acc)
    }
    df.withColumn("__table", tableCol).filter(col("__table").isNotNull)
  }
}
