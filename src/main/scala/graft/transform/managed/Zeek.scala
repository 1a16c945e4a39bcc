package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared shaping for Zeek log tables (reference
  * data/managed/log_sources/zeek/tables/&lt;t&gt;.yml). Every Zeek table repeats the
  * same preamble: abort records without `ts`, lift the dotted `id.*`
  * connection 4-tuple into ECS source/destination, `uid` →
  * zeek.session_id/event.id, epoch-float ts → timestamp, and a related.ip
  * seed. Factoring it keeps each table mapping down to its own fields.
  */
object Zeek {

  /** The conn-id fields shared by most zeek logs (ts, uid, id.*). */
  val connFields: Seq[StructField] = Seq(
    StructField("ts", DoubleType),
    StructField("uid", StringType),
    StructField("id.orig_h", StringType),
    StructField("id.orig_p", IntegerType),
    StructField("id.resp_h", StringType),
    StructField("id.resp_p", IntegerType))

  def connSchema(extra: StructField*): StructType = StructType(connFields ++ extra)

  /** Raw field accessor that survives dotted JSON keys like `id.orig_h`. */
  def r(name: String): Column = col(s"`r`.`$name`")

  /** Parse the JSON line into `r` and drop no-ts records (the `abort`). */
  def parse(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("r", from_json(col("json"), schema))
      .filter(col("r.ts").isNotNull)

  /** The common conn-table preamble: event taxonomy, ts, endpoints, session
    * id, optional transport/protocol constants, related.ip.
    */
  def connBase(df: DataFrame, schema: StructType, kind: String,
               category: Seq[String], types: Seq[String],
               transport: Option[String] = None,
               protocol: Option[String] = None): DataFrame = {
    var out = parse(df, schema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit(kind))
    set("event.category", array(category.map(lit): _*))
    set("event.type", array(types.map(lit): _*))
    set("ts", timestamp_seconds(col("r.ts")))
    set("source.address", r("id.orig_h"))
    set("source.ip", r("id.orig_h"))
    set("source.port", r("id.orig_p"))
    set("destination.address", r("id.resp_h"))
    set("destination.ip", r("id.resp_h"))
    set("destination.port", r("id.resp_p"))
    set("zeek.session_id", col("r.uid"))
    set("event.id", col("r.uid"))
    transport.foreach(t => set("network.transport", lit(t)))
    protocol.foreach(p => set("network.protocol", lit(p)))
    set("related.ip", array_distinct(
      filter(array(r("id.orig_h"), r("id.resp_h")), x => x.isNotNull)))
    out
  }

  /** Drop the raw columns and stamp the ECS footer. */
  def finish(df: DataFrame): DataFrame = ecsFooter(df.drop("r", "json"))

  /** Parse an X.509 distinguished-name string `CN=x,O=y,C=US` into a map
    * (VRL: strip escaped commas, parse_key_value("=", ","), trim).
    *
    * Built entry-by-entry with last-win key dedup rather than str_to_map:
    * real DNs repeat attribute types (`OU=a, OU=b, CN=x`, `DC=a,DC=b`), and
    * a map with duplicate keys throws DUPLICATED_MAP_KEY under Spark's
    * default spark.sql.mapKeyDedupPolicy=EXCEPTION — a whole-batch failure
    * on valid input. DN components are few, so the O(n²) fold is free.
    */
  def dnMap(c: Column): Column = {
    val parts = filter(split(regexp_replace(c, "\\\\,", ""), ","),
      p => p.contains("="))
    val entries = org.apache.spark.sql.functions.transform(parts, e => struct(
      trim(substring_index(e, "=", 1)).as("k"),
      trim(regexp_extract(e, "^[^=]*=(.*)$", 1)).as("v")))
    val deduped = aggregate(
      entries,
      array().cast("array<struct<k:string,v:string>>"),
      (acc, e) => concat(
        filter(acc, a => !(a.getField("k") <=> e.getField("k"))), array(e)))
    map_from_entries(deduped)
  }

  /** DN map → the zeek-side issuer/subject struct (scalar fields). */
  def dnStruct(m: Column): Column = struct(
    element_at(m, "CN").as("common_name"),
    element_at(m, "C").as("country"),
    element_at(m, "L").as("locality"),
    element_at(m, "O").as("organization"),
    element_at(m, "OU").as("organizational_unit"),
    element_at(m, "ST").as("state"))

  /** DN map → the ECS tls.*.x509 struct: each present component becomes a
    * single-element array (VRL's `map_values(compact(m)) -> |v| { [v] }`).
    */
  def x509Dn(m: Column): Column = {
    def one(k: String, n: String): Column = {
      val v = element_at(m, k)
      when(v.isNotNull, array(v)).as(n)
    }
    struct(
      one("CN", "common_name"), one("C", "country"), one("L", "locality"),
      one("O", "organization"), one("OU", "organizational_unit"),
      one("ST", "state_or_province"))
  }
}
