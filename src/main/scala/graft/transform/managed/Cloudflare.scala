package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Cloudflare mappings, dns + audit tables (reference
  * data/managed/log_sources/cloudflare/tables/{dns,audit}.yml): one log
  * source fanning into per-table transforms (the S7 routing shape) —
  * dns query logs → ECS dns/source/related, account audit logs →
  * authentication events with actor identity and JSON-encoded
  * old/new-value payloads.
  */
object Cloudflare {

  val dnsSchema: StructType = StructType(Seq(
    StructField("Timestamp", LongType),
    StructField("SourceIP", StringType),
    StructField("QueryName", StringType),
    StructField("QueryType", LongType),
    StructField("ColoCode", StringType),
    StructField("EDNSSubnet", StringType),
    StructField("EDNSSubnetLength", LongType),
    StructField("ResponseCached", BooleanType),
    StructField("ResponseCode", LongType)))

  def dns(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), dnsSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.category", array(lit("network")))
    set("event.kind", lit("event"))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.Timestamp")))
    set("cloudflare.dns", struct(
      timestamp_seconds(col("r.Timestamp")).as("timestamp"),
      struct(col("r.SourceIP").as("ip")).as("source"),
      struct(col("r.QueryName").as("name"), col("r.QueryType").as("type")).as("query"),
      struct(col("r.ColoCode").as("code")).as("colo"),
      struct(col("r.EDNSSubnet").as("subnet"),
        col("r.EDNSSubnetLength").as("subnet_length")).as("edns"),
      struct(col("r.ResponseCached").as("cached"),
        col("r.ResponseCode").as("code")).as("response")))
    set("source.ip", col("r.SourceIP"))
    set("dns.question.name", col("r.QueryName"))
    set("related.hosts", filter(array(col("r.QueryName")), x => x.isNotNull))
    set("related.ip", filter(array(col("r.SourceIP"), col("r.EDNSSubnet")), x => x.isNotNull))

    out = out.drop("r", "json")
    ecsFooter(out)
  }

  val auditSchema: StructType = StructType(Seq(
    StructField("When", LongType),
    StructField("ID", StringType),
    StructField("ActionType", StringType),
    StructField("ActionResult", BooleanType),
    StructField("ActorEmail", StringType),
    StructField("ActorID", StringType),
    StructField("ActorIP", StringType),
    StructField("ActorType", StringType),
    StructField("Interface", StringType),
    StructField("Metadata", StringType),
    StructField("NewValue", StringType),
    StructField("OldValue", StringType),
    StructField("OwnerID", StringType),
    StructField("ResourceID", StringType),
    StructField("ResourceType", StringType)))

  def audit(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), auditSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.category", array(lit("authentication")))
    set("event.kind", lit("event"))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.When")))
    val result = when(col("r.ActionResult") === true, "success").otherwise("failure")
    set("cloudflare.audit", struct(
      timestamp_seconds(col("r.When")).as("timestamp"),
      struct(col("r.ActionType").as("type"), result.as("result")).as("action"),
      struct(col("r.ActorEmail").as("email"), col("r.ActorID").as("id"),
        col("r.ActorIP").as("ip"), col("r.ActorType").as("type")).as("actor"),
      col("r.ID").as("id"),
      col("r.Interface").as("interface"),
      col("r.Metadata").as("metadata"),
      col("r.NewValue").as("new_value"),
      col("r.OldValue").as("old_value"),
      struct(col("r.OwnerID").as("id")).as("owner"),
      struct(col("r.ResourceID").as("id"),
        col("r.ResourceType").as("type")).as("resource")))
    set("event.action", lower(col("r.ActionType")))
    set("event.outcome", result)
    set("user.email", col("r.ActorEmail"))
    set("user.id", col("r.ActorID"))
    set("source.ip", col("r.ActorIP"))
    set("event.id", col("r.ID"))
    set("event.provider", col("r.Interface"))
    set("related.user", filter(array(col("r.ActorID")), x => x.isNotNull))
    set("related.ip", filter(array(col("r.ActorIP")), x => x.isNotNull))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
