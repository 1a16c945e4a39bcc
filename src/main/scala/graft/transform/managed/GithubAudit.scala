package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed GitHub audit-log mapping (reference
  * data/managed/log_sources/github_audit/log_source.yml): JSON audit
  * events → ECS. Covers action-category split, actor/target user fan-out,
  * team/org group naming, CI workflow ids, git transport fields, event
  * start/end/duration, and the creation/deletion/change type derivation.
  */
object GithubAudit {

  val rawSchema: StructType = StructType(Seq(
    StructField("_document_id", StringType),
    StructField("@timestamp", LongType),
    StructField("created_at", LongType),
    StructField("action", StringType),
    StructField("actor", StringType),
    StructField("actor_ip", StringType),
    StructField("actor_location", StructType(Seq(
      StructField("country_code", StringType)))),
    StructField("user", StringType),
    StructField("org", StringType),
    StructField("repo", StringType),
    StructField("team", StringType),
    StructField("name", StringType),
    StructField("business", StringType),
    StructField("business_id", LongType),
    StructField("workflow_id", LongType),
    StructField("workflow_run_id", LongType),
    StructField("transport_protocol", LongType),
    StructField("transport_protocol_name", StringType),
    StructField("repository_public", BooleanType),
    StructField("operation_type", StringType),
    StructField("started_at", StringType),
    StructField("completed_at", StringType),
    StructField("data", StructType(Seq(
      StructField("email", StringType),
      StructField("team", StringType),
      StructField("old_user", StringType),
      StructField("workflow_id", LongType),
      StructField("workflow_run_id", LongType))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.original", col("json"))
    set("event.kind", lit("event"))
    set("ts", timestamp_millis(coalesce(col("r.created_at"), col("`r`.`@timestamp`"))))
    set("event.id", col("r._document_id"))
    set("event.action", col("r.action"))
    set("user.name", col("r.actor"))
    set("user.email", col("r.data.email"))
    set("user.target.name", col("r.user"))

    set("github.workflow_id", coalesce(col("r.workflow_id"), col("r.data.workflow_id")))
    set("github.workflow_run_id",
      coalesce(col("r.workflow_run_id"), col("r.data.workflow_run_id")))
    set("github.transport_protocol.id", col("r.transport_protocol"))
    set("github.transport_protocol.name", col("r.transport_protocol_name"))
    set("github.repository_public", col("r.repository_public"))

    set("event.start", try_to_timestamp(col("r.started_at")))
    set("event.end", try_to_timestamp(col("r.completed_at")))
    set("event.duration",
      (unix_micros(g("event.end")) - unix_micros(g("event.start"))) * 1000L)

    set("github.name", col("r.name"))
    set("github.business.name", col("r.business"))
    set("github.business.id", col("r.business_id"))
    set("github.org", col("r.org"))
    set("github.repo", col("r.repo"))
    set("github.team", coalesce(col("r.team"), col("r.data.team")))

    val action = col("r.action")
    val teamName = when(action.startsWith("team."), g("github.team"))
      .when(action.startsWith("org."), g("github.org"))
    set("group.name", teamName)
    set("user.target.group.name", coalesce(
      when(col("r.user").isNotNull, teamName), col("r.data.old_user")))

    set("client.geo.country_iso_code", col("r.actor_location.country_code"))
    set("client.ip", col("r.actor_ip"))

    // "<category>.<action>" split (GH_CAT = [a-z_]+)
    val cat = when(regexp_extract(action, "^([a-z_]+)\\..*", 1) =!= "",
      regexp_extract(action, "^([a-z_]+)\\..*", 1))
    val actionTail = when(regexp_extract(action, "^[a-z_]+\\.(.*)", 1) =!= "",
      regexp_extract(action, "^[a-z_]+\\.(.*)", 1))
    set("github.category", cat)

    val isIam = cat.isin("team", "org")
    set("event.category", array_distinct(concat(
      array(lit("configuration"), lit("web")),
      when(isIam, array(lit("iam"))).otherwise(array().cast(ArrayType(StringType))))))

    val empty = array().cast(ArrayType(StringType))
    val baseTypes = concat(
      when(isIam, array(lit("group"), lit("user"))).otherwise(empty),
      when(actionTail.contains("create") || actionTail.contains("add"),
        array(lit("creation"))).otherwise(empty),
      when(actionTail.contains("delete") || actionTail.contains("remove"),
        array(lit("deletion"))).otherwise(empty))
    val withDefault = when(size(baseTypes) === 0, array(lit("change"))).otherwise(baseTypes)
    set("event.type", array_distinct(concat(withDefault,
      when(col("r.operation_type") === "create", array(lit("creation"))).otherwise(empty))))

    set("related.user", array_distinct(
      filter(array(col("r.actor"), col("r.user")), x => x.isNotNull)))
    set("related.ip", filter(array(col("r.actor_ip")), x => x.isNotNull))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
