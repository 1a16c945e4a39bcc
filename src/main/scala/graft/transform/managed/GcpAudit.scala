package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed GCP Cloud Audit Logs mapping (reference
  * data/managed/log_sources/gcp_audit/log_source.yml): LogEntry JSON →
  * ECS. Covers the AuditLog @type gate (non-audit entries abort),
  * identity/authorization extraction, kubernetes orchestrator typing,
  * caller-ip privacy filtering ("gce-internal-ip"/"private" never land in
  * source.ip), operation first/last session typing, and the status-code /
  * authorization-granted outcome rules. Deep request/response payloads
  * stay as raw JSON strings (the reference re-encodes them too).
  */
object GcpAudit {

  val rawSchema: StructType = StructType(Seq(
    StructField("insertId", StringType),
    StructField("logName", StringType),
    StructField("severity", StringType),
    StructField("timestamp", StringType),
    StructField("resource", StructType(Seq(
      StructField("type", StringType),
      StructField("labels", StructType(Seq(
        StructField("project_id", StringType),
        StructField("instance_id", StringType),
        StructField("cluster_name", StringType))))))),
    StructField("operation", StructType(Seq(
      StructField("id", StringType), StructField("producer", StringType),
      StructField("first", BooleanType), StructField("last", BooleanType)))),
    StructField("protoPayload", StructType(Seq(
      StructField("@type", StringType),
      StructField("methodName", StringType),
      StructField("serviceName", StringType),
      StructField("resourceName", StringType),
      StructField("numResponseItems", StringType),
      StructField("authenticationInfo", StructType(Seq(
        StructField("principalEmail", StringType),
        StructField("principalSubject", StringType),
        StructField("authoritySelector", StringType),
        StructField("serviceAccountKeyName", StringType)))),
      StructField("authorizationInfo", ArrayType(StructType(Seq(
        StructField("resource", StringType),
        StructField("permission", StringType),
        StructField("granted", BooleanType))))),
      StructField("requestMetadata", StructType(Seq(
        StructField("callerIp", StringType),
        StructField("callerSuppliedUserAgent", StringType),
        StructField("callerNetwork", StringType)))),
      StructField("status", StructType(Seq(
        StructField("code", LongType),
        StructField("message", StringType)))))))))

  def apply(df: DataFrame): DataFrame = {
    val parsed = df.withColumn("r", from_json(col("json"), rawSchema))
    // the reference aborts any LogEntry that is not an AuditLog payload
    var out = parsed.filter(
      col("`r`.`protoPayload`.`@type`") === "type.googleapis.com/google.cloud.audit.AuditLog")
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.kind", lit("event"))
    set("event.id", col("r.insertId"))
    set("log.logger", col("r.logName"))
    set("log.level", col("r.severity"))
    set("event.provider", try_element_at(split(col("r.logName"), "%2F"), lit(2)))
    set("ts", try_to_timestamp(col("r.timestamp")))
    set("cloud.provider", lit("gcp"))
    set("cloud.project.id", col("r.resource.labels.project_id"))
    set("cloud.instance.id", col("r.resource.labels.instance_id"))

    val rType = col("r.resource.type")
    set("gcp.audit.type", col("`r`.`protoPayload`.`@type`"))
    set("gcp.audit.resource_type", rType)
    set("orchestrator.type",
      when(rType.isin("k8s_cluster", "gke_cluster"), "kubernetes"))
    set("orchestrator.cluster.name",
      when(rType.isin("k8s_cluster", "gke_cluster"), col("r.resource.labels.cluster_name")))

    set("gcp.audit.authentication_info", struct(
      col("r.protoPayload.authenticationInfo.principalEmail").as("principal_email"),
      col("r.protoPayload.authenticationInfo.principalSubject").as("principal_subject"),
      col("r.protoPayload.authenticationInfo.authoritySelector").as("authority_selector"),
      col("r.protoPayload.authenticationInfo.serviceAccountKeyName").as("service_account_key_name")))
    set("client.user.email", g("gcp.audit.authentication_info.principal_email"))
    set("client.user.id", g("gcp.audit.authentication_info.principal_subject"))
    set("gcp.audit.authorization_info", col("r.protoPayload.authorizationInfo"))

    // caller ip: GCE-internal markers are not addresses
    val callerIp = col("r.protoPayload.requestMetadata.callerIp")
    set("source.ip", when(!callerIp.isin("gce-internal-ip", "private"), callerIp))
    set("user_agent.original", col("r.protoPayload.requestMetadata.callerSuppliedUserAgent"))
    set("gcp.audit.request_metadata", struct(
      callerIp.as("caller_ip"),
      col("r.protoPayload.requestMetadata.callerSuppliedUserAgent").as("caller_supplied_user_agent"),
      col("r.protoPayload.requestMetadata.callerNetwork").as("caller_network")))

    // operation first/last → session category, start/end types
    val first = coalesce(col("r.operation.first"), lit(false))
    val last = coalesce(col("r.operation.last"), lit(false))
    val sessionish = col("r.operation").isNotNull && !(first && last)
    set("event.category", when(sessionish, array(lit("session")))
      .otherwise(array().cast(ArrayType(StringType))))
    set("event.type", concat(
      when(sessionish && first && !last, array(lit("start")))
        .when(sessionish && !first && last, array(lit("end")))
        .otherwise(array().cast(ArrayType(StringType)))))
    set("gcp.audit.logentry_operation", col("r.operation"))

    set("event.action", col("r.protoPayload.methodName"))
    set("gcp.audit.num_response_items",
      col("r.protoPayload.numResponseItems").try_cast(LongType))
    set("gcp.audit.resource_name",
      when(g("orchestrator.type").isNull || g("orchestrator.type") =!= "kubernetes",
        col("r.protoPayload.resourceName")))
    set("gcp.audit.service_name", col("r.protoPayload.serviceName"))
    set("cloud.service.name", col("r.protoPayload.serviceName"))
    set("service.name", col("r.protoPayload.serviceName"))

    val code = col("r.protoPayload.status.code")
    set("gcp.audit.status", struct(
      code.as("code"), col("r.protoPayload.status.message").as("message")))
    set("error.code",
      when(col("r.protoPayload.status.message").isNotNull, code.cast(StringType)))
    set("error.message", col("r.protoPayload.status.message"))

    val authz = coalesce(col("r.protoPayload.authorizationInfo"),
      array().cast(rawSchema("protoPayload").dataType.asInstanceOf[StructType]("authorizationInfo").dataType))
    set("event.outcome",
      when(code === 0L, "success")
        .when(code.isNotNull && code =!= 0L, "failure")
        .when(code.isNull && size(authz) === 1,
          when(coalesce(try_element_at(authz, lit(1)).getField("granted"), lit(false)),
            "success").otherwise("failure")))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
