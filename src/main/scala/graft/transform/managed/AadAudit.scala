package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Azure AD audit-log mapping (reference
  * data/managed/log_sources/msft/tables/aad_auditlogs.yml): directory
  * change events → ECS iam. Category and operationType refine
  * event.type (user/group, creation/deletion), the properties envelope
  * flattens into the payload, targetResources and their
  * modifiedProperties snake_case, and initiator identities land in
  * related.user / source.ip.
  */
object AadAudit {

  private val modifiedProp = StructType(Seq(
    StructField("displayName", StringType),
    StructField("newValue", StringType),
    StructField("oldValue", StringType)))

  private val targetResource = StructType(Seq(
    StructField("id", StringType),
    StructField("displayName", StringType),
    StructField("type", StringType),
    StructField("ipAddress", StringType),
    StructField("userPrincipalName", StringType),
    StructField("modifiedProperties", ArrayType(modifiedProp))))

  val rawSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("time", StringType),
    StructField("resourceId", StringType),
    StructField("operationName", StringType),
    StructField("operationVersion", StringType),
    StructField("category", StringType),
    StructField("tenantId", StringType),
    StructField("resultSignature", StringType),
    StructField("durationMs", LongType),
    StructField("callerIpAddress", StringType),
    StructField("correlationId", StringType),
    StructField("Level", StringType),
    StructField("properties", StructType(Seq(
      StructField("id", StringType),
      StructField("category", StringType),
      StructField("activityDateTime", StringType),
      StructField("activityDisplayName", StringType),
      StructField("result", StringType),
      StructField("resultReason", StringType),
      StructField("loggedByService", StringType),
      StructField("operationType", StringType),
      StructField("correlationId", StringType),
      StructField("additionalDetails", ArrayType(StructType(Seq(
        StructField("key", StringType),
        StructField("value", StringType))))),
      StructField("initiatedBy", StructType(Seq(
        StructField("app", StructType(Seq(
          StructField("appId", StringType),
          StructField("displayName", StringType),
          StructField("servicePrincipalId", StringType),
          StructField("servicePrincipalName", StringType)))),
        StructField("user", StructType(Seq(
          StructField("id", StringType),
          StructField("displayName", StringType),
          StructField("ipAddress", StringType),
          StructField("userPrincipalName", StringType))))))),
      StructField("targetResources", ArrayType(targetResource)))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val p = "r.properties"

    set("cloud.provider", lit("azure"))
    set("event.kind", lit("event"))
    set("event.id", col("r.id"))
    // event.type = ["change"] + category refinement + operationType refinement
    val cat = col(s"$p.category")
    val opType = col(s"$p.operationType")
    set("event.category", array(lit("iam")))
    set("event.type", filter(array(
      lit("change"),
      when(cat === "UserManagement", "user")
        .when(cat === "GroupManagement", "group"),
      when(opType === "Delete", "deletion")
        .when(opType === "Add", "creation")), x => x.isNotNull))
    set("ts", coalesce(
      to_timestamp(col("r.time")),
      to_timestamp(col(s"$p.activityDateTime"))))
    set("event.duration", col("r.durationMs") * 1000000L)
    val result = lower(col(s"$p.result"))
    set("event.outcome",
      when(result === "success", "success")
        .when(result.isin("failure", "timeout"), "failure"))
    set("log.level", col("r.Level"))
    set("event.action", coalesce(col("r.operationName"),
      col(s"$p.activityDisplayName")))

    val initUser = col(s"$p.initiatedBy.user")
    val initApp = col(s"$p.initiatedBy.app")
    set("azure.tenant_id", col("r.tenantId"))
    set("azure.correlation_id", coalesce(col("r.correlationId"),
      col(s"$p.correlationId")))
    set("azure.aad_auditlogs", struct(
      cat.as("category"),
      col("r.operationName").as("operation_name"),
      col("r.operationVersion").as("operation_version"),
      col("r.resultSignature").as("result_signature"),
      col(s"$p.activityDisplayName").as("activity_display_name"),
      to_timestamp(col(s"$p.activityDateTime")).as("activity_datetime"),
      when(col(s"$p.additionalDetails").isNotNull,
        to_json(col(s"$p.additionalDetails"))).as("additional_details"),
      col(s"$p.resultReason").as("result_reason"),
      col(s"$p.loggedByService").as("logged_by_service"),
      opType.as("operation_type"),
      struct(
        struct(initApp.getField("appId").as("app_id"),
          initApp.getField("displayName").as("display_name"),
          initApp.getField("servicePrincipalId").as("service_principal_id"),
          initApp.getField("servicePrincipalName").as("service_principal_name")
        ).as("app"),
        struct(initUser.getField("id").as("id"),
          initUser.getField("displayName").as("display_name"),
          initUser.getField("ipAddress").as("ip_address"),
          initUser.getField("userPrincipalName").as("user_principal_name")
        ).as("user")).as("initiated_by"),
      org.apache.spark.sql.functions.transform(col(s"$p.targetResources"), t => struct(
        t.getField("id").as("id"),
        t.getField("displayName").as("display_name"),
        t.getField("type").as("type"),
        t.getField("ipAddress").as("ip_address"),
        t.getField("userPrincipalName").as("user_principal_name"),
        org.apache.spark.sql.functions.transform(t.getField("modifiedProperties"), m => struct(
          m.getField("displayName").as("display_name"),
          m.getField("newValue").as("new_value"),
          m.getField("oldValue").as("old_value"))).as("modified_properties")
      )).as("target_resources")))

    set("source.ip", col("r.callerIpAddress"))
    set("client.ip", col("r.callerIpAddress"))
    set("related.ip", filter(array(col("r.callerIpAddress")), x => x.isNotNull))
    set("user.id", initUser.getField("id"))
    set("user.name", initUser.getField("userPrincipalName"))
    set("user.full_name", initUser.getField("displayName"))
    set("related.user", array_distinct(filter(array(
      initUser.getField("id"),
      initUser.getField("displayName"),
      initUser.getField("userPrincipalName")), x => x.isNotNull)))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
