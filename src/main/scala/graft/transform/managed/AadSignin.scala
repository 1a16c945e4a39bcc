package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Azure AD sign-in-log mapping (reference
  * data/managed/log_sources/msft/tables/aad_signinlogs.yml): Graph
  * signIn events → ECS. PascalCase keys land snake_cased through the
  * typed schema, the properties envelope flattens, failure
  * reason/details compose into message, geo/location extracts, the
  * error-code outcome rule applies, and user_principal_name splits into
  * name@domain.
  */
object AadSignin {

  val rawSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("createdDateTime", StringType),
    StructField("operationName", StringType),
    StructField("durationMs", LongType),
    StructField("level", StringType),
    StructField("tenantId", StringType),
    StructField("correlationId", StringType),
    StructField("callerIpAddress", StringType),
    StructField("properties", StructType(Seq(
      StructField("id", StringType),
      StructField("createdDateTime", StringType),
      StructField("userPrincipalName", StringType),
      StructField("userDisplayName", StringType),
      StructField("userId", StringType),
      StructField("appId", StringType),
      StructField("appDisplayName", StringType),
      StructField("ipAddress", StringType),
      StructField("clientAppUsed", StringType),
      StructField("conditionalAccessStatus", StringType),
      StructField("isInteractive", BooleanType),
      StructField("riskDetail", StringType),
      StructField("riskLevelAggregated", StringType),
      StructField("riskLevelDuringSignIn", StringType),
      StructField("riskState", StringType),
      StructField("processingTimeInMilliseconds", LongType),
      StructField("resourceDisplayName", StringType),
      StructField("status", StructType(Seq(
        StructField("errorCode", LongType),
        StructField("failureReason", StringType),
        StructField("additionalDetails", StringType)))),
      StructField("userAgent", StringType),
      StructField("location", StructType(Seq(
        StructField("city", StringType),
        StructField("state", StringType),
        StructField("countryOrRegion", StringType),
        StructField("geoCoordinates", StructType(Seq(
          StructField("latitude", DoubleType),
          StructField("longitude", DoubleType))))))))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val p = "r.properties"

    set("cloud.provider", lit("azure"))
    val srcIp = coalesce(col(s"$p.ipAddress"), col("r.callerIpAddress"))
    set("source.address", srcIp)
    set("source.ip", srcIp)
    set("client.ip", srcIp)
    set("related.ip", filter(array(srcIp), x => x.isNotNull))
    set("log.level", col("r.level"))
    set("event.duration", col("r.durationMs") * 1000000L)
    set("event.action", col("r.operationName"))
    set("azure.tenant_id", col("r.tenantId"))
    set("azure.correlation_id", col("r.correlationId"))
    set("ts", try_to_timestamp(
      coalesce(col(s"$p.createdDateTime"), col("r.createdDateTime"))))

    val reason = col(s"$p.status.failureReason")
    val details = col(s"$p.status.additionalDetails")
    set("message", when(reason.isNotNull && details.isNotNull,
      concat(reason, lit(" ("), details, lit(")")))
      .otherwise(coalesce(reason, details)))

    set("geo", struct(
      col(s"$p.location.countryOrRegion").as("country_iso_code"),
      col(s"$p.location.state").as("region_name"),
      col(s"$p.location.city").as("city_name"),
      struct(
        col(s"$p.location.geoCoordinates.latitude").as("lat"),
        col(s"$p.location.geoCoordinates.longitude").as("lon")).as("location")))

    set("azure.aad_signinlogs", struct(
      col(s"$p.id").as("id"),
      col(s"$p.appId").as("app_id"),
      col(s"$p.appDisplayName").as("app_display_name"),
      col(s"$p.clientAppUsed").as("client_app_used"),
      col(s"$p.conditionalAccessStatus").as("conditional_access_status"),
      col(s"$p.isInteractive").as("is_interactive"),
      col(s"$p.riskDetail").as("risk_detail"),
      col(s"$p.riskLevelAggregated").as("risk_level_aggregated"),
      col(s"$p.riskLevelDuringSignIn").as("risk_level_during_signin"),
      col(s"$p.riskState").as("risk_state"),
      col(s"$p.processingTimeInMilliseconds").as("processing_time_ms"),
      col(s"$p.resourceDisplayName").as("resource_display_name"),
      struct(col(s"$p.status.errorCode").as("error_code")).as("status"),
      col(s"$p.userPrincipalName").as("user_principal_name"),
      col(s"$p.userDisplayName").as("user_display_name"),
      col(s"$p.userId").as("user_id")))

    set("event.kind", lit("event"))
    set("event.category", array(lit("authentication")))
    set("event.type", array(lit("info")))
    set("event.id", col(s"$p.id"))

    val errorCode = col(s"$p.status.errorCode")
    set("event.outcome",
      when(errorCode.isNull || errorCode === 0L, "success")
        .when(errorCode > 0L, "failure"))

    // user_principal_name → name@domain (GREEDYDATA fallback = whole value)
    val upn = col(s"$p.userPrincipalName")
    val upnParts = split(upn, "@", 2)
    val hasAt = upn.contains("@") && size(upnParts) === 2
    set("user.name", when(hasAt, upnParts.getItem(0)).otherwise(upn))
    set("user.domain", when(hasAt, upnParts.getItem(1)))
    set("user.full_name", col(s"$p.userDisplayName"))
    set("user.id", col(s"$p.userId"))
    set("related.user", array_distinct(filter(
      array(g("user.id"), g("user.name"), g("user.full_name")), x => x.isNotNull)))
    set("user_agent.original", col(s"$p.userAgent"))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
