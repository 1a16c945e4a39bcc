package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed Okta System Log mapping (reference
  * data/managed/log_sources/okta/tables/system.yml): JSON events → ECS.
  * Covers the transform's core surface — event_type → event.category/type
  * derivation tables, okta.* vendor struct (actor/client/outcome/target/
  * transaction/security_context/authentication_context/debug_data subset),
  * actor→user/client/source identity fan-out, target user/group pick,
  * outcome normalization, related, and user-agent parse. The reference's
  * debugData string-reparse heuristics (risk/behaviors kv reconstruction)
  * are out of this subset.
  */
object Okta {

  val rawSchema: StructType = StructType(Seq(
    StructField("published", StringType),
    StructField("eventType", StringType),
    StructField("displayMessage", StringType),
    StructField("uuid", StringType),
    StructField("actor", StructType(Seq(
      StructField("alternateId", StringType), StructField("displayName", StringType),
      StructField("id", StringType), StructField("type", StringType)))),
    StructField("client", StructType(Seq(
      StructField("device", StringType), StructField("id", StringType),
      StructField("ipAddress", StringType), StructField("zone", StringType),
      StructField("userAgent", StructType(Seq(
        StructField("browser", StringType), StructField("os", StringType),
        StructField("rawUserAgent", StringType)))),
      StructField("geographicalContext", StructType(Seq(
        StructField("city", StringType), StructField("state", StringType),
        StructField("country", StringType),
        StructField("geolocation", StructType(Seq(
          StructField("lat", DoubleType), StructField("lon", DoubleType)))))))))),
    StructField("outcome", StructType(Seq(
      StructField("reason", StringType), StructField("result", StringType)))),
    StructField("target", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("type", StringType),
      StructField("alternateId", StringType), StructField("displayName", StringType),
      StructField("login", StringType))))),
    StructField("transaction", StructType(Seq(
      StructField("id", StringType), StructField("type", StringType)))),
    StructField("securityContext", StructType(Seq(
      StructField("asNumber", LongType), StructField("asOrg", StringType),
      StructField("domain", StringType), StructField("isProxy", BooleanType),
      StructField("isp", StringType)))),
    StructField("authenticationContext", StructType(Seq(
      StructField("authenticationProvider", StringType),
      StructField("authenticationStep", IntegerType),
      StructField("credentialProvider", StringType),
      StructField("credentialType", StringType),
      StructField("externalSessionId", StringType),
      StructField("interface", StringType),
      StructField("issuer", StructType(Seq(
        StructField("id", StringType), StructField("type", StringType))))))),
    StructField("debugContext", StructType(Seq(
      StructField("debugData", StructType(Seq(
        StructField("deviceFingerprint", StringType),
        StructField("requestId", StringType),
        StructField("requestUri", StringType),
        StructField("threatSuspected", StringType),
        StructField("url", StringType)))))))))

  // event_type → category/type derivation tables (the reference's
  // match_any lists; exact values, as Okta event types are enumerated)
  private val iamCats = Seq(
    "group.user_membership.add", "group.user_membership.remove",
    "user.lifecycle.activate", "user.lifecycle.create",
    "user.lifecycle.deactivate", "user.lifecycle.suspend", "user.lifecycle.unsuspend")
  private val configCats = Seq(
    "policy.lifecycle.activate", "policy.lifecycle.create", "policy.lifecycle.deactivate",
    "policy.lifecycle.delete", "policy.lifecycle.update",
    "policy.rule.activate", "policy.rule.add", "policy.rule.deactivate",
    "policy.rule.delete", "policy.rule.update",
    "application.lifecycle.create", "application.lifecycle.delete",
    "application.lifecycle.activate", "application.lifecycle.deactivate",
    "application.lifecycle.update")
  private val authCats = Seq(
    "user.session.start", "user.session.end", "user.authentication.sso",
    "policy.evaluate_sign_on")
  private val sessionCats = Seq("user.session.start", "user.session.end")
  private val rateLimits = Seq(
    "system.org.rate_limit.warning", "system.org.rate_limit.violation",
    "core.concurrency.org.limit.violation")
  private val userTypes = Seq(
    "user.lifecycle.activate", "user.lifecycle.create", "user.lifecycle.deactivate",
    "user.lifecycle.suspend", "user.lifecycle.unsuspend", "user.authentication.sso",
    "user.session.start", "user.session.end",
    "application.user_membership.add", "application.user_membership.remove",
    "application.user_membership.change_username")
  private val changeTypes = Seq(
    "user.lifecycle.activate", "user.lifecycle.deactivate", "user.lifecycle.suspend",
    "user.lifecycle.unsuspend", "group.user_membership.add", "group.user_membership.remove",
    "policy.lifecycle.activate", "policy.lifecycle.deactivate", "policy.lifecycle.update",
    "policy.rule.activate", "policy.rule.add", "policy.rule.deactivate", "policy.rule.update",
    "application.user_membership.add", "application.user_membership.remove",
    "application.user_membership.change_username")
  private val creationTypes = Seq(
    "user.lifecycle.create", "policy.lifecycle.create", "application.lifecycle.create")
  private val deletionTypes = Seq("policy.lifecycle.delete", "application.lifecycle.delete")

  private def tagWhen(cond: Column, v: String): Column =
    when(cond, array(lit(v))).otherwise(array().cast(ArrayType(StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    val et = col("r.eventType")
    set("ts", try_to_timestamp(col("r.published")))
    set("event.kind", lit("event"))
    set("event.category", concat(
      tagWhen(et.isin(iamCats: _*), "iam"),
      tagWhen(et.isin(configCats: _*), "configuration"),
      tagWhen(et.isin(authCats: _*), "authentication"),
      tagWhen(et.isin(sessionCats: _*), "session")))
    // the reference pushes "network" twice for security.request.blocked
    // (two overlapping match_any blocks); mirrored as-is
    set("event.type", concat(
      tagWhen(et.isin(rateLimits: _*), "info"),
      tagWhen(et === "security.request.blocked", "network"),
      tagWhen(et.isin(rateLimits :+ "security.request.blocked": _*), "network"),
      tagWhen(et === "user.session.start", "start"),
      tagWhen(et === "user.session.end", "end"),
      tagWhen(et.isin("group.user_membership.add", "group.user_membership.remove"), "group"),
      tagWhen(et.isin(userTypes: _*), "user"),
      tagWhen(et.isin(changeTypes: _*), "change"),
      tagWhen(et.isin(creationTypes: _*), "creation"),
      tagWhen(et.isin(deletionTypes: _*), "deletion"),
      tagWhen(et === "policy.evaluate_sign_on", "info")))

    // okta vendor struct ("null" client ip literal → null, as the reference)
    val cleanIp = when(col("r.client.ipAddress") =!= "null", col("r.client.ipAddress"))
    val targetType = rawSchema("target").dataType.asInstanceOf[ArrayType]
    val targets = coalesce(col("r.target"), array().cast(targetType))
    set("okta", struct(
      col("r.displayMessage").as("display_message"),
      et.as("event_type"),
      col("r.uuid").as("uuid"),
      struct(
        col("r.actor.alternateId").as("alternate_id"),
        col("r.actor.displayName").as("display_name"),
        col("r.actor.id").as("id"),
        col("r.actor.type").as("type")).as("actor"),
      struct(
        col("r.client.device").as("device"),
        col("r.client.id").as("id"),
        cleanIp.as("ip"),
        struct(
          col("r.client.userAgent.browser").as("browser"),
          col("r.client.userAgent.os").as("os"),
          col("r.client.userAgent.rawUserAgent").as("raw_user_agent")).as("user_agent"),
        col("r.client.zone").as("zone")).as("client"),
      struct(
        col("r.outcome.reason").as("reason"),
        col("r.outcome.result").as("result")).as("outcome"),
      F.transform(targets, v => struct(
        v.getField("id").as("id"),
        v.getField("type").as("type"),
        v.getField("alternateId").as("alternate_id"),
        v.getField("displayName").as("display_name"),
        v.getField("login").as("login"))).as("target"),
      struct(
        col("r.transaction.id").as("id"),
        col("r.transaction.type").as("type")).as("transaction"),
      struct(
        struct(
          col("r.securityContext.asNumber").as("number"),
          struct(col("r.securityContext.asOrg").as("name")).as("organization")).as("as"),
        col("r.securityContext.domain").as("domain"),
        col("r.securityContext.isProxy").as("is_proxy"),
        col("r.securityContext.isp").as("isp")).as("security_context"),
      struct(
        coalesce(col("r.authenticationContext.interface"),
          col("r.authenticationContext.authenticationProvider")).as("authentication_provider"),
        col("r.authenticationContext.authenticationStep").as("authentication_step"),
        col("r.authenticationContext.credentialProvider").as("credential_provider"),
        col("r.authenticationContext.credentialType").as("credential_type"),
        col("r.authenticationContext.externalSessionId").as("external_session_id"),
        col("r.authenticationContext.issuer").as("issuer")).as("authentication_context"),
      struct(struct(
        col("r.debugContext.debugData.deviceFingerprint").as("device_fingerprint"),
        col("r.debugContext.debugData.requestId").as("request_id"),
        col("r.debugContext.debugData.requestUri").as("request_uri"),
        col("r.debugContext.debugData.threatSuspected").as("threat_suspected"),
        col("r.debugContext.debugData.url").as("url")).as("debug_data")).as("debug_context")))

    set("client.geo", struct(
      col("r.client.geographicalContext.geolocation").as("location"),
      col("r.client.geographicalContext.city").as("city_name"),
      col("r.client.geographicalContext.state").as("region_name"),
      col("r.client.geographicalContext.country").as("country_name")))

    set("client.ip", g("okta.client.ip"))
    set("source.ip", g("okta.client.ip"))
    set("event.action", g("okta.event_type"))
    set("client.as.organization.name", g("okta.security_context.as.organization.name"))
    set("client.domain", g("okta.security_context.domain"))
    set("source.domain", g("okta.security_context.domain"))
    set("event.id", g("okta.uuid"))

    val resultLower = lower(g("okta.outcome.result"))
    set("event.outcome",
      when(resultLower.isin("success", "allow"), "success")
        .when(resultLower.isin("failure", "deny"), "failure")
        .otherwise("unknown"))

    // target user/group pick: last matching target wins (the reference's
    // map-with-overwrite); guarded by event_type family
    val isUserEvent = et.isNotNull && et.contains("user.")
    val isGroupEvent = et.isNotNull && et.contains("group.")
    val userTarget = try_element_at(
      when(isUserEvent, filter(targets, v => lower(v.getField("type")).contains("user")))
        .otherwise(array().cast(targetType)), lit(-1))
    val groupTarget = try_element_at(
      when(isGroupEvent, filter(targets, v => lower(v.getField("type")).contains("group")))
        .otherwise(array().cast(targetType)), lit(-1))
    set("user.target.full_name", userTarget.getField("displayName"))
    set("user.target.id", userTarget.getField("id"))
    set("user.target.email", userTarget.getField("login"))
    set("user.target.group.name", groupTarget.getField("displayName"))
    set("user.target.group.id", groupTarget.getField("id"))

    set("client.user.id", g("okta.actor.id"))
    set("source.user.id", g("okta.actor.id"))
    set("client.user.full_name", g("okta.actor.display_name"))
    set("source.user.full_name", g("okta.actor.display_name"))
    set("user.full_name", g("okta.actor.display_name"))

    set("related.user", array_distinct(filter(
      array(g("okta.actor.display_name"), g("user.target.full_name")), x => x.isNotNull)))
    set("related.ip", filter(array(g("source.ip")), x => x.isNotNull))

    val rawUa = g("okta.client.user_agent.raw_user_agent")
    set("user_agent", parseUserAgent(rawUa).withField("original", rawUa))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
