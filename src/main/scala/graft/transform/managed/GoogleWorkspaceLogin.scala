package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed Google Workspace login-activity mapping (reference
  * data/managed/log_sources/google_workspace/tables/login.yml): admin
  * reports API activity records → ECS. Covers email → user/domain
  * splitting, the login event action category/type tables, the
  * `login_`-prefix-stripped parameter map (string/int/multi values),
  * challenge-status and login_success/failure outcome rules, and
  * affected-email target-user mapping.
  */
object GoogleWorkspaceLogin {

  val rawSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("ipAddress", StringType),
    StructField("ownerDomain", StringType),
    StructField("id", StructType(Seq(
      StructField("time", StringType),
      StructField("uniqueQualifier", StringType),
      StructField("applicationName", StringType),
      StructField("customerId", StringType)))),
    StructField("actor", StructType(Seq(
      StructField("email", StringType),
      StructField("profileId", StringType),
      StructField("callerType", StringType),
      StructField("key", StringType)))),
    StructField("events", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("parameters", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("value", StringType),
        StructField("intValue", StringType),
        StructField("multiValue", ArrayType(StringType))))))))))))

  private val disabledActions = Seq(
    "account_disabled_generic", "account_disabled_spamming_through_relay",
    "account_disabled_spamming", "account_disabled_hijacked",
    "account_disabled_password_leak")
  private val infoActions = Seq(
    "gov_attack_warning", "login_challenge", "login_verification",
    "suspicious_login", "suspicious_login_less_secure_app",
    "suspicious_programmatic_login")

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .withColumn("ev", try_element_at(col("r.events"), lit(1)))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.kind", lit("event"))
    val action = col("ev.name")
    set("event.action", action)
    set("event.provider", col("r.id.applicationName"))
    set("event.id", col("r.id.uniqueQualifier"))
    set("ts", try_to_timestamp(col("r.id.time")))
    set("organization.id", col("r.id.customerId"))

    val email = col("r.actor.email")
    set("source.user.email", email)
    set("user.email", email)
    set("source.user.id", col("r.actor.profileId"))
    set("user.id", col("r.actor.profileId"))
    set("source.ip", col("r.ipAddress"))

    val mailParts = split(email, "@", 2)
    val hasDomain = email.contains("@") && size(mailParts) === 2
    set("user.name", when(hasDomain, mailParts.getItem(0)))
    set("source.user.name", when(hasDomain, mailParts.getItem(0)))
    set("user.domain", when(hasDomain, mailParts.getItem(1)))
    set("source.user.domain", when(hasDomain, mailParts.getItem(1)))

    // parameter map: login_ prefix stripped; value | intValue | multiValue
    val params = coalesce(col("ev.parameters"),
      array().cast(rawSchema("events").dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[StructType]("parameters").dataType))
    // string-valued parameter lookup (covers the fields the mapping reads)
    def paramStr(name: String): Column = try_element_at(map_from_entries(
      F.transform(filter(params, p => p.getField("value").isNotNull), p => struct(
        when(p.getField("name").startsWith("login_"),
          p.getField("name").substr(lit(7), length(p.getField("name")) - 6))
          .otherwise(p.getField("name")).as("key"),
        p.getField("value").as("value")))), lit(name))
    def paramInt(name: String): Column = try_element_at(map_from_entries(
      F.transform(filter(params, p => p.getField("intValue").isNotNull), p => struct(
        when(p.getField("name").startsWith("login_"),
          p.getField("name").substr(lit(7), length(p.getField("name")) - 6))
          .otherwise(p.getField("name")).as("key"),
        p.getField("intValue").try_cast(LongType).as("value")))), lit(name))

    set("google_workspace", struct(
      col("r.kind").as("kind"),
      struct(col("r.actor.callerType").as("type"), col("r.actor.key").as("key")).as("actor"),
      struct(col("r.ownerDomain").as("domain")).as("organization"),
      struct(col("ev.type").as("type")).as("event"),
      struct(
        paramStr("type").as("type"),
        paramStr("challenge_method").as("challenge_method"),
        paramStr("challenge_status").as("challenge_status"),
        paramStr("affected_email_address").as("affected_email_address"),
        paramInt("timestamp").as("timestamp"),
        paramStr("is_suspicious").as("is_suspicious")).as("login")))

    set("event.start", timestamp_micros(g("google_workspace.login.timestamp")))

    val challenge = g("google_workspace.login.challenge_status")
    set("event.outcome",
      when(action === "login_failure", "failure")
        .when(action === "login_success", "success")
        .when(challenge === "Challenge Passed", "success")
        .when(challenge.isNotNull, "failure"))

    val empty = array().cast(ArrayType(StringType))
    def tag(cond: Column, v: String) = when(cond, array(lit(v))).otherwise(empty)
    set("event.category", concat(array(lit("authentication")),
      tag(action.isin("login_failure", "login_success", "logout"), "session")))
    set("event.type", concat(
      tag(action.isin("login_failure", "login_success"), "start"),
      tag(action === "logout", "end"),
      tag(action.isin(disabledActions: _*), "user"),
      tag(action.isin(disabledActions: _*), "change"),
      tag(action.isin(infoActions: _*), "info")))

    val affected = g("google_workspace.login.affected_email_address")
    val affParts = split(affected, "@", 2)
    val affOk = affected.contains("@") && size(affParts) === 2
    set("user.target.name", when(affOk, affParts.getItem(0)))
    set("user.target.domain", when(affOk, affParts.getItem(1)))

    set("related.ip", filter(array(col("r.ipAddress")), x => x.isNotNull))
    set("related.user", filter(array(g("source.user.name"), g("user.target.name")),
      x => x.isNotNull))

    out = out.drop("r", "ev", "json")
    ecsFooter(out)
  }
}
