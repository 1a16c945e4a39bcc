package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed-source batch 5: the remaining reference sub-tables —
  * duo admin/offline_enrollment/summary/telephony, google_workspace
  * admin/alert, onepassword item_usages, snyk vulnerabilities,
  * aws_cloudtrail digest/insights, panw globalprotect/threat
  * (reference data/managed/log_sources/&lt;src&gt;/tables/&lt;t&gt;.yml).
  */

/** duo admin.log (duo/tables/admin.yml): admin-action audit. The
  * reference's action → event.type mapping is large explicit lists plus
  * create/update/delete substring rules; the lists are themselves
  * substring-consistent, so this mapping derives the taxonomy from the
  * action name shape (documented compaction, not a semantic change).
  */
object DuoAdmin {
  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("action", StringType),
    StructField("username", StringType),
    StructField("object", StringType),
    StructField("description", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.timestamp").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val a = col("r.action")
    set("ts", timestamp_seconds(col("r.timestamp")))
    set("event.kind", lit("event"))
    set("event.action", a)
    set("event.outcome",
      when(a.isin("ad_sync_failed", "admin_2fa_error", "admin_login_error",
        "azure_sync_fail", "openldap_sync_failed"), "failure")
        .otherwise("success"))
    set("event.category",
      when(a.startsWith("admin_") || a.startsWith("user_") || a.startsWith("phone_") ||
        a.startsWith("group_") || a.startsWith("bypass_"), array(lit("iam")))
        .otherwise(array().cast(ArrayType(StringType))))
    val types = filter(array(
      when(a.startsWith("admin_") || a.startsWith("activation_") ||
        a.startsWith("adminapi_"), "admin"),
      when(a.startsWith("group_") || a.startsWith("policy_") ||
        a.contains("group_policy"), "group"),
      when(a.startsWith("user_") || a.startsWith("phone_") || a.startsWith("bypass_") ||
        a.contains("sync_by_user"), "user"),
      when(a.contains("create"), "creation"),
      when(a.contains("update"), "change"),
      when(a.contains("delete"), "deletion")), x => x.isNotNull)
    set("event.type", types)
    set("message", col("r.description"))
    set("user.name", col("r.username"))
    set("user.target.name", col("r.object"))
    set("duo.admin", struct(
      a.as("action"),
      struct(col("r.username").as("name")).as("user"),
      col("r.object").as("action_performed_on"),
      col("r.description").as("flattened")))
    set("related.user", filter(array(col("r.username")), x => x.isNotNull))
    ecsFooter(out.drop("r", "json"))
  }
}

/** duo offline_enrollment.log (duo/tables/offline_enrollment.yml):
  * the `description` field is nested JSON (hostname/user_agent/factor).
  */
object DuoOfflineEnrollment {
  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("action", StringType),
    StructField("username", StringType),
    StructField("object", StringType),
    StructField("description", StringType)))

  private val descSchema = StructType(Seq(
    StructField("hostname", StringType),
    StructField("user_agent", StringType),
    StructField("factor", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.timestamp").isNotNull)
      .withColumn("d", from_json(col("r.description"), descSchema))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("ts", timestamp_seconds(col("r.timestamp")))
    set("user.name", col("r.username"))
    set("duo.offline_enrollment", struct(
      col("r.action").as("action"),
      struct(
        col("d.hostname").as("hostname"),
        col("d.user_agent").as("user_agent"),
        col("d.factor").as("factor")).as("description"),
      col("r.object").as("object"),
      struct(col("r.username").as("name")).as("user")))
    set("related.hosts", filter(array(col("d.hostname")), x => x.isNotNull))
    set("related.user", filter(array(col("r.username")), x => x.isNotNull))
    ecsFooter(out.drop("r", "d", "json"))
  }
}

/** duo summary.log (duo/tables/summary.yml): account-level counters.
  * The reference stamps `.ts = now()` (the API snapshot has no event
  * time); here ingest time is taken from a caller-provided column when
  * present, else the current batch timestamp — same semantics, but
  * deterministic under retry within a batch.
  */
object DuoSummary {
  val rawSchema: StructType = StructType(Seq(
    StructField("admin_count", IntegerType),
    StructField("integration_count", IntegerType),
    StructField("telephony_credits_remaining", IntegerType),
    StructField("user_count", IntegerType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("ts", if (out.columns.contains("ingest_ts")) col("ingest_ts")
      else current_timestamp())
    set("duo.summary", struct(
      col("r.admin_count").as("admin_count"),
      col("r.integration_count").as("integration_count"),
      col("r.telephony_credits_remaining").as("telephony_credits_remaining"),
      col("r.user_count").as("user_count")))
    ecsFooter(out.drop("r", "json"))
  }
}

/** duo telephony.log (duo/tables/telephony.yml): SMS/phone credit use. */
object DuoTelephony {
  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("context", StringType),
    StructField("credits", IntegerType),
    StructField("phone", StringType),
    StructField("type", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.timestamp").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("ts", timestamp_seconds(col("r.timestamp")))
    set("event.kind", lit("event"))
    set("duo.telephony", struct(
      col("r.context").as("event_type"),
      col("r.credits").as("credits"),
      col("r.phone").as("phone_number"),
      col("r.type").as("type")))
    ecsFooter(out.drop("r", "json"))
  }
}

/** google_workspace admin.log (google_workspace/tables/admin.yml): admin
  * console audit. The reference's event.type derivation is several
  * hundred-element action lists; their membership is substring-regular
  * (CREATE/ADD→creation, CHANGE/UPDATE/TOGGLE→change, DELETE/REMOVE/
  * REVOKE→deletion, GROUP→group, USER→user, settings→configuration), so
  * the taxonomy is derived from the action name (documented compaction).
  */
object GoogleWorkspaceAdmin {
  val rawSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("id", StructType(Seq(
      StructField("time", StringType),
      StructField("uniqueQualifier", StringType),
      StructField("applicationName", StringType),
      StructField("customerId", StringType)))),
    StructField("actor", StructType(Seq(
      StructField("callerType", StringType),
      StructField("email", StringType),
      StructField("profileId", StringType),
      StructField("key", StringType)))),
    StructField("ipAddress", StringType),
    StructField("ownerDomain", StringType),
    StructField("events", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("name", StringType),
      StructField("parameters", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("value", StringType)))))))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.id.time").isNotNull)
      .withColumn("ev", element_at(col("r.events"), 1))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val a = col("ev.name")
    set("ts", to_timestamp(col("r.id.time")))
    set("event.kind", lit("event"))
    set("event.category",
      when(a.contains("SETTING") || a.contains("CONFIGURATION"),
        array(lit("iam"), lit("configuration"))).otherwise(array(lit("iam"))))
    set("event.type", filter(array(
      when(a.startsWith("CREATE") || a.startsWith("ADD") || a.startsWith("GENERATE")
        || a.startsWith("INSERT") || a.startsWith("UNDELETE"), "creation"),
      when(a.startsWith("CHANGE") || a.startsWith("UPDATE") || a.startsWith("TOGGLE")
        || a.startsWith("RENAME") || a.startsWith("MOVE") || a.startsWith("ENABLE")
        || a.startsWith("ENFORCE") || a.startsWith("ASSIGN") || a.startsWith("SUSPEND")
        || a.startsWith("UNSUSPEND") || a.startsWith("ARCHIVE"), "change"),
      when(a.startsWith("DELETE") || a.startsWith("REMOVE") || a.startsWith("REVOKE"),
        "deletion"),
      when(a.contains("GROUP"), "group"),
      when(a.contains("USER"), "user"),
      when(a.startsWith("DOWNLOAD") || a.startsWith("VIEW") || a.startsWith("REQUEST")
        || a.startsWith("EMAIL_LOG_SEARCH"), "info")), x => x.isNotNull))
    set("event.action", a)
    set("event.provider", col("r.id.applicationName"))
    set("event.id", col("r.id.uniqueQualifier"))
    set("organization.id", col("r.id.customerId"))
    set("source.user.email", col("r.actor.email"))
    set("user.email", col("r.actor.email"))
    set("source.user.id", col("r.actor.profileId"))
    set("user.id", col("r.actor.profileId"))
    set("source.ip", col("r.ipAddress"))
    set("google_workspace", struct(
      col("r.kind").as("kind"),
      struct(
        col("r.actor.callerType").as("type"),
        col("r.actor.key").as("key")).as("actor"),
      struct(col("r.ownerDomain").as("domain")).as("organization"),
      struct(col("ev.type").as("type")).as("event"),
      map_from_entries(F.transform(coalesce(col("ev.parameters"),
        array().cast("array<struct<name:string,value:string>>")),
        p => struct(p.getField("name").as("k"), p.getField("value").as("v"))))
        .as("admin")))
    set("related.ip", filter(array(col("r.ipAddress")), x => x.isNotNull))
    set("related.user", filter(array(col("r.actor.email")), x => x.isNotNull))
    ecsFooter(out.drop("r", "ev", "json"))
  }
}

/** google_workspace alert.log (google_workspace/tables/alert.yml): Alert
  * Center alerts — event.kind=alert, phishing source adds the email
  * category, create/start/end time lifts.
  */
object GoogleWorkspaceAlert {
  val rawSchema: StructType = StructType(Seq(
    StructField("createTime", DoubleType),
    StructField("startTime", StringType),
    StructField("endTime", StringType),
    StructField("source", StringType),
    StructField("customerId", StringType),
    StructField("alertId", StringType),
    StructField("deleted", StringType),
    StructField("etag", StringType),
    StructField("type", StringType),
    StructField("metadata", StructType(Seq(
      StructField("assignee", StringType),
      StructField("alertId", StringType),
      StructField("customerId", StringType),
      StructField("status", StringType),
      StructField("severity", StringType)))),
    StructField("data", StructType(Seq(
      StructField("@type", StringType))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.createTime").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("ts", timestamp_seconds(col("r.createTime")))
    set("event.kind", lit("alert"))
    set("event.type", array(lit("info")))
    set("event.category",
      when(col("r.source") === "Gmail phishing",
        array(lit("email"), lit("threat"), lit("malware")))
        .otherwise(array(lit("threat"), lit("malware"))))
    set("event.action", col("r.source"))
    set("event.id", col("r.alertId"))
    set("event.start", to_timestamp(col("r.startTime")))
    set("event.end", to_timestamp(col("r.endTime")))
    set("organization.id", col("r.customerId"))
    set("user.email", filter(array(col("r.metadata.assignee")), x => x.isNotNull))
    set("google_workspace.alert", struct(
      timestamp_seconds(col("r.createTime")).as("create_time"),
      to_timestamp(col("r.startTime")).as("start_time"),
      to_timestamp(col("r.endTime")).as("end_time"),
      col("r.source").as("source"),
      col("r.type").as("type"),
      struct(col("r.customerId").as("id")).as("customer"),
      col("r.alertId").as("id"),
      col("r.deleted").cast(BooleanType).as("deleted"),
      col("r.etag").as("etag"),
      struct(
        col("r.metadata.assignee").as("assignee"),
        struct(col("r.metadata.alertId").as("id")).as("alert"),
        struct(col("r.metadata.customerId").as("id")).as("customer"),
        col("r.metadata.status").as("status"),
        col("r.metadata.severity").as("severity")).as("metadata"),
      struct(col("r.data.`@type`").as("type")).as("data")))
    ecsFooter(out.drop("r", "json"))
  }
}

/** onepassword item_usages (onepassword/tables/item_usages.yml): vault
  * item access events.
  */
object OnePasswordItemUsages {
  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("uuid", StringType),
    StructField("action", StringType),
    StructField("item_uuid", StringType),
    StructField("vault_uuid", StringType),
    StructField("used_version", IntegerType),
    StructField("user", StructType(Seq(
      StructField("uuid", StringType),
      StructField("name", StringType),
      StructField("email", StringType)))),
    StructField("client", StructType(Seq(
      StructField("app_name", StringType),
      StructField("app_version", StringType),
      StructField("platform_name", StringType),
      StructField("platform_version", StringType),
      StructField("os_name", StringType),
      StructField("os_version", StringType),
      StructField("ip_address", StringType))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.timestamp").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("ts", timestamp_seconds(col("r.timestamp")))
    set("event.kind", lit("event"))
    set("event.category", array(lit("file")))
    set("event.type", array(lit("access")))
    set("event.action", col("r.action"))
    set("user.id", col("r.user.uuid"))
    set("user.full_name", col("r.user.name"))
    set("user.email", col("r.user.email"))
    set("os.name", col("r.client.os_name"))
    set("os.version", col("r.client.os_version"))
    set("source.ip", col("r.client.ip_address"))
    set("onepassword", struct(
      col("r.uuid").as("uuid"),
      col("r.item_uuid").as("item_uuid"),
      col("r.vault_uuid").as("vault_uuid"),
      col("r.used_version").as("used_version"),
      struct(
        col("r.client.app_name").as("app_name"),
        col("r.client.app_version").as("app_version"),
        col("r.client.platform_name").as("platform_name"),
        col("r.client.platform_version").as("platform_version")).as("client")))
    set("related.user", array_distinct(filter(array(
      col("r.user.uuid"), col("r.user.email"), col("r.user.name")), x => x.isNotNull)))
    set("related.ip", filter(array(col("r.client.ip_address")), x => x.isNotNull))
    ecsFooter(out.drop("r", "json"))
  }
}

/** snyk vulnerabilities (snyk/tables/vulnerabilities.yml): issue feed →
  * ECS vulnerability.* with CVE-else-SNYK enumeration.
  */
object SnykVulnerabilities {
  val rawSchema: StructType = StructType(Seq(
    StructField("issue", StructType(Seq(
      StructField("id", StringType),
      StructField("url", StringType),
      StructField("title", StringType),
      StructField("description", StringType),
      StructField("severity", StringType),
      StructField("cvssScore", StringType),
      StructField("CVSSv3", StringType),
      StructField("disclosureTime", StringType),
      StructField("exploitMaturity", StringType),
      StructField("isIgnored", BooleanType),
      StructField("isPatchable", BooleanType),
      StructField("isPatched", BooleanType),
      StructField("isPinnable", BooleanType),
      StructField("isUpgradable", BooleanType),
      StructField("priorityScore", DoubleType),
      StructField("publicationTime", StringType),
      StructField("packageManager", StringType),
      StructField("package", StringType),
      StructField("version", StringType),
      StructField("identifiers", StructType(Seq(
        StructField("CVE", ArrayType(StringType)),
        StructField("CWE", ArrayType(StringType)),
        StructField("ALTERNATIVE", ArrayType(StringType)))))))),
    StructField("introducedDate", StringType),
    StructField("isFixed", BooleanType),
    StructField("projectName", StringType),
    StructField("org", StructType(Seq(
      StructField("name", StringType),
      StructField("id", StringType))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.issue").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val iss = col("r.issue")
    val cve = iss.getField("identifiers").getField("CVE")
    val alt = iss.getField("identifiers").getField("ALTERNATIVE")
    set("event.kind", lit("event"))
    set("vulnerability", struct(
      lit("CVSS").as("classification"),
      array(lit("Github")).as("category"),
      struct(lit("Snyk").as("vendor")).as("scanner"),
      when(cve.isNotNull, "CVE").when(alt.isNotNull, "SNYK").as("enumeration"),
      coalesce(element_at(cve, 1), element_at(alt, 1)).as("id"),
      iss.getField("description").as("description"),
      struct(
        lit("3.0").as("version"),
        iss.getField("cvssScore").cast(DoubleType).as("base")).as("score"),
      iss.getField("severity").as("severity"),
      iss.getField("url").as("reference")))
    set("snyk", struct(
      struct(
        iss.getField("id").as("id"),
        iss.getField("title").as("title"),
        iss.getField("CVSSv3").as("cvss3"),
        to_timestamp(iss.getField("disclosureTime")).as("disclosure_time"),
        iss.getField("exploitMaturity").as("exploit_maturity"),
        struct(
          iss.getField("identifiers").getField("CWE").as("cwe"),
          alt.as("alternative")).as("identifiers"),
        iss.getField("isIgnored").as("is_ignored"),
        iss.getField("isPatchable").as("is_patchable"),
        iss.getField("isPatched").as("is_patched"),
        iss.getField("isPinnable").as("is_pinnable"),
        iss.getField("isUpgradable").as("is_upgradable"),
        iss.getField("priorityScore").as("priority_score"),
        to_timestamp(iss.getField("publicationTime")).as("publication_time"),
        iss.getField("packageManager").as("package_manager"),
        iss.getField("package").as("package"),
        iss.getField("version").as("version"),
        to_timestamp(col("r.introducedDate")).as("introduced_date"),
        col("r.isFixed").as("is_fixed")).as("vulnerabilities"),
      struct(col("r.projectName").as("name")).as("project"),
      struct(
        col("r.org.name").as("name"),
        col("r.org.id").as("id")).as("org")))
    ecsFooter(out.drop("r", "json"))
  }
}

/** aws_cloudtrail digest (aws_cloudtrail/tables/digest.yml): integrity
  * digest objects — file path/hash + window timestamps.
  */
object CloudTrailDigest {
  val rawSchema: StructType = StructType(Seq(
    StructField("digestS3Bucket", StringType),
    StructField("digestS3Object", StringType),
    StructField("digestStartTime", LongType),
    StructField("digestEndTime", LongType),
    StructField("newestEventTime", LongType),
    StructField("oldestEventTime", LongType),
    StructField("previousDigestS3Bucket", StringType),
    StructField("previousDigestSignature", StringType),
    StructField("previousDigestHashAlgorithm", StringType),
    StructField("publicKeyFingerprint", StringType),
    StructField("digestSignatureAlgorithm", StringType),
    StructField("logFiles", ArrayType(StructType(Seq(
      StructField("s3Object", StringType),
      StructField("hashValue", StringType)))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.digestEndTime").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("ts", timestamp_millis(col("r.digestEndTime")))
    set("file.path", col("r.digestS3Object"))
    set("file.hash.sha256", col("r.previousDigestSignature"))
    set("aws.cloudtrail.digest", struct(
      timestamp_millis(col("r.digestStartTime")).as("start_time"),
      timestamp_millis(col("r.digestEndTime")).as("end_time"),
      col("r.digestS3Bucket").as("s3_bucket"),
      timestamp_millis(col("r.newestEventTime")).as("newest_event_time"),
      timestamp_millis(col("r.oldestEventTime")).as("oldest_event_time"),
      col("r.previousDigestS3Bucket").as("previous_s3_bucket"),
      col("r.previousDigestHashAlgorithm").as("previous_hash_algorithm"),
      col("r.publicKeyFingerprint").as("public_key_fingerprint"),
      col("r.digestSignatureAlgorithm").as("signature_algorithm"),
      to_json(col("r.logFiles")).as("log_files")))
    set("related.hash", filter(array(col("r.previousDigestSignature")),
      x => x.isNotNull))
    ecsFooter(out.drop("r", "json"))
  }
}

/** aws_cloudtrail insights (aws_cloudtrail/tables/insights.yml): the
  * default CloudTrail mapping plus insight details flattened to JSON
  * (the reference drops the structured copy, keeping the flattened one).
  */
object CloudTrailInsights {
  def apply(df: DataFrame): DataFrame = {
    // stash the insight subtree before the base mapping drops the raw line
    val withDetail = df.withColumn("__insight",
      get_json_object(col("json"), "$.insightDetails"))
    val out = CloudTrail(withDetail)
    setPath(out, "aws.cloudtrail.flattened.insight_details", col("__insight"))
      .drop("__insight")
  }
}

/** panw globalprotect (panw/tables/globalprotect.yml): VPN session events
  * over the shared syslog-prefix + positional-CSV machinery.
  */
object PanwGlobalProtect {

  def apply(df: DataFrame): DataFrame = {
    val prefix = "^[^,]*,([^,]*),([^,]*),([^,]*),([^,]*),([^,]*),([^,]*),(.*)$"
    def pfx(i: Int) = {
      val ex = regexp_extract(col("message"), prefix, i)
      when(ex =!= "", ex)
    }
    var out = df
      .withColumn("vals", F.transform(split(pfx(7), ","),
        v => when(v =!= " " && v =!= "", v)))
    def v(i: Int): Column = try_element_at(col("vals"), lit(i + 1))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v2: Column): Unit = out = setPath(out, p, v2)
    def panTs(c: Column): Column =
      try_to_timestamp(concat(c, lit("+00:00")), lit("yyyy/MM/dd HH:mm:ssXXX"))

    set("observer.vendor", lit("Palo Alto Networks"))
    set("observer.product", lit("PAN-OS"))
    set("observer.type", lit("firewall"))
    set("event.original", col("message"))
    set("event.kind", lit("event"))
    set("event.category", array(lit("network")))
    set("event.created", panTs(pfx(1)))
    set("observer.serial_number", pfx(2))
    set("ts", panTs(pfx(6)))

    val privIp = v(10); val privV6 = v(11)
    val pubIp = v(8); val pubV6 = v(9)
    val srcIp = when(privIp.isNotNull && privIp =!= "0.0.0.0", privIp)
      .otherwise(when(privV6 =!= "0.0.0.0", privV6))
    val natIp = when(pubIp.isNotNull && pubIp =!= "0.0.0.0", pubIp)
      .otherwise(when(pubV6 =!= "0.0.0.0", pubV6))
    set("panw.panos", struct(
      pfx(3).as("type"), pfx(4).as("sub_type"),
      v(0).as("virtual_sys"),
      struct(v(1).as("id"), v(18).as("reason"), v(21).as("status")).as("event"),
      v(2).as("stage"), v(3).as("auth_method"), v(4).as("tunnel_type"),
      struct(v(7).as("name")).as("machine"),
      struct(pubIp.as("ip"), pubV6.as("ipv6")).as("public"),
      struct(privIp.as("ip"), privV6.as("ipv6")).as("private"),
      struct(v(12).as("id")).as("host"),
      v(13).as("serial_number"),
      v(14).as("client_ver"),
      struct(v(15).as("os"), v(16).as("os_version")).as("client"),
      v(17).try_cast(LongType).as("repeat_count"),
      v(19).as("error_message"),
      v(20).as("description"),
      v(22).as("location"),
      v(23).try_cast(LongType).as("login_duration"),
      v(24).as("connect_method"),
      v(25).as("error_code"),
      v(26).as("portal"),
      v(27).as("sequence_number"),
      v(30).as("selection_type"),
      v(31).try_cast(LongType).as("response_time"),
      v(32).as("priority"),
      v(33).as("attempted_gateways"),
      v(34).as("gateway"),
      v(40).as("device_name")))
    set("event.code", g("panw.panos.event.id"))
    set("event.duration", g("panw.panos.login_duration"))
    set("event.outcome", g("panw.panos.event.status"))
    set("event.reason", g("panw.panos.event.reason"))
    set("source.ip", srcIp)
    set("source.nat.ip", natIp)
    set("host.ip", filter(array(srcIp), x => x.isNotNull))
    set("host.id", g("panw.panos.host.id"))
    set("host.name", g("panw.panos.machine.name"))
    set("host.os.family", g("panw.panos.client.os"))
    set("host.os.full", g("panw.panos.client.os_version"))
    set("observer.geo.name", g("panw.panos.location"))
    set("observer.hostname", g("panw.panos.device_name"))
    val srcUser = v(5)
    set("source.user.name", coalesce(
      when(regexp_extract(srcUser, "^([^\\\\]+)\\\\+(.+)$", 2) =!= "",
        regexp_extract(srcUser, "^([^\\\\]+)\\\\+(.+)$", 2)),
      when(regexp_extract(srcUser, "^([^@]+)@(.+)$", 1) =!= "",
        regexp_extract(srcUser, "^([^@]+)@(.+)$", 1)),
      srcUser))
    set("user", g("source.user"))
    set("related.ip", array_distinct(filter(array(srcIp, natIp), x => x.isNotNull)))
    set("related.user", filter(array(g("source.user.name")), x => x.isNotNull))
    set("related.hosts", filter(array(g("host.name")), x => x.isNotNull))
    out = out.drop("vals", "message")
    ecsFooter(out)
  }
}

/** panw threat (panw/tables/threat.yml): THREAT log rows — alert kind,
  * action-derived outcome, URL/file subtype handling of `misc`.
  */
object PanwThreat {

  def apply(df: DataFrame): DataFrame = {
    val prefix = "^[^,]*,([^,]*),([^,]*),([^,]*),([^,]*),([^,]*),([^,]*),(.*)$"
    def pfx(i: Int) = {
      val ex = regexp_extract(col("message"), prefix, i)
      when(ex =!= "", ex)
    }
    var out = df
      .withColumn("vals", F.transform(split(pfx(7), ","),
        v => when(v =!= " " && v =!= "", v)))
    def v(i: Int): Column = try_element_at(col("vals"), lit(i + 1))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v2: Column): Unit = out = setPath(out, p, v2)
    def panTs(c: Column): Column =
      try_to_timestamp(concat(c, lit("+00:00")), lit("yyyy/MM/dd HH:mm:ssXXX"))

    set("observer.vendor", lit("Palo Alto Networks"))
    set("observer.product", lit("PAN-OS"))
    set("observer.type", lit("firewall"))
    set("event.original", col("message"))
    set("event.kind", lit("alert"))
    set("event.category",
      array(lit("intrusion_detection"), lit("threat"), lit("network")))
    set("event.created", panTs(pfx(1)))
    set("observer.serial_number", pfx(2))
    set("ts", panTs(pfx(6)))

    val misc = v(24)
    set("panw.panos", struct(
      pfx(3).as("type"), pfx(4).as("sub_type"),
      struct(v(0).as("ip"), v(17).try_cast(IntegerType).as("port"),
        struct(v(2).as("ip"), v(19).try_cast(IntegerType).as("port")).as("nat"),
        v(9).as("zone"), v(31).as("location")).as("source"),
      struct(v(1).as("ip"), v(18).try_cast(IntegerType).as("port"),
        struct(v(3).as("ip"), v(20).try_cast(IntegerType).as("port")).as("nat"),
        v(10).as("zone"), v(32).as("location")).as("destination"),
      v(4).as("ruleset"),
      struct(v(7).as("application"), v(35).as("pcap_id"),
        v(28).as("direction")).as("network"),
      v(8).as("virtual_sys"),
      v(11).as("inbound_interface"),
      v(12).as("outbound_interface"),
      v(13).as("log_profile"),
      v(15).as("flow_id"),
      v(16).try_cast(LongType).as("repeat_count"),
      v(22).as("protocol"),
      v(23).as("action"),
      misc.as("misc"),
      struct(v(25).as("name"), v(62).as("category")).as("threat"),
      struct(v(26).as("category")).as("url"),
      v(27).as("severity"),
      v(29).as("sequence_number"),
      v(30).as("action_flags"),
      v(34).as("http_content_type"),
      struct(v(36).as("hash"), v(40).as("type")).as("file"),
      struct(v(37).as("name"), v(46).as("report_id")).as("wildfire"),
      v(39).as("user_agent"),
      v(42).as("referrer"),
      v(43).as("sender"),
      v(44).as("subject"),
      v(45).as("recipient"),
      v(52).as("device_name"),
      v(56).as("http_method"),
      v(69).as("rule_uuid"),
      struct(v(72).as("ip")).as("xff")))

    val dir = v(28)
    set("network.direction",
      when(dir === "0" || dir === "client-to-server", "inbound")
        .when(dir === "1" || dir === "server-to-client", "outbound")
        .otherwise("unknown"))
    set("event.outcome",
      when(g("panw.panos.action").isin("alert", "allow", "continue"), "success")
        .otherwise("failure"))
    set("source.ip", g("panw.panos.source.ip"))
    set("source.port", g("panw.panos.source.port"))
    set("source.nat.ip", g("panw.panos.source.nat.ip"))
    set("source.nat.port", g("panw.panos.source.nat.port"))
    set("source.user.email", g("panw.panos.sender"))
    set("destination.ip", g("panw.panos.destination.ip"))
    set("destination.port", g("panw.panos.destination.port"))
    set("destination.nat.ip", g("panw.panos.destination.nat.ip"))
    set("destination.nat.port", g("panw.panos.destination.nat.port"))
    set("destination.user.email", g("panw.panos.recipient"))
    set("network.application", g("panw.panos.network.application"))
    set("network.transport", g("panw.panos.protocol"))
    set("network.forwarded_ip", v(41))
    set("log.level", g("panw.panos.severity"))
    set("http.request.method", g("panw.panos.http_method"))
    set("http.request.referrer", g("panw.panos.referrer"))
    set("observer.egress.interface.name", g("panw.panos.outbound_interface"))
    set("observer.egress.zone", g("panw.panos.destination.zone"))
    set("observer.hostname", g("panw.panos.device_name"))
    set("observer.ingress.interface.name", g("panw.panos.inbound_interface"))
    set("observer.ingress.zone", g("panw.panos.source.zone"))
    set("rule.uuid", g("panw.panos.rule_uuid"))

    // subtype-aware `misc`: URL rows parse into url.*, file rows into file.*
    val isUrl = pfx(4) === "url" && misc.contains("/")
    val domainPort = substring_index(misc, "/", 1)
    val afterDomain = concat(lit("/"),
      expr("substring(vals[24], instr(vals[24], '/') + 1)")) // vals[] is 0-based
    set("url.original", when(isUrl, misc))
    set("url.domain", when(isUrl,
      when(domainPort.contains(":"), substring_index(domainPort, ":", 1))
        .otherwise(domainPort)))
    set("url.port", when(isUrl && domainPort.contains(":"),
      substring_index(domainPort, ":", -1).try_cast(IntegerType)))
    set("destination.domain", when(isUrl && !domainPort.contains(":"), domainPort))
    set("url.path", when(isUrl,
      when(afterDomain.contains("?"), substring_index(afterDomain, "?", 1))
        .otherwise(afterDomain)))
    set("url.query", when(isUrl && afterDomain.contains("?"),
      substring_index(afterDomain, "?", -1)))
    val isFile = pfx(4) === "file" && misc.isNotNull
    val isPath = misc.contains("/") || misc.contains("\\")
    set("file.path", when(isFile && isPath, misc))
    set("file.name", when(isFile && !isPath, misc)
      .when(isFile && isPath,
        element_at(split(misc, "[/\\\\]"), -1)))
    set("file.type", g("panw.panos.file.type"))

    set("related.ip", array_distinct(filter(array(
      g("source.ip"), g("destination.ip"),
      g("source.nat.ip"), g("destination.nat.ip")), x => x.isNotNull)))
    set("related.hash", filter(array(g("panw.panos.file.hash")), x => x.isNotNull))
    out = out.drop("vals", "message")
    ecsFooter(out)
  }
}
