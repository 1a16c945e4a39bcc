package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CrowdStrike Falcon Streaming API events (reference
  * data/managed/log_sources/crowdstrike_falcon/log_source.yml): one stream
  * carrying detection/incident/audit/auth/firewall/remote-response events,
  * branched on `metadata.eventType`. Distinct from [[CrowdstrikeFdr]]
  * (the raw FDR sensor telemetry source).
  */
object CrowdstrikeFalcon {

  val rawSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("eventType", StringType),
      StructField("eventCreationTime", LongType),
      StructField("offset", LongType),
      StructField("customerIDString", StringType),
      StructField("version", StringType)))),
    StructField("event", StructType(Seq(
      StructField("Success", BooleanType),
      StructField("UserName", StringType),
      StructField("UserId", StringType),
      StructField("UserIp", StringType),
      StructField("OperationName", StringType),
      StructField("ServiceName", StringType),
      StructField("CommandLine", StringType),
      StructField("LocalIP", StringType),
      StructField("ProcessId", StringType),
      StructField("PID", StringType),
      StructField("ParentImageFileName", StringType),
      StructField("ParentCommandLine", StringType),
      StructField("PatternDispositionDescription", StringType),
      StructField("FalconHostLink", StringType),
      StructField("Severity", StringType),
      StructField("DetectName", StringType),
      StructField("DetectDescription", StringType),
      StructField("FileName", StringType),
      StructField("MachineDomain", StringType),
      StructField("SensorId", StringType),
      StructField("ComputerName", StringType),
      StructField("HostName", StringType),
      StructField("HostnameField", StringType),
      StructField("SHA256String", StringType),
      StructField("MD5String", StringType),
      StructField("SHA1String", StringType),
      StructField("Technique", StringType),
      StructField("Tactic", StringType),
      StructField("FineScore", DoubleType),
      StructField("RuleId", StringType),
      StructField("RuleName", StringType),
      StructField("RuleGroupName", StringType),
      StructField("RuleDescription", StringType),
      StructField("RuleFamilyID", StringType),
      StructField("EventType", StringType),
      StructField("Ipv", StringType),
      StructField("ConnectionDirection", StringType),
      StructField("LocalAddress", StringType),
      StructField("LocalPort", LongType),
      StructField("RemoteAddress", StringType),
      StructField("RemotePort", LongType),
      StructField("ProcessStartTime", LongType),
      StructField("ProcessEndTime", LongType),
      StructField("MatchCount", LongType))))))

  /** Falcon timestamps arrive as epoch seconds OR milliseconds; the
    * reference branches on magnitude (> 1e12 → ms).
    */
  private def flexTs(c: Column): Column =
    when(c.isNull || c === 0, lit(null).cast(TimestampType))
      .when(c > 1000000000000L, timestamp_millis(c))
      .otherwise(timestamp_seconds(c))

  /** The reference nulls "-"/"N/A"/"NA"/"" scalar values. */
  private def denull(c: Column): Column =
    when(c.isin("", "-", "N/A", "NA"), lit(null).cast(StringType)).otherwise(c)

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.metadata.eventCreationTime").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val et = col("r.metadata.eventType")
    val ev = col("r.event")

    set("ts", flexTs(col("r.metadata.eventCreationTime")))
    set("crowdstrike", struct(
      struct(
        et.as("event_type"),
        flexTs(col("r.metadata.eventCreationTime")).as("event_creation_time"),
        col("r.metadata.offset").as("offset"),
        col("r.metadata.customerIDString").as("customer_id"),
        col("r.metadata.version").as("version")).as("metadata"),
      struct(
        ev.getField("Success").as("success"),
        denull(ev.getField("UserName")).as("user_name"),
        denull(ev.getField("UserId")).as("user_id"),
        denull(ev.getField("OperationName")).as("operation_name"),
        denull(ev.getField("ServiceName")).as("service_name"),
        denull(ev.getField("CommandLine")).as("command_line"),
        denull(ev.getField("DetectName")).as("detect_name"),
        denull(ev.getField("DetectDescription")).as("detect_description"),
        denull(ev.getField("Severity")).cast(IntegerType).as("severity"),
        flexTs(ev.getField("ProcessStartTime")).as("process_start_time"),
        flexTs(ev.getField("ProcessEndTime")).as("process_end_time"),
        ev.getField("MatchCount").as("match_count"),
        ev.getField("FineScore").as("fine_score")).as("event")))

    // event taxonomy per eventType branch
    set("event.kind",
      when(et.isin("DetectionSummaryEvent", "IncidentSummaryEvent"), "alert")
        .otherwise("event"))
    set("event.category",
      when(et.isin("DetectionSummaryEvent", "IncidentSummaryEvent"), array(lit("malware")))
        .when(et === "UserActivityAuditEvent", array(lit("iam")))
        .when(et === "AuthActivityAuditEvent", array(lit("authentication")))
        .when(et === "FirewallMatchEvent", array(lit("network")))
        .when(et.isin("RemoteResponseSessionStartEvent", "RemoteResponseSessionEndEvent"),
          array(lit("network"), lit("session")))
        .otherwise(array().cast(ArrayType(StringType))))
    set("event.type",
      when(et.isin("DetectionSummaryEvent", "IncidentSummaryEvent"), array(lit("info")))
        .when(et.isin("UserActivityAuditEvent", "AuthActivityAuditEvent"),
          array(lit("change")))
        .when(et === "FirewallMatchEvent", array(lit("start"), lit("connection")))
        .when(et === "RemoteResponseSessionStartEvent", array(lit("start")))
        .when(et === "RemoteResponseSessionEndEvent", array(lit("end")))
        .otherwise(array().cast(ArrayType(StringType))))
    set("event.outcome",
      when(ev.getField("Success") === true, "success")
        .when(ev.getField("Success") === false, "failure")
        .otherwise("unknown"))
    set("agent.type",
      when(et.isin("DetectionSummaryEvent", "IncidentSummaryEvent"), "falcon"))
    set("agent.id", when(et === "DetectionSummaryEvent", ev.getField("SensorId")))

    set("event.action",
      when(et === "DetectionSummaryEvent", ev.getField("PatternDispositionDescription"))
        .when(et === "IncidentSummaryEvent", lit("incident"))
        .when(et === "UserActivityAuditEvent", lit("user_activity_audit_event"))
        .when(et === "AuthActivityAuditEvent", ev.getField("OperationName"))
        .when(et === "FirewallMatchEvent", lit("firewall_match_event"))
        .when(et === "RemoteResponseSessionStartEvent",
          lit("remote_response_session_start_event"))
        .when(et === "RemoteResponseSessionEndEvent",
          lit("remote_response_session_end_event")))
    set("event.url", when(et.isin("DetectionSummaryEvent", "IncidentSummaryEvent"),
      ev.getField("FalconHostLink")))
    set("event.severity",
      when(et === "DetectionSummaryEvent", ev.getField("Severity").cast(LongType)))
    set("event.code", when(et === "FirewallMatchEvent", ev.getField("EventType")))
    set("message",
      when(et === "DetectionSummaryEvent", ev.getField("DetectDescription"))
        .when(et === "IncidentSummaryEvent" && ev.getField("FineScore").isNotNull,
          concat(lit("Incident score "), ev.getField("FineScore").cast(StringType)))
        .when(et === "UserActivityAuditEvent", ev.getField("OperationName"))
        .when(et === "AuthActivityAuditEvent", ev.getField("ServiceName"))
        .when(et === "FirewallMatchEvent",
          concat(lit("Firewall Rule '"), ev.getField("RuleName"), lit("' triggered")))
        .when(et === "RemoteResponseSessionStartEvent", lit("Remote response session started."))
        .when(et === "RemoteResponseSessionEndEvent", lit("Remote response session ended.")))

    // identity: UserName falls back to UserId; emails detected by '@'
    val userName = coalesce(denull(ev.getField("UserName")), denull(ev.getField("UserId")))
    set("user.name", userName)
    set("user.email", when(size(split(userName, "@")) === 2, userName))
    set("user.domain", when(et === "DetectionSummaryEvent", ev.getField("MachineDomain")))

    // process: command line → args/executable
    val cmd = trim(denull(ev.getField("CommandLine")))
    val args = filter(split(cmd, " "), a => a =!= "")
    set("process", struct(
      when(cmd =!= "", cmd).as("command_line"),
      when(cmd =!= "", args).as("args"),
      when(cmd =!= "", element_at(args, 1)).as("executable"),
      when(et === "DetectionSummaryEvent", ev.getField("ProcessId").cast(LongType))
        .when(et === "FirewallMatchEvent", ev.getField("PID").cast(LongType)).as("pid"),
      when(et === "DetectionSummaryEvent", ev.getField("FileName")).as("name"),
      struct(
        when(et === "DetectionSummaryEvent", ev.getField("ParentImageFileName"))
          .as("executable"),
        when(et === "DetectionSummaryEvent", ev.getField("ParentCommandLine"))
          .as("command_line")).as("parent")))

    // detection branch: hashes (all-zero hashes are placeholders), threat taxonomy
    def hash(f: String): Column =
      when(et === "DetectionSummaryEvent", denull(ev.getField(f)))
    val sha256 = hash("SHA256String")
    val md5 = hash("MD5String")
    val sha1 = hash("SHA1String")
    set("file.hash", struct(md5.as("md5"), sha1.as("sha1"), sha256.as("sha256")))
    set("rule.name",
      when(et === "DetectionSummaryEvent", ev.getField("DetectName"))
        .when(et === "FirewallMatchEvent", ev.getField("RuleName")))
    set("rule.description",
      when(et === "DetectionSummaryEvent", ev.getField("DetectDescription"))
        .when(et === "FirewallMatchEvent", ev.getField("RuleDescription")))
    set("rule.id", when(et === "FirewallMatchEvent", ev.getField("RuleId")))
    set("rule.ruleset", when(et === "FirewallMatchEvent", ev.getField("RuleGroupName")))
    set("rule.category", when(et === "FirewallMatchEvent", ev.getField("RuleFamilyID")))
    set("threat.technique.name", when(et === "DetectionSummaryEvent" &&
      ev.getField("Technique").isNotNull, array(lower(ev.getField("Technique")))))
    set("threat.tactic.name", when(et === "DetectionSummaryEvent" &&
      ev.getField("Tactic").isNotNull, array(lower(ev.getField("Tactic")))))

    // endpoints: firewall events orient local/remote by ConnectionDirection
    val ingress = ev.getField("ConnectionDirection") === "1"
    val srcIp =
      when(et === "DetectionSummaryEvent", denull(ev.getField("LocalIP")))
        .when(et.isin("UserActivityAuditEvent", "AuthActivityAuditEvent"),
          denull(ev.getField("UserIp")))
        .when(et === "FirewallMatchEvent",
          when(ingress, ev.getField("RemoteAddress")).otherwise(ev.getField("LocalAddress")))
    val dstIp = when(et === "FirewallMatchEvent",
      when(ingress, ev.getField("LocalAddress")).otherwise(ev.getField("RemoteAddress")))
    set("source.ip", srcIp)
    set("source.port", when(et === "FirewallMatchEvent",
      when(ingress, ev.getField("RemotePort")).otherwise(ev.getField("LocalPort"))))
    set("destination.ip", dstIp)
    set("destination.port", when(et === "FirewallMatchEvent",
      when(ingress, ev.getField("LocalPort")).otherwise(ev.getField("RemotePort"))))
    set("network.direction", when(et === "FirewallMatchEvent",
      when(ingress, "ingress").otherwise("egress")))
    set("network.type", when(et === "FirewallMatchEvent", ev.getField("Ipv")))
    val hostName =
      when(et === "DetectionSummaryEvent", ev.getField("ComputerName"))
        .when(et === "FirewallMatchEvent", ev.getField("HostName"))
        .when(et.isin("RemoteResponseSessionStartEvent", "RemoteResponseSessionEndEvent"),
          ev.getField("HostnameField"))
    set("host.name", hostName)

    val zeroRe = "^0+$"
    set("related.hash", filter(array(sha256, md5, sha1),
      h => h.isNotNull && !h.rlike(zeroRe)))
    set("related.user", filter(array(userName), x => x.isNotNull && x =!= ""))
    set("related.ip", array_distinct(filter(array(srcIp, dstIp),
      x => x.isNotNull && x =!= "")))
    set("related.hosts", filter(array(hostName), x => x.isNotNull && x =!= ""))

    ecsFooter(out.drop("r", "json"))
  }
}

/** matano_alerts re-ingest (reference
  * data/managed/log_sources/matano_alerts/log_source.yml): alert rows
  * recursed through the pipeline as their own log source. The reference
  * transform is one giant "parse every ECS timestamp string" pass because
  * its alerts cross a JSON boundary; here alerts stay TYPED end-to-end
  * (Detection.matanoAlertRows emits native timestamp columns), so this
  * mapping only covers the external-JSON entry path: records published by
  * other systems into the alerts table.
  */
object MatanoAlerts {

  val rawSchema: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("event", StructType(Seq(
      StructField("created", StringType),
      StructField("kind", StringType),
      StructField("id", StringType)))),
    StructField("message", StringType),
    StructField("matano", StructType(Seq(
      StructField("table", StringType),
      StructField("alert", StructType(Seq(
        StructField("id", StringType),
        StructField("dedupe", StringType),
        StructField("severity", StringType),
        StructField("activated", BooleanType),
        StructField("first_matched_at", StringType),
        StructField("original_timestamp", StringType),
        StructField("rule", StructType(Seq(
          StructField("name", StringType),
          StructField("severity", StringType),
          StructField("threshold", IntegerType),
          StructField("deduplication_window", LongType))))))))))))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
      .filter(col("r.ts").isNotNull)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    def ts(c: Column): Column = to_timestamp(c)
    set("ts", ts(col("r.ts")))
    set("event.kind", coalesce(col("r.event.kind"), lit("signal")))
    set("event.created", ts(col("r.event.created")))
    set("event.id", col("r.event.id"))
    set("message", col("r.message"))
    set("matano", struct(
      col("r.matano.table").as("table"),
      struct(
        col("r.matano.alert.id").as("id"),
        col("r.matano.alert.dedupe").as("dedupe"),
        col("r.matano.alert.severity").as("severity"),
        col("r.matano.alert.activated").as("activated"),
        ts(col("r.matano.alert.first_matched_at")).as("first_matched_at"),
        ts(col("r.matano.alert.original_timestamp")).as("original_timestamp"),
        struct(
          col("r.matano.alert.rule.name").as("name"),
          col("r.matano.alert.rule.severity").as("severity"),
          col("r.matano.alert.rule.threshold").as("threshold"),
          col("r.matano.alert.rule.deduplication_window").as("deduplication_window")
        ).as("rule")).as("alert")))
    ecsFooter(out.drop("r", "json"))
  }
}
