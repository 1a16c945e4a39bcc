package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Cloudflare mappings (reference
  * data/managed/log_sources/cloudflare/tables/{dns,audit,firewall_event,
  * http_request}.yml): one log source fanning into per-table transforms
  * (the S7 routing shape) — dns query logs → ECS dns/source/related,
  * account audit logs → authentication events with actor identity,
  * firewall events → rule/action/http with parsed user agent, http
  * request logs → full edge/origin/cache telemetry.
  */
object Cloudflare {

  /** `HTTP/1.1` → (network.protocol "http", http.version "1.1") — the
    * reference groks `^%{DATA:network.protocol}/%{DATA:http.version}$`.
    */
  private def protoParts(c: Column): (Column, Column) = (
    when(c.contains("/"), lower(substring_index(c, "/", 1))),
    when(c.contains("/"), substring_index(c, "/", -1)))

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

  val firewallSchema: StructType = StructType(Seq(
    StructField("Datetime", LongType),
    StructField("Action", StringType),
    StructField("ClientRequestMethod", StringType),
    StructField("EdgeResponseStatus", LongType),
    StructField("RuleID", StringType),
    StructField("Ref", StringType),
    StructField("Description", StringType),
    StructField("ClientASN", LongType),
    StructField("ClientASNDescription", StringType),
    StructField("ClientCountry", StringType),
    StructField("ClientIP", StringType),
    StructField("ClientIPClass", StringType),
    StructField("ClientRefererHost", StringType),
    StructField("ClientRefererPath", StringType),
    StructField("ClientRefererQuery", StringType),
    StructField("ClientRefererScheme", StringType),
    StructField("ClientRequestHost", StringType),
    StructField("ClientRequestPath", StringType),
    StructField("ClientRequestProtocol", StringType),
    StructField("ClientRequestQuery", StringType),
    StructField("ClientRequestScheme", StringType),
    StructField("ClientRequestUserAgent", StringType),
    StructField("EdgeColoCode", StringType),
    StructField("Kind", StringType),
    StructField("MatchIndex", LongType),
    StructField("Metadata", MapType(StringType, StringType)),
    StructField("OriginResponseStatus", LongType),
    StructField("OriginatorRayID", StringType),
    StructField("RayID", StringType),
    StructField("Source", StringType)))

  /** firewall_event.yml: WAF rule hits → ECS rule/http/source + the full
    * cloudflare.firewall_event payload struct.
    */
  def firewallEvent(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), firewallSchema))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.category", array(lit("network")))
    set("event.kind", lit("event"))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.Datetime")))
    val (netProto, httpVer) = protoParts(col("r.ClientRequestProtocol"))
    set("cloudflare.firewall_event", struct(
      timestamp_seconds(col("r.Datetime")).as("timestamp"),
      col("r.Action").as("action"),
      struct(
        struct(col("r.ClientASNDescription").as("description"),
          col("r.ClientASN").as("value")).as("asn"),
        col("r.ClientCountry").as("country"),
        col("r.ClientIP").as("ip"),
        col("r.ClientIPClass").as("ip_class"),
        struct(col("r.ClientRefererHost").as("host"),
          col("r.ClientRefererPath").as("path"),
          col("r.ClientRefererQuery").as("query"),
          col("r.ClientRefererScheme").as("scheme")).as("referer"),
        struct(col("r.ClientRequestHost").as("host"),
          col("r.ClientRequestMethod").as("method"),
          col("r.ClientRequestPath").as("path"),
          col("r.ClientRequestProtocol").as("protocol"),
          col("r.ClientRequestQuery").as("query"),
          col("r.ClientRequestScheme").as("scheme"),
          struct(col("r.ClientRequestUserAgent").as("agent")).as("user")
        ).as("request")).as("client"),
      struct(struct(col("r.EdgeColoCode").as("code")).as("colo"),
        struct(col("r.EdgeResponseStatus").as("status")).as("response")).as("edge"),
      col("r.Kind").as("kind"),
      col("r.MatchIndex").as("match_index"),
      when(col("r.Metadata").isNotNull, to_json(col("r.Metadata"))).as("metadata"),
      struct(struct(col("r.OriginatorRayID").as("id")).as("ray"),
        struct(col("r.OriginResponseStatus").as("status")).as("response")).as("origin"),
      struct(col("r.RayID").as("id")).as("ray"),
      struct(col("r.RuleID").as("id"), col("r.Ref").as("reference"),
        col("r.Description").as("description")).as("rule"),
      col("r.Source").as("source")))
    set("event.action", lower(col("r.Action")))
    set("http.request.method", col("r.ClientRequestMethod"))
    set("http.response.status_code", col("r.EdgeResponseStatus"))
    set("http.version", httpVer)
    set("network.protocol", netProto)
    set("rule.id", col("r.RuleID"))
    set("rule.reference", col("r.Ref"))
    set("rule.description", col("r.Description"))
    set("source.as.number", col("r.ClientASN"))
    set("source.geo.country_iso_code", col("r.ClientCountry"))
    set("source.ip", col("r.ClientIP"))
    set("url.scheme", col("r.ClientRequestScheme"))
    set("user_agent", parseUserAgent(col("r.ClientRequestUserAgent"))
      .withField("original", col("r.ClientRequestUserAgent")))
    set("related.ip", filter(array(col("r.ClientIP")), x => x.isNotNull))
    set("related.hosts", array_distinct(filter(
      array(col("r.ClientRefererHost"), col("r.ClientRequestHost")),
      x => x.isNotNull)))

    out = out.drop("r", "json")
    ecsFooter(out)
  }

  val httpRequestSchema: StructType = StructType(Seq(
    StructField("EdgeStartTimestamp", LongType),
    StructField("EdgeEndTimestamp", LongType),
    StructField("OriginIP", StringType),
    StructField("ClientRequestMethod", StringType),
    StructField("EdgeResponseContentType", StringType),
    StructField("EdgeResponseStatus", LongType),
    StructField("EdgeResponseBytes", LongType),
    StructField("ClientASN", LongType),
    StructField("ClientCountry", StringType),
    StructField("ClientIP", StringType),
    StructField("ClientIPClass", StringType),
    StructField("ClientDeviceType", StringType),
    StructField("BotScore", LongType),
    StructField("BotScoreSrc", StringType),
    StructField("CacheCacheStatus", StringType),
    StructField("CacheResponseBytes", LongType),
    StructField("CacheResponseStatus", LongType),
    StructField("CacheTieredFill", BooleanType),
    StructField("ClientRequestBytes", LongType),
    StructField("ClientRequestHost", StringType),
    StructField("ClientRequestPath", StringType),
    StructField("ClientRequestProtocol", StringType),
    StructField("ClientRequestReferer", StringType),
    StructField("ClientRequestScheme", StringType),
    StructField("ClientRequestSource", StringType),
    StructField("ClientRequestURI", StringType),
    StructField("ClientRequestUserAgent", StringType),
    StructField("ClientSSLCipher", StringType),
    StructField("ClientSSLProtocol", StringType),
    StructField("EdgeServerIP", StringType),
    StructField("OriginResponseStatus", LongType),
    StructField("OriginResponseBytes", LongType),
    StructField("OriginResponseDurationMs", LongType),
    StructField("RayID", StringType),
    StructField("WAFAction", StringType),
    StructField("WAFRuleID", StringType),
    StructField("ZoneID", LongType)))

  /** http_request.yml: edge request logs → ECS http/tls/url/user_agent +
    * the cloudflare.http_request telemetry struct. `TLSv1.3` groks into
    * (tls.version_protocol "tls", tls.version "1.3") as the reference
    * does; "none" means no TLS and stays null.
    */
  def httpRequest(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), httpRequestSchema))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.category", array(lit("network")))
    set("event.kind", lit("event"))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.EdgeStartTimestamp")))
    val (netProto, httpVer) = protoParts(col("r.ClientRequestProtocol"))
    val ssl = col("r.ClientSSLProtocol")
    val sslParses = ssl.isNotNull && ssl =!= "none" && ssl.contains("v")
    set("cloudflare.http_request", struct(
      struct(timestamp_seconds(col("r.EdgeStartTimestamp")).as("start_time"),
        timestamp_seconds(col("r.EdgeEndTimestamp")).as("end_time"),
        struct(col("r.EdgeResponseContentType").as("content_type"),
          col("r.EdgeResponseStatus").as("status"),
          col("r.EdgeResponseBytes").as("bytes")).as("response"),
        struct(col("r.EdgeServerIP").as("ip")).as("server")).as("edge"),
      struct(col("r.ClientASN").as("asn"),
        col("r.ClientCountry").as("country"),
        col("r.ClientIP").as("ip"),
        col("r.ClientIPClass").as("ip_class"),
        struct(col("r.ClientDeviceType").as("type")).as("device"),
        struct(col("r.ClientRequestBytes").as("bytes"),
          col("r.ClientRequestHost").as("host"),
          col("r.ClientRequestMethod").as("method"),
          col("r.ClientRequestPath").as("path"),
          col("r.ClientRequestProtocol").as("protocol"),
          col("r.ClientRequestReferer").as("referer"),
          col("r.ClientRequestScheme").as("scheme"),
          col("r.ClientRequestSource").as("source"),
          col("r.ClientRequestURI").as("uri"),
          struct(col("r.ClientRequestUserAgent").as("agent")).as("user")
        ).as("request"),
        struct(col("r.ClientSSLCipher").as("cipher"),
          col("r.ClientSSLProtocol").as("protocol")).as("ssl")).as("client"),
      struct(struct(col("r.BotScore").as("value"),
        col("r.BotScoreSrc").as("src")).as("score")).as("bot"),
      struct(col("r.CacheCacheStatus").as("status"),
        struct(col("r.CacheResponseBytes").as("bytes"),
          col("r.CacheResponseStatus").as("status")).as("response"),
        col("r.CacheTieredFill").as("tiered_fill")).as("cache"),
      struct(col("r.OriginIP").as("ip"),
        struct(col("r.OriginResponseStatus").as("status"),
          col("r.OriginResponseBytes").as("bytes"),
          col("r.OriginResponseDurationMs").as("duration_ms")).as("response")
      ).as("origin"),
      struct(col("r.RayID").as("id")).as("ray"),
      struct(col("r.WAFAction").as("action"),
        col("r.WAFRuleID").as("rule_id")).as("waf"),
      struct(col("r.ZoneID").as("id")).as("zone")))
    set("destination.ip", col("r.OriginIP"))
    set("http.request.method", col("r.ClientRequestMethod"))
    set("http.request.bytes", col("r.ClientRequestBytes"))
    set("http.response.mime_type", col("r.EdgeResponseContentType"))
    set("http.response.status_code", col("r.EdgeResponseStatus"))
    set("http.response.bytes", col("r.EdgeResponseBytes"))
    set("http.version", httpVer)
    set("network.protocol", netProto)
    set("source.as.number", col("r.ClientASN"))
    set("source.geo.country_iso_code", col("r.ClientCountry"))
    set("source.ip", col("r.ClientIP"))
    // Intentional deviation from the reference's http_request.yml, which
    // derives url.* by parsing ClientRequestReferer (the REFERRING page's
    // URL): we describe the REQUESTED resource — scheme/host/path from the
    // ClientRequest* fields — which is what ECS url.* consumers expect.
    // url.original/url.query keep ECS parity from ClientRequestURI
    // (path + query string of the actual request).
    set("url.scheme", col("r.ClientRequestScheme"))
    set("url.domain", col("r.ClientRequestHost"))
    set("url.path", col("r.ClientRequestPath"))
    set("url.original", col("r.ClientRequestURI"))
    set("url.query", when(col("r.ClientRequestURI").contains("?"),
      substring_index(col("r.ClientRequestURI"), "?", -1)))
    set("tls.cipher", col("r.ClientSSLCipher"))
    set("tls.version_protocol",
      when(sslParses, lower(substring_index(ssl, "v", 1))))
    set("tls.version", when(sslParses, substring_index(ssl, "v", -1)))
    set("user_agent", parseUserAgent(col("r.ClientRequestUserAgent"))
      .withField("original", col("r.ClientRequestUserAgent")))
    set("related.ip", array_distinct(filter(
      array(col("r.ClientIP"), col("r.OriginIP"), col("r.EdgeServerIP")),
      x => x.isNotNull)))
    set("related.hosts", filter(array(col("r.ClientRequestHost")), x => x.isNotNull))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
