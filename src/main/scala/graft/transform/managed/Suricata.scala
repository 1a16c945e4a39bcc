package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed Suricata EVE mapping (reference
  * data/managed/log_sources/suricata/tables/eve.yml): JSON events → ECS.
  * Covers the event_type → kind/category/type mapping table, endpoint and
  * MAC normalization, the alert branch (rule.*, severity, mitre threat.*,
  * action → event.type), the dns branch (v1/v2 answers, resolved_ip,
  * header_flags), the http branch (method/status/url/outcome), the tls
  * branch (version split, sni, x509 subject/issuer kv parse, sha1,
  * ja3/ja3s), flow counters/state, app_proto protocol override, and
  * related.{ip,hosts,hash}. The eve timestamp's offset form `+0000` is
  * normalized to `+00:00` exactly as the reference does.
  */
object Suricata {

  private def s(n: String) = StructField(n, StringType)

  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("event_type", StringType),
    StructField("flow_id", LongType),
    StructField("src_ip", StringType), StructField("src_port", IntegerType),
    StructField("dest_ip", StringType), StructField("dest_port", IntegerType),
    StructField("proto", StringType),
    StructField("app_proto", StringType),
    StructField("community_id", StringType),
    StructField("ether", StructType(Seq(s("src_mac"), s("dest_mac")))),
    StructField("alert", StructType(Seq(
      s("action"), s("category"), s("signature"),
      StructField("signature_id", LongType),
      StructField("severity", LongType),
      StructField("metadata", StructType(Seq(
        StructField("protocols", ArrayType(StringType)),
        StructField("attack_target", ArrayType(StringType)),
        StructField("cve", ArrayType(StringType)),
        StructField("malware", ArrayType(StringType)),
        StructField("created_at", ArrayType(StringType)),
        StructField("updated_at", ArrayType(StringType)),
        StructField("filename", ArrayType(StringType)),
        StructField("classtype", ArrayType(StringType)),
        StructField("rule_source", ArrayType(StringType)),
        StructField("sid", ArrayType(StringType)),
        StructField("mitre_attack", ArrayType(StringType)),
        StructField("mitre_tactic_id", ArrayType(StringType)),
        StructField("mitre_tactic_name", ArrayType(StringType)),
        StructField("mitre_technique_id", ArrayType(StringType)))))))),
    StructField("http", StructType(Seq(
      s("http_method"), s("hostname"), s("url"), s("http_refer"),
      s("protocol"), s("http_user_agent"),
      StructField("http_port", IntegerType),
      StructField("status", LongType),
      StructField("length", LongType)))),
    StructField("dns", StructType(Seq(
      StructField("id", LongType),
      StructField("version", IntegerType),
      s("type"), s("rcode"), s("rrname"), s("rrtype"), s("rdata"),
      StructField("ttl", LongType),
      StructField("aa", BooleanType), StructField("tc", BooleanType),
      StructField("rd", BooleanType), StructField("ra", BooleanType),
      StructField("answers", ArrayType(StructType(Seq(
        s("rrname"), s("rrtype"), s("rdata"),
        StructField("ttl", LongType)))))))),
    StructField("tls", StructType(Seq(
      s("version"), s("sni"), s("subject"), s("issuerdn"), s("fingerprint"),
      s("serial"), s("certificate"), s("chain"), s("notafter"), s("notbefore"),
      StructField("session_resumed", BooleanType),
      StructField("ja3", StructType(Seq(s("hash")))),
      StructField("ja3s", StructType(Seq(s("hash"))))))),
    StructField("flow", StructType(Seq(
      s("state"),
      StructField("pkts_toserver", LongType),
      StructField("pkts_toclient", LongType),
      StructField("bytes_toserver", LongType),
      StructField("bytes_toclient", LongType)))),
    StructField("fileinfo", StructType(Seq(
      s("filename"), StructField("size", LongType))))))

  /** kind/category/type/protocol per event_type (the reference's
    * event_mappings object).
    */
  private val mappings: Map[String, (Option[String], Seq[String], Seq[String], Option[String])] = Map(
    // event_type -> (kind, category, type, network_protocol)
    "alert" -> (Some("alert"), Seq("network", "intrusion_detection"), Nil, None),
    "dns" -> (None, Nil, Seq("protocol"), Some("dns")),
    "flow" -> (None, Nil, Seq("connection"), None),
    "ftp" -> (None, Nil, Seq("protocol"), Some("ftp")),
    "ftp_data" -> (None, Nil, Seq("protocol"), Some("ftp")),
    "http" -> (None, Seq("network", "web"), Seq("access", "protocol"), Some("http")),
    "http2" -> (None, Seq("network", "web"), Seq("access", "protocol"), Some("http")),
    "ikev2" -> (None, Nil, Seq("protocol"), Some("ikev2")),
    "krb5" -> (None, Nil, Seq("protocol"), Some("krb5")),
    "mqtt" -> (None, Nil, Seq("protocol"), Some("mqtt")),
    "smb" -> (None, Nil, Seq("protocol"), Some("smb")),
    "smtp" -> (None, Nil, Seq("protocol"), Some("smtp")),
    "snmp" -> (None, Nil, Seq("protocol"), Some("snmp")),
    "ssh" -> (None, Nil, Seq("protocol"), Some("ssh")),
    "stats" -> (Some("metric"), Nil, Nil, None),
    "tftp" -> (None, Nil, Seq("protocol"), Some("tftp")),
    "tls" -> (None, Nil, Seq("protocol"), Some("tls")),
    "rdp" -> (None, Nil, Seq("protocol"), Some("rdp")),
    "rfb" -> (None, Nil, Seq("protocol"), Some("rdp")))

  private def mapLookup[T](et: Column, pick: ((Option[String], Seq[String], Seq[String], Option[String])) => Option[T]): Column =
    mappings.foldLeft(lit(null).cast(StringType)) { case (acc, (k, v)) =>
      pick(v).map(x => when(et === k, lit(x)).otherwise(acc)).getOrElse(acc)
    }

  private def mapLookupArr(et: Column, pick: ((Option[String], Seq[String], Seq[String], Option[String])) => Seq[String]): Column =
    mappings.foldLeft(array().cast(ArrayType(StringType))) { case (acc, (k, v)) =>
      val xs = pick(v)
      if (xs.isEmpty) acc
      else when(et === k, array(xs.map(lit): _*)).otherwise(acc)
    }

  /** eve timestamp offset normalization: `...+0000` → `...+00:00`, no
    * offset → append Z (reference eve.yml ts munging).
    */
  private def normTs(c: Column): Column = {
    val withColon = regexp_replace(c, "([+-][0-9]{2})([0-9]{2})$", "$1:$2")
    val hasOffset = c.rlike("[+-][0-9]{2}:?[0-9]{2}$") || c.endsWith("Z")
    try_to_timestamp(when(hasOffset, withColon).otherwise(concat(c, lit("Z"))))
  }

  private def macNorm(c: Column): Column =
    upper(regexp_replace(c, "[-:.]", "-"))

  private def kvStruct(kv: Column): Column = {
    def one(k: String) = {
      val v = try_element_at(kv, lit(k))
      when(v.isNotNull, array(v))
    }
    struct(
      one("C").as("country"), one("O").as("organization"),
      one("OU").as("organizational_unit"), one("CN").as("common_name"),
      one("L").as("locality"), one("ST").as("state_or_province"))
  }

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    val et = lower(col("r.event_type"))
    set("ts", normTs(col("r.timestamp")))
    set("event.kind", coalesce(mapLookup(et, _._1), lit("event")))
    set("event.category",
      when(mapLookupArr(et, _._2) =!= array().cast(ArrayType(StringType)),
        mapLookupArr(et, _._2)).otherwise(array(lit("network"))))
    set("event.original", col("json"))

    // endpoints
    set("source.mac", macNorm(col("r.ether.src_mac")))
    set("destination.mac", macNorm(col("r.ether.dest_mac")))
    set("source.address", col("r.src_ip"))
    set("source.ip", col("r.src_ip"))
    set("source.port", col("r.src_port"))
    set("destination.address", col("r.dest_ip"))
    set("destination.ip", col("r.dest_ip"))
    set("destination.port", col("r.dest_port"))
    set("network.transport", lower(col("r.proto")))
    set("network.community_id", col("r.community_id"))

    // protocol: mapping table, then app_proto override
    val appProto = lower(col("r.app_proto"))
    set("network.protocol", coalesce(
      when(appProto === "ftp-data", "ftp")
        .when(appProto.isNotNull && !appProto.isin("failed", "template", "template-rust"), appProto),
      mapLookup(et, _._4)))

    // event.type: mapping table + flow state + alert action
    val action = when(col("r.alert.action") === "blocked", "denied")
      .otherwise(col("r.alert.action"))
    set("event.type", concat(
      mapLookupArr(et, _._3),
      when(col("r.flow.state") === "new", array(lit("start")))
        .when(col("r.flow.state") === "closed", array(lit("end")))
        .otherwise(array().cast(ArrayType(StringType))),
      filter(array(action), x => x.isNotNull)))

    // ---- alert branch -------------------------------------------------
    set("message", col("r.alert.category"))
    set("rule.category", col("r.alert.category"))
    set("rule.id", col("r.alert.signature_id").cast(StringType))
    set("rule.name", col("r.alert.signature"))
    set("event.severity", col("r.alert.severity"))
    set("threat.tactic.id", coalesce(
      col("r.alert.metadata.mitre_attack"), col("r.alert.metadata.mitre_tactic_id")))
    set("threat.tactic.name", col("r.alert.metadata.mitre_tactic_name"))
    set("threat.technique.id", col("r.alert.metadata.mitre_technique_id"))
    set("file.name", array_join(col("r.alert.metadata.filename"), ", "))

    // ---- http branch --------------------------------------------------
    set("http.request.method", col("r.http.http_method"))
    set("http.response.status_code", col("r.http.status"))
    set("http.response.body.bytes", col("r.http.length"))
    set("http.request.referrer", col("r.http.http_refer"))
    set("event.outcome", when(et === "http" && col("r.http.status").isNotNull,
      when(col("r.http.status") < 400L, "success").otherwise("failure")))
    val urlRaw = col("r.http.url")
    set("url.original", urlRaw)
    set("url.path", coalesce(parse_url(concat(lit("http://h"), urlRaw), lit("PATH")), urlRaw))
    set("url.query", parse_url(concat(lit("http://h"), urlRaw), lit("QUERY")))

    // ---- dns branch (v1 single-answer fields, v2 answers array) -------
    val isDns = g("network.protocol") === "dns"
    set("dns.id", when(isDns, col("r.dns.id").cast(StringType)))
    set("dns.response_code", when(isDns, col("r.dns.rcode")))
    set("dns.type", when(isDns, col("r.dns.type")))
    set("dns.question.name",
      when(isDns && (col("r.dns.type") === "query" || col("r.dns.version") === 2),
        col("r.dns.rrname")))
    set("dns.question.type",
      when(isDns && (col("r.dns.type") === "query" || col("r.dns.version") === 2),
        col("r.dns.rrtype")))
    val answerType = StructType(Seq(
      s("name"), s("type"), s("data"), StructField("ttl", LongType)))
    val v2Answers = F.transform(col("r.dns.answers"), a => struct(
      a.getField("rrname").as("name"), a.getField("rrtype").as("type"),
      a.getField("rdata").as("data"), a.getField("ttl").as("ttl")))
    val v1Answer = struct(
      col("r.dns.rrname").as("name"), col("r.dns.rrtype").as("type"),
      col("r.dns.rdata").as("data"), col("r.dns.ttl").as("ttl"))
    val isAnswer = isDns && col("r.dns.type") === "answer"
    set("dns.answers",
      when(isAnswer && col("r.dns.version") === 2, v2Answers)
        .when(isAnswer && (col("r.dns.rrname").isNotNull || col("r.dns.rdata").isNotNull),
          array(v1Answer).cast(ArrayType(answerType))))
    set("dns.resolved_ip", coalesce(
      F.transform(
        filter(coalesce(g("dns.answers"), array().cast(ArrayType(answerType))),
          a => a.getField("type").isin("A", "AAAA")),
        a => a.getField("data")),
      array().cast(ArrayType(StringType))))
    set("dns.header_flags", when(isDns, concat(
      when(col("r.dns.aa"), array(lit("AA"))).otherwise(array().cast(ArrayType(StringType))),
      when(col("r.dns.tc"), array(lit("TC"))).otherwise(array().cast(ArrayType(StringType))),
      when(col("r.dns.rd"), array(lit("RD"))).otherwise(array().cast(ArrayType(StringType))),
      when(col("r.dns.ra"), array(lit("RA"))).otherwise(array().cast(ArrayType(StringType))))))

    // ---- tls branch ---------------------------------------------------
    val isTls = g("network.protocol") === "tls"
    val tlsVer = col("r.tls.version")
    val verParts = split(tlsVer, " ", 2)
    set("tls.version_protocol",
      when(isTls && tlsVer =!= "UNDETERMINED", lower(try_element_at(verParts, lit(1)))))
    set("tls.version",
      when(isTls && tlsVer =!= "UNDETERMINED", try_element_at(verParts, lit(2))))
    val sni = when(col("r.tls.sni").endsWith("."),
      expr("substring(r.tls.sni, 1, length(r.tls.sni) - 1)")).otherwise(col("r.tls.sni"))
    set("tls.client.server_name", when(isTls, sni))
    set("tls.server.subject", when(isTls, col("r.tls.subject")))
    set("tls.server.issuer", when(isTls, col("r.tls.issuerdn")))
    val subjKv = parseKeyValue(regexp_replace(col("r.tls.subject"), "\\\\,", ""), ", ", "=")
    val issKv = parseKeyValue(regexp_replace(col("r.tls.issuerdn"), "\\\\,", ""), ", ", "=")
    set("tls.server.x509.subject", kvStruct(subjKv))
    set("tls.server.x509.issuer", kvStruct(issKv))
    set("tls.server.x509.serial_number",
      when(isTls, regexp_replace(col("r.tls.serial"), ":", "")))
    val sha1 = upper(regexp_replace(col("r.tls.fingerprint"), ":", ""))
    set("tls.server.hash.sha1", when(isTls, sha1))
    set("tls.resumed", when(isTls, col("r.tls.session_resumed")))
    set("tls.server.ja3s", when(isTls, col("r.tls.ja3s.hash")))
    set("tls.client.ja3", when(isTls, col("r.tls.ja3.hash")))
    set("tls.server.not_after", when(isTls, normTs(col("r.tls.notafter"))))
    set("tls.server.not_before", when(isTls, normTs(col("r.tls.notbefore"))))

    // destination.domain: tls sni and/or http hostname (reference joins)
    val domains = filter(array(when(isTls, sni), col("r.http.hostname")), x => x.isNotNull)
    set("url.domain", when(g("network.protocol") === "http", try_element_at(domains, lit(1))))
    set("destination.domain", array_join(domains, ","))

    // ---- flow counters ------------------------------------------------
    set("source.packets", col("r.flow.pkts_toserver"))
    set("destination.packets", col("r.flow.pkts_toclient"))
    set("source.bytes", col("r.flow.bytes_toserver"))
    set("destination.bytes", col("r.flow.bytes_toclient"))

    set("file.path", col("r.fileinfo.filename"))
    set("file.size", col("r.fileinfo.size"))

    // vendor struct subset (post-normalization values)
    set("suricata.eve", struct(
      et.as("event_type"),
      col("r.flow_id").cast(StringType).as("flow_id"),
      appProto.as("app_proto"),
      col("r.alert").as("alert"),
      col("r.flow").as("flow")))

    set("related.ip", array_distinct(concat(
      filter(array(col("r.src_ip"), col("r.dest_ip")), x => x.isNotNull),
      g("dns.resolved_ip"))))
    set("related.hosts", filter(array(when(isTls, sni)), x => x.isNotNull))
    set("related.hash", filter(array(when(isTls, sha1)), x => x.isNotNull))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
