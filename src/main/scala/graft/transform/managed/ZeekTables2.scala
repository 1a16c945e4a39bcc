package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Zeek protocol tables, batch 2 (reference
  * data/managed/log_sources/zeek/tables/&lt;name&gt;.yml): the connection-oriented
  * protocol logs. Each object is one table mapping over [[Zeek]]'s shared
  * preamble.
  */

/** dce_rpc.log (zeek/tables/dce_rpc.yml): MSRPC operations. */
object ZeekDceRpc {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("rtt", DoubleType),
    StructField("named_pipe", StringType),
    StructField("endpoint", StringType),
    StructField("operation", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol", "info"),
      transport = Some("tcp"), protocol = Some("dce_rpc"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.dce_rpc", struct(
      col("r.rtt").as("rtt"),
      col("r.named_pipe").as("named_pipe"),
      col("r.endpoint").as("endpoint"),
      col("r.operation").as("operation")))
    set("event.action", col("r.operation"))
    Zeek.finish(out)
  }
}

/** tunnel.log (zeek/tables/tunnel.yml): encapsulation open/close events. */
object ZeekTunnel {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("tunnel_type", StringType),
    StructField("action", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"), Seq("connection"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.tunnel", struct(
      col("r.tunnel_type").as("type"),
      col("r.action").as("action")))
    set("event.action", col("r.action"))
    Zeek.finish(out)
  }
}

/** dpd.log (zeek/tables/dpd.yml): dynamic protocol detection failures. */
object ZeekDpd {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("proto", StringType),
    StructField("analyzer", StringType),
    StructField("failure_reason", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "info"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("network.transport", col("r.proto"))
    set("zeek.dpd", struct(
      col("r.analyzer").as("analyzer"),
      col("r.failure_reason").as("failure_reason")))
    Zeek.finish(out)
  }
}

/** ftp.log (zeek/tables/ftp.yml): commands, replies, data channel. */
object ZeekFtp {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("user", StringType),
    StructField("password", StringType),
    StructField("command", StringType),
    StructField("arg", StringType),
    StructField("mime_type", StringType),
    StructField("file_size", LongType),
    StructField("reply_code", IntegerType),
    StructField("reply_msg", StringType),
    StructField("data_channel.passive", BooleanType),
    StructField("data_channel.orig_h", StringType),
    StructField("data_channel.resp_h", StringType),
    StructField("data_channel.resp_p", IntegerType),
    StructField("fuid", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol", "info"),
      transport = Some("tcp"), protocol = Some("ftp"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("user.name", col("r.user"))
    set("event.action", col("r.command"))
    set("file.size", col("r.file_size"))
    set("file.mime_type", col("r.mime_type"))
    set("zeek.ftp", struct(
      col("r.user").as("user"),
      col("r.password").as("password"),
      col("r.command").as("command"),
      col("r.arg").as("arg"),
      col("r.mime_type").as("mime_type"),
      col("r.file_size").as("file_size"),
      struct(
        col("r.reply_code").as("code"),
        col("r.reply_msg").as("msg")).as("reply"),
      struct(
        Zeek.r("data_channel.passive").as("passive"),
        Zeek.r("data_channel.orig_h").as("originating_host"),
        Zeek.r("data_channel.resp_h").as("response_host"),
        Zeek.r("data_channel.resp_p").as("response_port")).as("data_channel"),
      struct(col("r.fuid").as("uid")).as("file")))
    set("related.user", filter(array(col("r.user")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** sip.log (zeek/tables/sip.yml): SIP transactions with request/response
  * shaping and status-derived outcome.
  */
object ZeekSip {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("trans_depth", IntegerType),
    StructField("method", StringType),
    StructField("uri", StringType),
    StructField("date", StringType),
    StructField("request_from", StringType),
    StructField("request_to", StringType),
    StructField("response_from", StringType),
    StructField("response_to", StringType),
    StructField("reply_to", StringType),
    StructField("call_id", StringType),
    StructField("seq", StringType),
    StructField("subject", StringType),
    StructField("request_path", ArrayType(StringType)),
    StructField("response_path", ArrayType(StringType)),
    StructField("user_agent", StringType),
    StructField("status_code", IntegerType),
    StructField("status_msg", StringType),
    StructField("warning", StringType),
    StructField("request_body_len", LongType),
    StructField("response_body_len", LongType),
    StructField("content_type", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"),
      transport = Some("udp"), protocol = Some("sip"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.sip", struct(
      col("r.trans_depth").as("transaction_depth"),
      struct(
        col("r.method").as("method"),
        regexp_extract(col("r.seq"), "(\\d+)", 1).as("number")).as("sequence"),
      col("r.uri").as("uri"),
      col("r.date").as("date"),
      struct(
        col("r.request_from").as("from"),
        col("r.request_to").as("to"),
        col("r.request_path").as("path"),
        col("r.request_body_len").as("body_length")).as("request"),
      struct(
        col("r.response_from").as("from"),
        col("r.response_to").as("to"),
        col("r.response_path").as("path"),
        col("r.response_body_len").as("body_length")).as("response"),
      col("r.reply_to").as("reply_to"),
      col("r.call_id").as("call_id"),
      col("r.subject").as("subject"),
      col("r.user_agent").as("user_agent"),
      struct(
        col("r.status_code").as("code"),
        col("r.status_msg").as("msg")).as("status"),
      col("r.warning").as("warning"),
      col("r.content_type").as("content_type")))
    set("event.action", col("r.method"))
    set("url.full", col("r.uri"))
    set("event.outcome",
      when(col("r.status_code") < 400, "success")
        .when(col("r.status_code") >= 400, "failure"))
    set("event.type",
      when(col("r.status_code") >= 400,
        array(lit("connection"), lit("protocol"), lit("error")))
        .otherwise(array(lit("connection"), lit("protocol"))))
    Zeek.finish(out)
  }
}

/** snmp.log (zeek/tables/snmp.yml): per-session PDU counters. */
object ZeekSnmp {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("duration", DoubleType),
    StructField("version", StringType),
    StructField("community", StringType),
    StructField("get_requests", IntegerType),
    StructField("get_bulk_requests", IntegerType),
    StructField("get_responses", IntegerType),
    StructField("set_requests", IntegerType),
    StructField("display_string", StringType),
    StructField("up_since", DoubleType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"),
      transport = Some("udp"), protocol = Some("snmp"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.snmp", struct(
      col("r.duration").as("duration"),
      col("r.version").as("version"),
      col("r.community").as("community"),
      struct(
        col("r.get_requests").as("requests"),
        col("r.get_bulk_requests").as("bulk_requests"),
        col("r.get_responses").as("responses")).as("get"),
      struct(col("r.set_requests").as("requests")).as("set"),
      col("r.display_string").as("display_string"),
      timestamp_seconds(col("r.up_since")).as("up_since")))
    Zeek.finish(out)
  }
}

/** socks.log (zeek/tables/socks.yml): proxy requests with outcome. */
object ZeekSocks {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("version", IntegerType),
    StructField("user", StringType),
    StructField("password", StringType),
    StructField("status", StringType),
    StructField("request.host", StringType),
    StructField("request.name", StringType),
    StructField("request_p", IntegerType),
    StructField("bound.host", StringType),
    StructField("bound.name", StringType),
    StructField("bound_p", IntegerType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"),
      transport = Some("tcp"), protocol = Some("socks"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("user.name", col("r.user"))
    set("zeek.socks", struct(
      col("r.version").as("version"),
      col("r.user").as("user"),
      col("r.password").as("password"),
      col("r.status").as("status"),
      struct(
        coalesce(Zeek.r("request.host"), Zeek.r("request.name")).as("host"),
        col("r.request_p").as("port")).as("request"),
      struct(
        Zeek.r("bound.host").as("host"),
        col("r.bound_p").as("port")).as("bound")))
    set("related.user", filter(array(col("r.user")), x => x.isNotNull))
    set("event.outcome",
      when(col("r.status") === "succeeded", "success")
        .when(col("r.status").isNotNull, "failure"))
    set("event.type",
      when(col("r.status").isNotNull && col("r.status") =!= "succeeded",
        array(lit("connection"), lit("protocol"), lit("error")))
        .otherwise(array(lit("connection"), lit("protocol"))))
    Zeek.finish(out)
  }
}

/** mysql.log (zeek/tables/mysql.yml): commands with the reference's
  * cmd → event.type taxonomy (access/change/start/end/info + session).
  */
object ZeekMysql {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("cmd", StringType),
    StructField("arg", StringType),
    StructField("success", BooleanType),
    StructField("rows", IntegerType),
    StructField("response", StringType))

  private val changeCmds =
    Seq("init_db", "change_user", "set_option", "drop_db", "create_db",
      "process_kill", "delayed_insert")

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network", "database"),
      Seq("connection", "protocol"),
      transport = Some("tcp"), protocol = Some("mysql"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val cmd = col("r.cmd")
    val isConnect = cmd === "connect" || cmd === "connect_out"
    val isChange = cmd.isin(changeCmds: _*)
    val base = array(lit("connection"), lit("protocol"))
    set("zeek.mysql", struct(
      cmd.as("cmd"),
      col("r.arg").as("arg"),
      col("r.success").as("success"),
      col("r.rows").as("rows"),
      col("r.response").as("response")))
    set("event.action", cmd)
    set("event.outcome",
      when(col("r.success") === true, "success")
        .when(col("r.success") === false, "failure"))
    set("event.type",
      when(cmd.isNull, base)
        .when(cmd === "connect", concat(base, array(lit("access"), lit("start"))))
        .when(cmd === "connect_out", concat(base, array(lit("access"), lit("end"))))
        .when(isChange, concat(base, array(lit("change"))))
        .otherwise(concat(base, array(lit("info")))))
    set("event.category",
      when(isConnect, array(lit("network"), lit("database"), lit("session")))
        .otherwise(array(lit("network"), lit("database"))))
    Zeek.finish(out)
  }
}

/** ntp.log (zeek/tables/ntp.yml): clock sync with epoch-time fields. */
object ZeekNtp {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("version", IntegerType),
    StructField("mode", IntegerType),
    StructField("stratum", IntegerType),
    StructField("poll", DoubleType),
    StructField("precision", DoubleType),
    StructField("root_delay", DoubleType),
    StructField("root_disp", DoubleType),
    StructField("ref_id", StringType),
    StructField("ref_time", DoubleType),
    StructField("org_time", DoubleType),
    StructField("rec_time", DoubleType),
    StructField("xmt_time", DoubleType),
    StructField("num_exts", IntegerType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol", "info"),
      transport = Some("udp"), protocol = Some("ntp"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("network.type",
      when(graft.functions.NetFunctions.isIpv6(Zeek.r("id.orig_h")), "ipv6")
        .otherwise("ipv4"))
    set("zeek.ntp", struct(
      col("r.version").as("version"),
      col("r.mode").as("mode"),
      col("r.stratum").as("stratum"),
      col("r.poll").as("poll"),
      col("r.precision").as("precision"),
      col("r.root_delay").as("root_delay"),
      col("r.root_disp").as("root_disp"),
      col("r.ref_id").as("ref_id"),
      timestamp_seconds(col("r.ref_time")).as("ref_time"),
      timestamp_seconds(col("r.org_time")).as("org_time"),
      timestamp_seconds(col("r.rec_time")).as("rec_time"),
      timestamp_seconds(col("r.xmt_time")).as("xmt_time"),
      col("r.num_exts").as("num_extensions")))
    Zeek.finish(out)
  }
}

/** radius.log (zeek/tables/radius.yml): auth with result → outcome. */
object ZeekRadius {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("username", StringType),
    StructField("mac", StringType),
    StructField("framed_addr", StringType),
    StructField("tunnel_client", StringType),
    StructField("connect_info", StringType),
    StructField("reply_msg", StringType),
    StructField("result", StringType),
    StructField("ttl", DoubleType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network", "authentication"),
      Seq("connection", "info"),
      transport = Some("udp"), protocol = Some("radius"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("user.name", col("r.username"))
    set("event.outcome", col("r.result"))
    set("zeek.radius", struct(
      col("r.username").as("username"),
      col("r.mac").as("mac"),
      col("r.framed_addr").as("framed_address"),
      col("r.tunnel_client").as("tunnel_client"),
      col("r.connect_info").as("connect_info"),
      col("r.reply_msg").as("reply_msg"),
      col("r.result").as("result"),
      col("r.ttl").as("ttl")))
    set("related.user", filter(array(col("r.username")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** rfb.log (zeek/tables/rfb.yml): VNC sessions with version/auth nesting. */
object ZeekRfb {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("client_major_version", StringType),
    StructField("client_minor_version", StringType),
    StructField("server_major_version", StringType),
    StructField("server_minor_version", StringType),
    StructField("authentication_method", StringType),
    StructField("auth", BooleanType),
    StructField("share_flag", BooleanType),
    StructField("desktop_name", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "info"),
      transport = Some("tcp"), protocol = Some("rfb"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.rfb", struct(
      struct(
        struct(
          col("r.client_major_version").as("major"),
          col("r.client_minor_version").as("minor")).as("client"),
        struct(
          col("r.server_major_version").as("major"),
          col("r.server_minor_version").as("minor")).as("server")).as("version"),
      struct(
        col("r.auth").as("success"),
        col("r.authentication_method").as("method")).as("auth"),
      col("r.share_flag").as("share_flag"),
      col("r.desktop_name").as("desktop_name"),
      col("r.width").as("width"),
      col("r.height").as("height")))
    Zeek.finish(out)
  }
}

/** irc.log (zeek/tables/irc.yml): commands and DCC file transfer fields. */
object ZeekIrc {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("nick", StringType),
    StructField("user", StringType),
    StructField("command", StringType),
    StructField("value", StringType),
    StructField("addl", StringType),
    StructField("dcc_file_name", StringType),
    StructField("dcc_file_size", LongType),
    StructField("dcc_mime_type", StringType),
    StructField("fuid", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol", "info"),
      transport = Some("tcp"), protocol = Some("irc"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("user.name", col("r.user"))
    set("event.action", col("r.command"))
    set("file.name", col("r.dcc_file_name"))
    set("file.size", col("r.dcc_file_size"))
    set("file.mime_type", col("r.dcc_mime_type"))
    set("zeek.irc", struct(
      col("r.nick").as("nick"),
      col("r.command").as("command"),
      col("r.value").as("value"),
      col("r.addl").as("additional_info"),
      struct(
        struct(
          col("r.dcc_file_name").as("name"),
          col("r.dcc_file_size").as("size")).as("file"),
        col("r.dcc_mime_type").as("mime_type")).as("dcc"),
      struct(col("r.fuid").as("uid")).as("file")))
    set("related.user", filter(array(col("r.user")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** modbus.log (zeek/tables/modbus.yml): ICS function calls. */
object ZeekModbus {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("func", StringType),
    StructField("exception", StringType),
    StructField("track_address", IntegerType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"),
      transport = Some("tcp"), protocol = Some("modbus"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.modbus", struct(
      col("r.func").as("function"),
      col("r.exception").as("exception"),
      col("r.track_address").as("track_address")))
    set("event.action", when(Zeek.r("id.orig_h").isNotNull, col("r.func")))
    set("event.outcome",
      when(col("r.exception").isNotNull, "failure").otherwise("success"))
    Zeek.finish(out)
  }
}

/** dnp3.log (zeek/tables/dnp3.yml): SCADA requests/replies. */
object ZeekDnp3 {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("fc_request", StringType),
    StructField("fc_reply", StringType),
    StructField("iin", IntegerType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol", "info"),
      transport = Some("tcp"), protocol = Some("dnp3"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.dnp3", struct(
      struct(
        col("r.fc_request").as("request"),
        col("r.fc_reply").as("reply")).as("function"),
      col("r.iin").as("id")))
    set("event.action",
      lower(coalesce(col("r.fc_reply"), col("r.fc_request"))))
    Zeek.finish(out)
  }
}

/** syslog.log (zeek/tables/syslog.yml): tunneled syslog messages. */
object ZeekSyslog {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("proto", StringType),
    StructField("facility", StringType),
    StructField("severity", StringType),
    StructField("message", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"), Seq("info"),
      protocol = Some("syslog"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("network.transport", col("r.proto"))
    set("zeek.syslog", struct(
      col("r.facility").as("facility"),
      col("r.severity").as("severity"),
      col("r.message").as("msg")))
    set("message", col("r.message"))
    set("log.syslog", struct(
      struct(col("r.facility").as("name")).as("facility"),
      struct(col("r.severity").as("name")).as("severity")))
    Zeek.finish(out)
  }
}

/** traceroute.log (zeek/tables/traceroute.yml): detected traceroutes
  * (src/dst, no conn 4-tuple).
  */
object ZeekTraceroute {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("src", StringType),
    StructField("dst", StringType),
    StructField("proto", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("network")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("source.address", col("r.src"))
    set("source.ip", col("r.src"))
    set("destination.address", col("r.dst"))
    set("destination.ip", col("r.dst"))
    set("network.transport", col("r.proto"))
    set("related.ip", array_distinct(
      filter(array(col("r.src"), col("r.dst")), x => x.isNotNull)))
    Zeek.finish(out)
  }
}

/** dhcp.log (zeek/tables/dhcp.yml): lease activity — no conn 4-tuple;
  * uids array, client/server addresses with the reference's 68/67
  * port defaults.
  */
object ZeekDhcp {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("uids", ArrayType(StringType)),
    StructField("client_addr", StringType),
    StructField("server_addr", StringType),
    StructField("client_port", IntegerType),
    StructField("server_port", IntegerType),
    StructField("mac", StringType),
    StructField("host_name", StringType),
    StructField("client_fqdn", StringType),
    StructField("domain", StringType),
    StructField("requested_addr", StringType),
    StructField("assigned_addr", StringType),
    StructField("lease_time", DoubleType),
    StructField("client_message", StringType),
    StructField("server_message", StringType),
    StructField("msg_types", ArrayType(StringType)),
    StructField("msg_orig", ArrayType(StringType)),
    StructField("duration", DoubleType),
    StructField("client_software", StringType),
    StructField("server_software", StringType),
    StructField("circuit_id", StringType),
    StructField("agent_remote_id", StringType),
    StructField("subscriber_id", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("network")))
    set("event.type", array(lit("connection"), lit("protocol"), lit("info")))
    set("network.transport", lit("udp"))
    set("network.protocol", lit("dhcp"))
    set("network.name", col("r.domain"))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.session_ids", col("r.uids"))
    set("event.id", array_join(col("r.uids"), ","))
    set("source.port", coalesce(col("r.client_port"), lit(68)))
    set("destination.port", coalesce(col("r.server_port"), lit(67)))
    set("source.address", col("r.client_addr"))
    set("source.ip", col("r.client_addr"))
    set("client.address", col("r.client_addr"))
    set("destination.address", col("r.server_addr"))
    set("destination.ip", col("r.server_addr"))
    set("server.address", col("r.server_addr"))
    set("zeek.dhcp", struct(
      struct(
        col("r.assigned_addr").as("assigned"),
        col("r.client_addr").as("client"),
        col("r.mac").as("mac"),
        col("r.requested_addr").as("requested"),
        col("r.server_addr").as("server")).as("address"),
      col("r.host_name").as("hostname"),
      col("r.client_fqdn").as("client_fqdn"),
      col("r.domain").as("domain"),
      col("r.lease_time").as("lease_time"),
      col("r.duration").as("duration"),
      struct(
        col("r.client_message").as("client"),
        col("r.server_message").as("server"),
        col("r.msg_types").as("types"),
        col("r.msg_orig").as("origin")).as("msg"),
      struct(
        col("r.client_software").as("client"),
        col("r.server_software").as("server")).as("software"),
      struct(
        col("r.circuit_id").as("circuit"),
        col("r.agent_remote_id").as("remote_agent"),
        col("r.subscriber_id").as("subscriber")).as("id")))
    set("related.ip", array_distinct(filter(
      array(col("r.client_addr"), col("r.server_addr")), x => x.isNotNull)))
    Zeek.finish(out)
  }
}
