package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Zeek protocol/file/alert tables beyond conn/dns/http — each object
  * is one table mapping from the reference's
  * data/managed/log_sources/zeek/tables/<name>.yml, built over [[Zeek]]'s
  * shared preamble.
  */

/** ssh.log (reference zeek/tables/ssh.yml): auth outcome, negotiated
  * algorithms, client/server banners.
  */
object ZeekSsh {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("version", IntegerType),
    StructField("auth_success", BooleanType),
    StructField("auth_attempts", IntegerType),
    StructField("direction", StringType),
    StructField("client", StringType),
    StructField("server", StringType),
    StructField("cipher_alg", StringType),
    StructField("mac_alg", StringType),
    StructField("compression_alg", StringType),
    StructField("kex_alg", StringType),
    StructField("host_key_alg", StringType),
    StructField("host_key", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"), transport = Some("tcp"), protocol = Some("ssh"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.ssh", struct(
      col("r.version").as("version"),
      col("r.client").as("client"),
      col("r.server").as("server"),
      col("r.direction").as("direction"),
      col("r.host_key").as("host_key"),
      struct(
        col("r.auth_attempts").as("attempts"),
        col("r.auth_success").as("success")).as("auth"),
      struct(
        col("r.cipher_alg").as("cipher"),
        col("r.mac_alg").as("mac"),
        col("r.compression_alg").as("compression"),
        col("r.kex_alg").as("key_exchange"),
        col("r.host_key_alg").as("host_key")).as("algorithm")))
    set("event.outcome",
      when(col("r.auth_success") === true, "success")
        .when(col("r.auth_success") === false, "failure"))
    Zeek.finish(out)
  }
}

/** weird.log (zeek/tables/weird.yml): protocol anomalies; name → rule.name. */
object ZeekWeird {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("name", StringType),
    StructField("addl", StringType),
    StructField("notice", BooleanType),
    StructField("peer", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"), Seq("info"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.weird", struct(
      col("r.name").as("name"),
      col("r.addl").as("additional_info"),
      col("r.notice").as("notice"),
      col("r.peer").as("peer")))
    set("rule.name", col("r.name"))
    Zeek.finish(out)
  }
}

/** ntlm.log (zeek/tables/ntlm.yml): NTLM auth with server naming. */
object ZeekNtlm {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("hostname", StringType),
    StructField("domainname", StringType),
    StructField("username", StringType),
    StructField("server_nb_computer_name", StringType),
    StructField("server_dns_computer_name", StringType),
    StructField("server_tree_name", StringType),
    StructField("success", BooleanType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network", "authentication"),
      Seq("connection", "info"), transport = Some("tcp"), protocol = Some("ntlm"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.ntlm", struct(
      col("r.hostname").as("hostname"),
      col("r.username").as("username"),
      col("r.domainname").as("domain"),
      col("r.success").as("success"),
      struct(struct(
        col("r.server_dns_computer_name").as("dns"),
        col("r.server_nb_computer_name").as("netbios"),
        col("r.server_tree_name").as("tree")).as("name")).as("server")))
    set("user.name", col("r.username"))
    set("user.domain", col("r.domainname"))
    set("event.outcome",
      when(col("r.success") === true, "success")
        .when(col("r.success") === false, "failure"))
    set("related.user", filter(array(col("r.username")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** rdp.log (zeek/tables/rdp.yml): client/desktop/cert/encryption shaping. */
object ZeekRdp {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("cookie", StringType),
    StructField("result", StringType),
    StructField("security_protocol", StringType),
    StructField("client_build", StringType),
    StructField("client_name", StringType),
    StructField("client_dig_product_id", StringType),
    StructField("desktop_width", IntegerType),
    StructField("desktop_height", IntegerType),
    StructField("requested_color_depth", StringType),
    StructField("cert_type", StringType),
    StructField("cert_count", IntegerType),
    StructField("cert_permanent", BooleanType),
    StructField("encryption_level", StringType),
    StructField("encryption_method", StringType),
    StructField("ssl", BooleanType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("protocol", "info"), transport = Some("tcp"), protocol = Some("rdp"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.rdp", struct(
      col("r.cookie").as("cookie"),
      col("r.result").as("result"),
      col("r.security_protocol").as("security_protocol"),
      struct(
        col("r.client_build").as("build"),
        col("r.client_name").as("name"),
        col("r.client_dig_product_id").as("product_id")).as("client"),
      struct(
        col("r.desktop_width").as("width"),
        col("r.desktop_height").as("height"),
        col("r.requested_color_depth").as("color_depth")).as("desktop"),
      struct(
        col("r.cert_type").as("type"),
        col("r.cert_count").as("count"),
        col("r.cert_permanent").as("permanent")).as("cert"),
      struct(
        col("r.encryption_level").as("level"),
        col("r.encryption_method").as("method")).as("encryption")))
    set("tls.established", col("r.ssl"))
    Zeek.finish(out)
  }
}

/** smtp.log (zeek/tables/smtp.yml): mail envelope + TLS flag. */
object ZeekSmtp {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("trans_depth", IntegerType),
    StructField("helo", StringType),
    StructField("mailfrom", StringType),
    StructField("rcptto", ArrayType(StringType)),
    StructField("date", DoubleType),
    StructField("from", StringType),
    StructField("to", ArrayType(StringType)),
    StructField("cc", ArrayType(StringType)),
    StructField("reply_to", StringType),
    StructField("msg_id", StringType),
    StructField("in_reply_to", StringType),
    StructField("subject", StringType),
    StructField("x_originating_ip", StringType),
    StructField("first_received", StringType),
    StructField("second_received", StringType),
    StructField("last_reply", StringType),
    StructField("path", ArrayType(StringType)),
    StructField("user_agent", StringType),
    StructField("tls", BooleanType),
    StructField("fuids", ArrayType(StringType)),
    StructField("is_webmail", BooleanType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"), transport = Some("tcp"), protocol = Some("smtp"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.smtp", struct(
      col("r.trans_depth").as("transaction_depth"),
      col("r.helo").as("helo"),
      col("r.mailfrom").as("mail_from"),
      col("r.rcptto").as("rcpt_to"),
      timestamp_seconds(col("r.date")).as("date"),
      col("r.from").as("from"),
      col("r.to").as("to"),
      col("r.cc").as("cc"),
      col("r.reply_to").as("reply_to"),
      col("r.msg_id").as("msg_id"),
      col("r.in_reply_to").as("in_reply_to"),
      col("r.subject").as("subject"),
      col("r.x_originating_ip").as("x_originating_ip"),
      col("r.first_received").as("first_received"),
      col("r.second_received").as("second_received"),
      col("r.last_reply").as("last_reply"),
      col("r.path").as("path"),
      col("r.user_agent").as("user_agent"),
      col("r.fuids").as("fuids"),
      col("r.is_webmail").as("is_webmail")))
    set("tls.established", col("r.tls"))
    Zeek.finish(out)
  }
}

/** notice.log (zeek/tables/notice.yml): Zeek's own alerting stream —
  * event.kind=alert, note/msg → rule, src/dst fallbacks for the endpoints,
  * dropped → allowed/denied event.type.
  */
object ZeekNotice {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("fuid", StringType),
    StructField("file_mime_type", StringType),
    StructField("file_desc", StringType),
    StructField("proto", StringType),
    StructField("note", StringType),
    StructField("msg", StringType),
    StructField("sub", StringType),
    StructField("src", StringType),
    StructField("dst", StringType),
    StructField("p", IntegerType),
    StructField("n", IntegerType),
    StructField("peer_descr", StringType),
    StructField("actions", ArrayType(StringType)),
    StructField("suppress_for", DoubleType),
    StructField("dropped", BooleanType),
    StructField("f.id", StringType),
    StructField("f.parent_id", StringType),
    StructField("f.source", StringType),
    StructField("f.is_orig", BooleanType),
    StructField("f.seen_bytes", LongType),
    StructField("f.total_bytes", LongType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "alert", Seq("intrusion_detection"), Seq("info"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    // conn-less notices carry src/dst/p instead of the id.* 4-tuple
    val srcAddr = coalesce(Zeek.r("id.orig_h"), col("r.src"))
    val dstAddr = coalesce(Zeek.r("id.resp_h"), col("r.dst"))
    set("source.address", srcAddr)
    set("source.ip", srcAddr)
    set("destination.address", dstAddr)
    set("destination.ip", dstAddr)
    set("destination.port", coalesce(Zeek.r("id.resp_p"), col("r.p")))
    set("network.transport", col("r.proto"))
    set("related.ip", array_distinct(filter(array(srcAddr, dstAddr), x => x.isNotNull)))
    set("rule.name", col("r.note"))
    set("rule.description", col("r.msg"))
    set("file.size", Zeek.r("f.total_bytes"))
    set("file.mime_type", col("r.file_mime_type"))
    set("event.type",
      when(col("r.dropped") === false, array(lit("info"), lit("allowed")))
        .when(col("r.dropped") === true, array(lit("info"), lit("denied")))
        .otherwise(array(lit("info"))))
    set("zeek.notice", struct(
      col("r.note").as("note"),
      col("r.msg").as("msg"),
      col("r.sub").as("sub"),
      col("r.n").as("n"),
      col("r.peer_descr").as("peer_descr"),
      col("r.actions").as("actions"),
      col("r.suppress_for").as("suppress_for"),
      col("r.dropped").as("dropped"),
      col("r.fuid").as("fuid"),
      struct(
        Zeek.r("f.id").as("id"),
        Zeek.r("f.parent_id").as("parent_id"),
        Zeek.r("f.source").as("source"),
        Zeek.r("f.is_orig").as("is_orig"),
        Zeek.r("f.seen_bytes").as("seen_bytes"),
        Zeek.r("f.total_bytes").as("total_bytes"),
        col("r.file_mime_type").as("mime_type")).as("file")))
    Zeek.finish(out)
  }
}

/** files.log (zeek/tables/files.yml): no conn 4-tuple; tx/rx host arrays →
  * server/client ip, hashes → file.hash + related.hash, conn_uids[0] →
  * session id.
  */
object ZeekFiles {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("fuid", StringType),
    StructField("tx_hosts", ArrayType(StringType)),
    StructField("rx_hosts", ArrayType(StringType)),
    StructField("conn_uids", ArrayType(StringType)),
    StructField("source", StringType),
    StructField("depth", IntegerType),
    StructField("analyzers", ArrayType(StringType)),
    StructField("mime_type", StringType),
    StructField("filename", StringType),
    StructField("duration", DoubleType),
    StructField("local_orig", BooleanType),
    StructField("is_orig", BooleanType),
    StructField("seen_bytes", LongType),
    StructField("total_bytes", LongType),
    StructField("missing_bytes", LongType),
    StructField("overflow_bytes", LongType),
    StructField("timedout", BooleanType),
    StructField("md5", StringType),
    StructField("sha1", StringType),
    StructField("sha256", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val empty = array().cast(ArrayType(StringType))
    val tx = coalesce(col("r.tx_hosts"), empty)
    val rx = coalesce(col("r.rx_hosts"), empty)
    set("event.kind", lit("event"))
    set("event.category", array(lit("file")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("file", struct(
      col("r.filename").as("name"),
      col("r.total_bytes").as("size"),
      col("r.mime_type").as("mime_type"),
      struct(
        col("r.md5").as("md5"),
        col("r.sha1").as("sha1"),
        col("r.sha256").as("sha256")).as("hash")))
    set("zeek.session_id", element_at(col("r.conn_uids"), 1))
    set("event.id", element_at(col("r.conn_uids"), 1))
    set("server.ip", element_at(tx, 1))
    set("client.ip", element_at(rx, 1))
    set("zeek.files", struct(
      col("r.fuid").as("fuid"),
      col("r.conn_uids").as("session_ids"),
      element_at(tx, 1).as("tx_host"),
      element_at(rx, 1).as("rx_host"),
      col("r.source").as("source"),
      col("r.depth").as("depth"),
      col("r.analyzers").as("analyzers"),
      col("r.mime_type").as("mime_type"),
      col("r.duration").as("duration"),
      col("r.local_orig").as("local_orig"),
      col("r.is_orig").as("is_orig"),
      col("r.seen_bytes").as("seen_bytes"),
      col("r.total_bytes").as("total_bytes"),
      col("r.missing_bytes").as("missing_bytes"),
      col("r.overflow_bytes").as("overflow_bytes"),
      col("r.timedout").as("timedout")))
    set("related.ip", array_distinct(concat(tx, rx)))
    set("related.hash", filter(
      array(col("r.md5"), col("r.sha1"), col("r.sha256")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** kerberos.log (zeek/tables/kerberos.yml): ticket requests — user/domain
  * split from `client`, validity window with day count, client/server cert
  * DNs parsed into tls.*.x509 subjects.
  */
object ZeekKerberos {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("request_type", StringType),
    StructField("client", StringType),
    StructField("service", StringType),
    StructField("success", BooleanType),
    StructField("error_code", IntegerType),
    StructField("error_msg", StringType),
    StructField("from", DoubleType),
    StructField("till", DoubleType),
    StructField("cipher", StringType),
    StructField("forwardable", BooleanType),
    StructField("renewable", BooleanType),
    StructField("auth_ticket", StringType),
    StructField("new_ticket", StringType),
    StructField("cert.client", StringType),
    StructField("cert.client_subject", StringType),
    StructField("cert.client_fuid", StringType),
    StructField("cert.server", StringType),
    StructField("cert.server_subject", StringType),
    StructField("cert.server_fuid", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network", "authentication"),
      Seq("connection", "protocol", "access"),
      transport = Some("tcp"), protocol = Some("kerberos"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("client.address", Zeek.r("id.orig_h"))
    set("server.address", Zeek.r("id.resp_h"))
    set("event.action", col("r.request_type"))

    val parts = split(col("r.client"), "/")
    val userName = when(size(parts) === 2, element_at(parts, 1))
    val userDomain = when(size(parts) === 2, element_at(parts, 2))
    set("user.name", userName)
    set("user.domain", userDomain)
    set("related.user", filter(array(userName), x => x.isNotNull))

    val validDays = when(col("r.from").isNotNull && col("r.till").isNotNull,
      round((col("r.till") - col("r.from")) / 86400d).cast(LongType))
    // staged: dnMap fans out into many component fields (see ZeekSsl)
    out = out
      .withColumn("__dn_c", Zeek.dnMap(Zeek.r("cert.client_subject")))
      .withColumn("__dn_s", Zeek.dnMap(Zeek.r("cert.server_subject")))
    val clientDn = col("__dn_c")
    val serverDn = col("__dn_s")
    set("zeek.kerberos", struct(
      col("r.request_type").as("request_type"),
      col("r.client").as("client"),
      col("r.service").as("service"),
      col("r.success").as("success"),
      col("r.cipher").as("cipher"),
      col("r.forwardable").as("forwardable"),
      col("r.renewable").as("renewable"),
      struct(
        timestamp_seconds(col("r.from")).as("from"),
        timestamp_seconds(col("r.till")).as("until"),
        validDays.as("days")).as("valid"),
      struct(
        col("r.error_code").as("code"),
        col("r.error_msg").as("msg")).as("error"),
      struct(
        col("r.auth_ticket").as("auth"),
        col("r.new_ticket").as("new")).as("ticket"),
      struct(
        struct(
          Zeek.r("cert.client").as("value"),
          Zeek.r("cert.client_subject").as("subject"),
          Zeek.r("cert.client_fuid").as("fuid")).as("client"),
        struct(
          Zeek.r("cert.server").as("value"),
          Zeek.r("cert.server_subject").as("subject"),
          Zeek.r("cert.server_fuid").as("fuid")).as("server")).as("cert")))
    set("tls.client.x509.subject", Zeek.x509Dn(clientDn))
    set("tls.server.x509.subject", Zeek.x509Dn(serverDn))
    set("event.outcome",
      when(col("r.success") === true, "success")
        .when(col("r.success") === false, "failure"))
    Zeek.finish(out.drop("__dn_c", "__dn_s"))
  }
}
