package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Zeek ssl.log mapping (reference
  * data/managed/log_sources/zeek/tables/ssl.yml): TLS handshake records →
  * ECS tls.* — version string split into version/version_protocol,
  * server/client cert DNs parsed into x509 component arrays, ja3/ja3s into
  * related.hash, validity window timestamps.
  */
object ZeekSsl {

  val rawSchema: StructType = Zeek.connSchema(
    StructField("version", StringType),
    StructField("cipher", StringType),
    StructField("curve", StringType),
    StructField("server_name", StringType),
    StructField("resumed", BooleanType),
    StructField("last_alert", StringType),
    StructField("next_protocol", StringType),
    StructField("established", BooleanType),
    StructField("cert_chain", StringType),
    StructField("cert_chain_fuids", ArrayType(StringType)),
    StructField("client_cert_chain", StringType),
    StructField("client_cert_chain_fuids", ArrayType(StringType)),
    StructField("subject", StringType),
    StructField("issuer", StringType),
    StructField("client_subject", StringType),
    StructField("client_issuer", StringType),
    StructField("validation_status", StringType),
    StructField("validation_code", StringType),
    StructField("ja3", StringType),
    StructField("ja3s", StringType),
    StructField("resp_certificate_sha1", StringType),
    StructField("not_valid_before", DoubleType),
    StructField("not_valid_after", DoubleType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"), transport = Some("tcp"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("client.address", Zeek.r("id.orig_h"))
    set("server.address", Zeek.r("id.resp_h"))

    // "TLSv12" → 1.2/tls; "SSLv3" → 3.0/ssl (the reference's split-on-"v")
    val parts = split(col("r.version"), "v")
    val hasTwo = size(parts) === 2
    val proto = element_at(parts, 1)
    val num = element_at(parts, 2)
    set("tls.version", when(hasTwo,
      when(proto === "SSL", concat(num, lit(".0")))
        .otherwise(concat(num.substr(lit(1), lit(1)), lit("."), num.substr(lit(2), length(num) - 1)))))
    set("tls.version_protocol", when(hasTwo, lower(proto)))

    set("tls.cipher", col("r.cipher"))
    set("tls.curve", col("r.curve"))
    set("tls.established", col("r.established"))
    set("tls.resumed", col("r.resumed"))
    set("tls.server.issuer", col("r.issuer"))
    set("tls.server.subject", col("r.subject"))
    set("tls.server.hash.sha1", upper(col("r.resp_certificate_sha1")))
    set("tls.server.not_before", timestamp_seconds(col("r.not_valid_before")))
    set("tls.server.not_after", timestamp_seconds(col("r.not_valid_after")))
    set("tls.server.ja3s", col("r.ja3s"))
    set("tls.client.issuer", col("r.client_issuer"))
    set("tls.client.ja3", col("r.ja3"))

    // Stage each parsed DN map as its OWN column before fanning out into
    // the 12 component fields below: dnMap is a split+dedup-fold chain, and
    // inlining it per element_at would re-evaluate it per component
    // (CollapseProject only re-inlines cheap expressions, so a staged
    // column is computed once per row).
    out = out
      .withColumn("__dn_si", Zeek.dnMap(col("r.issuer")))
      .withColumn("__dn_ss", Zeek.dnMap(col("r.subject")))
      .withColumn("__dn_ci", Zeek.dnMap(col("r.client_issuer")))
      .withColumn("__dn_cs", Zeek.dnMap(col("r.client_subject")))
    val serverIssuer = col("__dn_si")
    val serverSubject = col("__dn_ss")
    val clientIssuer = col("__dn_ci")
    val clientSubject = col("__dn_cs")
    set("tls.server.x509.issuer", Zeek.x509Dn(serverIssuer))
    set("tls.server.x509.subject", Zeek.x509Dn(serverSubject))
    set("tls.client.x509.issuer", Zeek.x509Dn(clientIssuer))
    set("tls.client.x509.subject", Zeek.x509Dn(clientSubject))

    set("zeek.ssl", struct(
      col("r.version").as("version"),
      col("r.cipher").as("cipher"),
      col("r.curve").as("curve"),
      col("r.resumed").as("resumed"),
      col("r.next_protocol").as("next_protocol"),
      col("r.established").as("established"),
      col("r.last_alert").as("last_alert"),
      struct(
        col("r.validation_status").as("status"),
        col("r.validation_code").as("code")).as("validation"),
      struct(
        col("r.server_name").as("name"),
        col("r.cert_chain").as("cert_chain"),
        col("r.cert_chain_fuids").as("cert_chain_fuids"),
        Zeek.dnStruct(serverIssuer).as("issuer"),
        Zeek.dnStruct(serverSubject).as("subject")).as("server"),
      struct(
        col("r.client_cert_chain").as("cert_chain"),
        col("r.client_cert_chain_fuids").as("cert_chain_fuids"),
        Zeek.dnStruct(clientIssuer).as("issuer"),
        Zeek.dnStruct(clientSubject).as("subject")).as("client")))

    // ja3s pushed before ja3, as the reference does
    set("related.hash", filter(array(col("r.ja3s"), col("r.ja3")), x => x.isNotNull))
    Zeek.finish(out.drop("__dn_si", "__dn_ss", "__dn_ci", "__dn_cs"))
  }
}
