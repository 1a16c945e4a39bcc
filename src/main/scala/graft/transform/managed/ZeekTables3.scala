package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Zeek tables, batch 3 (reference
  * data/managed/log_sources/zeek/tables/&lt;name&gt;.yml): SMB, certificate,
  * file-analysis, intel, and host-state logs.
  */

/** smb_cmd.log (zeek/tables/smb_cmd.yml): SMB commands with the
  * referenced-file fields lifted into zeek.smb_cmd.file.
  */
object ZeekSmbCmd {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("command", StringType),
    StructField("sub_command", StringType),
    StructField("argument", StringType),
    StructField("status", StringType),
    StructField("rtt", DoubleType),
    StructField("version", StringType),
    StructField("username", StringType),
    StructField("tree", StringType),
    StructField("tree_service", StringType),
    StructField("referenced_file.uid", StringType),
    StructField("referenced_file.id.orig_h", StringType),
    StructField("referenced_file.id.resp_h", StringType),
    StructField("referenced_file.action", StringType),
    StructField("referenced_file.name", StringType),
    StructField("referenced_file.path", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"),
      transport = Some("tcp"), protocol = Some("smb"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.action", col("r.command"))
    set("user.name", col("r.username"))
    // referenced-file conn fields only survive when an action is present
    // (the reference drops the uid/hosts otherwise)
    val hasAction = Zeek.r("referenced_file.action").isNotNull
    set("zeek.smb_cmd", struct(
      col("r.command").as("command"),
      col("r.sub_command").as("sub_command"),
      col("r.argument").as("argument"),
      col("r.status").as("status"),
      col("r.rtt").as("rtt"),
      col("r.version").as("version"),
      col("r.username").as("username"),
      col("r.tree").as("tree"),
      col("r.tree_service").as("tree_service"),
      struct(
        when(hasAction, Zeek.r("referenced_file.uid")).as("uid"),
        struct(
          when(hasAction, Zeek.r("referenced_file.id.orig_h")).as("tx"),
          when(hasAction, Zeek.r("referenced_file.id.resp_h")).as("rx")).as("host"),
        Zeek.r("referenced_file.name").as("name"),
        Zeek.r("referenced_file.path").as("path"),
        Zeek.r("referenced_file.action").as("action")).as("file")))
    set("related.user", filter(array(col("r.username")), x => x.isNotNull))
    set("event.outcome",
      when(lower(col("r.status")) === "success", "success")
        .when(col("r.status").isNotNull, "failure"))
    set("event.type",
      when(col("r.status").isNotNull && lower(col("r.status")) =!= "success",
        array(lit("connection"), lit("protocol"), lit("error")))
        .otherwise(array(lit("connection"), lit("protocol"))))
    Zeek.finish(out)
  }
}

/** smb_files.log (zeek/tables/smb_files.yml): file operations over SMB
  * with times lifted to ECS file timestamps and the action → event.type
  * map (delete→deletion, rename/set_attribute→change, else info).
  */
object ZeekSmbFiles {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("fuid", StringType),
    StructField("action", StringType),
    StructField("path", StringType),
    StructField("name", StringType),
    StructField("size", LongType),
    StructField("prev_name", StringType),
    StructField("times.modified", DoubleType),
    StructField("times.accessed", DoubleType),
    StructField("times.created", DoubleType),
    StructField("times.changed", DoubleType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network", "file"),
      Seq("connection", "protocol"),
      transport = Some("tcp"), protocol = Some("smb"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val accessed = timestamp_seconds(Zeek.r("times.accessed"))
    val changed = timestamp_seconds(Zeek.r("times.changed"))
    val created = timestamp_seconds(Zeek.r("times.created"))
    val modified = timestamp_seconds(Zeek.r("times.modified"))
    set("event.action", col("r.action"))
    set("file.name", col("r.name"))
    set("file.size", col("r.size"))
    set("file.accessed", accessed)
    set("file.ctime", changed)
    set("file.created", created)
    set("file.mtime", modified)
    set("file.path", when(col("r.path").isNotNull && col("r.name").isNotNull,
      concat(col("r.path"), lit("\\"), col("r.name"))))
    set("zeek.smb_files", struct(
      col("r.fuid").as("uid"),
      col("r.action").as("action"),
      col("r.path").as("path"),
      col("r.name").as("name"),
      col("r.size").as("size"),
      col("r.prev_name").as("previous_name"),
      struct(
        accessed.as("accessed"),
        changed.as("changed"),
        created.as("created"),
        modified.as("modified")).as("times")))
    set("event.type", concat(array(lit("connection"), lit("protocol")), array(
      when(col("r.action") === "SMB::FILE_DELETE", "deletion")
        .when(col("r.action").isin("SMB::FILE_RENAME", "SMB::FILE_SET_ATTRIBUTE"),
          "change")
        .otherwise("info"))))
    Zeek.finish(out)
  }
}

/** smb_mapping.log (zeek/tables/smb_mapping.yml): tree mounts. */
object ZeekSmbMapping {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("path", StringType),
    StructField("service", StringType),
    StructField("native_file_system", StringType),
    StructField("share_type", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "event", Seq("network"),
      Seq("connection", "protocol"),
      transport = Some("tcp"), protocol = Some("smb"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("zeek.smb_mapping", struct(
      col("r.path").as("path"),
      col("r.service").as("service"),
      col("r.native_file_system").as("native_file_system"),
      col("r.share_type").as("share_type")))
    Zeek.finish(out)
  }
}

/** x509.log (zeek/tables/x509.yml): certificate detail — DN parse into
  * both the zeek-side scalar structs and the ECS file.x509 arrays, the
  * signature-algorithm display map, SAN flattening.
  */
object ZeekX509 {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("id", StringType),
    StructField("certificate.version", IntegerType),
    StructField("certificate.serial", StringType),
    StructField("certificate.subject", StringType),
    StructField("certificate.issuer", StringType),
    StructField("certificate.cn", StringType),
    StructField("certificate.not_valid_before", DoubleType),
    StructField("certificate.not_valid_after", DoubleType),
    StructField("certificate.key_alg", StringType),
    StructField("certificate.sig_alg", StringType),
    StructField("certificate.key_type", StringType),
    StructField("certificate.key_length", IntegerType),
    StructField("certificate.exponent", StringType),
    StructField("certificate.curve", StringType),
    StructField("san.dns", ArrayType(StringType)),
    StructField("san.uri", ArrayType(StringType)),
    StructField("san.email", ArrayType(StringType)),
    StructField("san.ip", ArrayType(StringType)),
    StructField("san.other_fields", BooleanType),
    StructField("basic_constraints.ca", BooleanType),
    StructField("basic_constraints.path_len", IntegerType),
    StructField("logcert", BooleanType)))

  /** uap-core-style OID → display name map the reference applies to
    * file.x509.signature_algorithm (x509.yml sig_alg_map).
    */
  private val sigAlgMap = Map(
    "md2WithRSAEncryption" -> "MD2-RSA",
    "md5WithRSAEncryption" -> "MD5-RSA",
    "sha-1WithRSAEncryption" -> "SHA1-RSA",
    "sha256WithRSAEncryption" -> "SHA256-RSA",
    "sha384WithRSAEncryption" -> "SHA384-RSA",
    "sha512WithRSAEncryption" -> "SHA512-RSA",
    "dsaWithSha1" -> "DSA-SHA1",
    "dsaWithSha256" -> "DSA-SHA256",
    "ecdsa-with-SHA1" -> "ECDSA-SHA1",
    "ecdsa-with-SHA256" -> "ECDSA-SHA256",
    "ecdsa-with-SHA384" -> "ECDSA-SHA384",
    "ecdsa-with-SHA512" -> "ECDSA-SHA512",
    "id-Ed25519" -> "Ed25519")

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.session_id", col("r.id"))
    set("event.id", col("r.id"))

    // staged: dnMap fans out into many component fields (see ZeekSsl)
    out = out
      .withColumn("__dn_s", Zeek.dnMap(Zeek.r("certificate.subject")))
      .withColumn("__dn_i", Zeek.dnMap(Zeek.r("certificate.issuer")))
    val subjDn = col("__dn_s")
    val issDn = col("__dn_i")
    val notBefore = timestamp_seconds(Zeek.r("certificate.not_valid_before"))
    val notAfter = timestamp_seconds(Zeek.r("certificate.not_valid_after"))
    val sigAlg = Zeek.r("certificate.sig_alg")
    val sigAlgDisplay = sigAlgMap.foldLeft(sigAlg) { case (acc, (k, v)) =>
      when(sigAlg === k, lit(v)).otherwise(acc)
    }
    val empty = array().cast(ArrayType(StringType))
    set("zeek.x509", struct(
      struct(
        Zeek.r("certificate.version").as("version"),
        Zeek.r("certificate.serial").as("serial"),
        Zeek.dnStruct(subjDn).as("subject"),
        Zeek.dnStruct(issDn).as("issuer"),
        Zeek.r("certificate.cn").as("common_name"),
        struct(notBefore.as("from"), notAfter.as("until")).as("valid"),
        struct(
          Zeek.r("certificate.key_alg").as("algorithm"),
          Zeek.r("certificate.key_type").as("type"),
          Zeek.r("certificate.key_length").as("length")).as("key"),
        sigAlg.as("signature_algorithm"),
        Zeek.r("certificate.exponent").as("exponent"),
        Zeek.r("certificate.curve").as("curve")).as("certificate"),
      struct(
        Zeek.r("san.dns").as("dns"),
        Zeek.r("san.uri").as("uri"),
        Zeek.r("san.email").as("email"),
        Zeek.r("san.ip").as("ip"),
        Zeek.r("san.other_fields").as("other_fields")).as("san"),
      struct(
        Zeek.r("basic_constraints.ca").as("certificate_authority"),
        Zeek.r("basic_constraints.path_len").as("path_length")).as("basic_constraints"),
      col("r.logcert").as("log_cert")))
    set("file.x509", struct(
      array_distinct(concat(
        coalesce(Zeek.r("san.dns"), empty),
        coalesce(Zeek.r("san.uri"), empty),
        coalesce(Zeek.r("san.email"), empty),
        coalesce(Zeek.r("san.ip"), empty))).as("alternative_names"),
      Zeek.x509Dn(subjDn).as("subject"),
      Zeek.x509Dn(issDn).as("issuer"),
      notBefore.as("not_before"),
      notAfter.as("not_after"),
      Zeek.r("certificate.key_alg").as("public_key_algorithm"),
      Zeek.r("certificate.curve").as("public_key_curve"),
      Zeek.r("certificate.exponent").cast(IntegerType).as("public_key_exponent"),
      Zeek.r("certificate.key_length").as("public_key_size"),
      Zeek.r("certificate.serial").as("serial_number"),
      sigAlgDisplay.as("signature_algorithm"),
      Zeek.r("certificate.version").cast(StringType).as("version_number")))
    Zeek.finish(out.drop("__dn_s", "__dn_i"))
  }
}

/** ocsp.log (zeek/tables/ocsp.yml): revocation checks with hash/update
  * nesting and related.hash from the issuer hashes.
  */
object ZeekOcsp {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("id", StringType),
    StructField("hashAlgorithm", StringType),
    StructField("issuerNameHash", StringType),
    StructField("issuerKeyHash", StringType),
    StructField("serialNumber", StringType),
    StructField("certStatus", StringType),
    StructField("revoketime", DoubleType),
    StructField("revokereason", StringType),
    StructField("thisUpdate", DoubleType),
    StructField("nextUpdate", DoubleType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("network.transport", lit("tcp"))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.session_id", col("r.id"))
    set("event.id", col("r.id"))
    set("zeek.ocsp", struct(
      struct(
        col("r.hashAlgorithm").as("algorithm"),
        struct(
          col("r.issuerNameHash").as("name"),
          col("r.issuerKeyHash").as("key")).as("issuer")).as("hash"),
      col("r.serialNumber").as("serial_number"),
      col("r.certStatus").as("status"),
      struct(
        timestamp_seconds(col("r.revoketime")).as("date"),
        col("r.revokereason").as("reason")).as("revoke"),
      struct(
        timestamp_seconds(col("r.thisUpdate")).as("this"),
        timestamp_seconds(col("r.nextUpdate")).as("next")).as("update")))
    set("related.hash", filter(
      array(col("r.issuerNameHash"), col("r.issuerKeyHash")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** pe.log (zeek/tables/pe.yml): portable-executable analysis. */
object ZeekPe {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("id", StringType),
    StructField("machine", StringType),
    StructField("compile_ts", DoubleType),
    StructField("os", StringType),
    StructField("subsystem", StringType),
    StructField("is_exe", BooleanType),
    StructField("is_64bit", BooleanType),
    StructField("uses_aslr", BooleanType),
    StructField("uses_dep", BooleanType),
    StructField("uses_code_integrity", BooleanType),
    StructField("uses_seh", BooleanType),
    StructField("has_import_table", BooleanType),
    StructField("has_export_table", BooleanType),
    StructField("has_cert_table", BooleanType),
    StructField("has_debug_data", BooleanType),
    StructField("section_names", ArrayType(StringType))))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("file")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.session_id", col("r.id"))
    set("event.id", col("r.id"))
    set("zeek.pe", struct(
      col("r.machine").as("machine"),
      timestamp_seconds(col("r.compile_ts")).as("compile_time"),
      col("r.os").as("os"),
      col("r.subsystem").as("subsystem"),
      col("r.is_exe").as("is_exe"),
      col("r.is_64bit").as("is_64bit"),
      col("r.uses_aslr").as("uses_aslr"),
      col("r.uses_dep").as("uses_dep"),
      col("r.uses_code_integrity").as("uses_code_integrity"),
      col("r.uses_seh").as("uses_seh"),
      col("r.has_import_table").as("has_import_table"),
      col("r.has_export_table").as("has_export_table"),
      col("r.has_cert_table").as("has_cert_table"),
      col("r.has_debug_data").as("has_debug_data"),
      col("r.section_names").as("section_names")))
    Zeek.finish(out)
  }
}

/** intel.log (zeek/tables/intel.yml): indicator hits — typed into ECS
  * threat.indicator via the reference's partial type map + ADDR/URL/
  * EMAIL/FILE_NAME branches.
  */
object ZeekIntel {
  val rawSchema: StructType = Zeek.connSchema(
    StructField("seen.indicator", StringType),
    StructField("seen.indicator_type", StringType),
    StructField("seen.host", StringType),
    StructField("seen.where", StringType),
    StructField("seen.node", StringType),
    StructField("matched", ArrayType(StringType)),
    StructField("sources", ArrayType(StringType)),
    StructField("fuid", StringType),
    StructField("file_mime_type", StringType),
    StructField("file_desc", StringType))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.connBase(df, rawSchema, "enrichment", Seq("threat"),
      Seq("indicator"))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    val ind = Zeek.r("seen.indicator")
    val indType = Zeek.r("seen.indicator_type")
    set("zeek.intel", struct(
      struct(
        ind.as("indicator"),
        indType.as("indicator_type"),
        Zeek.r("seen.host").as("host"),
        Zeek.r("seen.where").as("where"),
        Zeek.r("seen.node").as("node")).as("seen"),
      col("r.matched").as("matched"),
      col("r.sources").as("sources"),
      col("r.fuid").as("fuid"),
      col("r.file_mime_type").as("file_mime_type"),
      col("r.file_desc").as("file_desc")))
    set("threat.indicator.type",
      when(indType === "Intel::ADDR",
        when(graft.functions.NetFunctions.isIpv6(ind), "ipv6-addr")
          .otherwise("ipv4-addr"))
        .when(indType === "Intel::URL", "url")
        .when(indType === "Intel::EMAIL", "email-addr")
        .when(indType === "Intel::FILE_NAME", "file"))
    set("threat.indicator.ip", when(indType === "Intel::ADDR", ind))
    set("threat.indicator.url.original", when(indType === "Intel::URL", ind))
    set("threat.indicator.email.address", when(indType === "Intel::EMAIL", ind))
    set("threat.indicator.file.name", when(indType === "Intel::FILE_NAME", ind))
    Zeek.finish(out)
  }
}

/** signature.log (zeek/tables/signature.yml): signature engine hits —
  * src/dst endpoint fields, rule id/description, event.kind=alert.
  */
object ZeekSignature {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("uid", StringType),
    StructField("src_addr", StringType),
    StructField("src_port", IntegerType),
    StructField("dst_addr", StringType),
    StructField("dst_port", IntegerType),
    StructField("note", StringType),
    StructField("sig_id", StringType),
    StructField("event_msg", StringType),
    StructField("sub_msg", StringType),
    StructField("sig_count", IntegerType),
    StructField("host_count", IntegerType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("alert"))
    set("event.category", array(lit("network")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.session_id", col("r.uid"))
    set("event.id", col("r.uid"))
    set("source.address", col("r.src_addr"))
    set("source.ip", col("r.src_addr"))
    set("source.port", col("r.src_port"))
    set("destination.address", col("r.dst_addr"))
    set("destination.ip", col("r.dst_addr"))
    set("destination.port", col("r.dst_port"))
    set("network.type",
      when(graft.functions.NetFunctions.isIpv6(col("r.src_addr")), "ipv6")
        .when(col("r.src_addr").isNotNull, "ipv4"))
    set("rule.id", col("r.sig_id"))
    set("rule.description", col("r.event_msg"))
    set("zeek.signature", struct(
      col("r.note").as("note"),
      col("r.sig_id").as("sig_id"),
      col("r.event_msg").as("event_msg"),
      col("r.sub_msg").as("sub_msg"),
      col("r.sig_count").as("sig_count"),
      col("r.host_count").as("host_count")))
    set("related.ip", array_distinct(filter(
      array(col("r.src_addr"), col("r.dst_addr")), x => x.isNotNull)))
    Zeek.finish(out)
  }
}

/** software.log (zeek/tables/software.yml): observed software versions. */
object ZeekSoftware {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("host", StringType),
    StructField("host_p", IntegerType),
    StructField("software_type", StringType),
    StructField("name", StringType),
    StructField("version.major", IntegerType),
    StructField("version.minor", IntegerType),
    StructField("version.minor2", IntegerType),
    StructField("version.minor3", IntegerType),
    StructField("version.addl", StringType),
    StructField("unparsed_version", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("network"), lit("file")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("host.ip", filter(array(col("r.host")), x => x.isNotNull))
    set("network.type",
      when(graft.functions.NetFunctions.isIpv6(col("r.host")), "ipv6")
        .when(col("r.host").isNotNull, "ipv4"))
    set("zeek.software", struct(
      col("r.host_p").as("host_port"),
      col("r.software_type").as("type"),
      col("r.name").as("name"),
      struct(
        Zeek.r("version.major").as("major"),
        Zeek.r("version.minor").as("minor"),
        Zeek.r("version.minor2").as("minor2"),
        Zeek.r("version.minor3").as("minor3"),
        Zeek.r("version.addl").as("additional"),
        col("r.unparsed_version").as("full")).as("version")))
    set("related.ip", filter(array(col("r.host")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** known_hosts.log (zeek/tables/known_hosts.yml): host inventory. */
object ZeekKnownHosts {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("host", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("network"), lit("host")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("host.ip", filter(array(col("r.host")), x => x.isNotNull))
    set("network.type",
      when(graft.functions.NetFunctions.isIpv6(col("r.host")), "ipv6")
        .when(col("r.host").isNotNull, "ipv4"))
    set("related.ip", filter(array(col("r.host")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** known_services.log (zeek/tables/known_services.yml): service inventory. */
object ZeekKnownServices {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("host", StringType),
    StructField("port_num", IntegerType),
    StructField("port_proto", StringType),
    StructField("service", ArrayType(StringType))))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("network")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("host.ip", filter(array(col("r.host")), x => x.isNotNull))
    set("network.type",
      when(graft.functions.NetFunctions.isIpv6(col("r.host")), "ipv6")
        .when(col("r.host").isNotNull, "ipv4"))
    set("server.address", col("r.host"))
    set("server.ip", col("r.host"))
    set("server.port", col("r.port_num"))
    set("network.transport", col("r.port_proto"))
    set("network.application", lower(element_at(col("r.service"), 1)))
    set("zeek.known_services", struct(col("r.service").as("services")))
    set("related.ip", filter(array(col("r.host")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** known_certs.log (zeek/tables/known_certs.yml): certificate inventory
  * with DN → common_name arrays.
  */
object ZeekKnownCerts {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("host", StringType),
    StructField("port_num", IntegerType),
    StructField("subject", StringType),
    StructField("issuer_subject", StringType),
    StructField("serial", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("event"))
    set("event.category", array(lit("network"), lit("file")))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("host.ip", filter(array(col("r.host")), x => x.isNotNull))
    set("network.type",
      when(graft.functions.NetFunctions.isIpv6(col("r.host")), "ipv6")
        .when(col("r.host").isNotNull, "ipv4"))
    set("server.address", col("r.host"))
    set("server.ip", col("r.host"))
    set("server.port", col("r.port_num"))
    val subjClean = regexp_replace(col("r.subject"), "\\\\,", "")
    val issClean = regexp_replace(col("r.issuer_subject"), "\\\\,", "")
    val subjCn = element_at(Zeek.dnMap(subjClean), "CN")
    val issCn = element_at(Zeek.dnMap(issClean), "CN")
    set("tls.server.subject", subjClean)
    set("tls.server.issuer", issClean)
    set("tls.server.x509", struct(
      struct(
        subjClean.as("distinguished_name"),
        when(subjCn.isNotNull, array(subjCn)).as("common_name")).as("subject"),
      struct(
        issClean.as("distinguished_name"),
        when(issCn.isNotNull, array(issCn)).as("common_name")).as("issuer"),
      col("r.serial").as("serial_number")))
    set("related.ip", filter(array(col("r.host")), x => x.isNotNull))
    Zeek.finish(out)
  }
}

/** stats.log (zeek/tables/stats.yml): per-peer engine metrics. */
object ZeekStats {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("peer", StringType),
    StructField("mem", LongType),
    StructField("pkts_proc", LongType),
    StructField("pkts_dropped", LongType),
    StructField("pkts_link", LongType),
    StructField("bytes_recv", LongType),
    StructField("tcp_conns", LongType),
    StructField("active_tcp_conns", LongType),
    StructField("udp_conns", LongType),
    StructField("active_udp_conns", LongType),
    StructField("icmp_conns", LongType),
    StructField("active_icmp_conns", LongType),
    StructField("events_proc", LongType),
    StructField("events_queued", LongType),
    StructField("timers", LongType),
    StructField("active_timers", LongType),
    StructField("files", LongType),
    StructField("active_files", LongType),
    StructField("dns_requests", LongType),
    StructField("active_dns_requests", LongType),
    StructField("reassem_tcp_size", LongType),
    StructField("reassem_file_size", LongType),
    StructField("reassem_frag_size", LongType),
    StructField("reassem_unknown_size", LongType),
    StructField("pkt_lag", DoubleType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("metric"))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.stats", struct(
      col("r.peer").as("peer"),
      col("r.mem").as("memory"),
      struct(
        col("r.pkts_proc").as("processed"),
        col("r.pkts_dropped").as("dropped"),
        col("r.pkts_link").as("received")).as("packets"),
      struct(col("r.bytes_recv").as("received")).as("bytes"),
      struct(
        struct(
          col("r.tcp_conns").as("count"),
          col("r.active_tcp_conns").as("active")).as("tcp"),
        struct(
          col("r.udp_conns").as("count"),
          col("r.active_udp_conns").as("active")).as("udp"),
        struct(
          col("r.icmp_conns").as("count"),
          col("r.active_icmp_conns").as("active")).as("icmp")).as("connections"),
      struct(
        col("r.events_proc").as("processed"),
        col("r.events_queued").as("queued")).as("events"),
      struct(
        col("r.timers").as("count"),
        col("r.active_timers").as("active")).as("timers"),
      struct(
        col("r.files").as("count"),
        col("r.active_files").as("active")).as("files"),
      struct(
        col("r.dns_requests").as("count"),
        col("r.active_dns_requests").as("active")).as("dns_requests"),
      struct(
        col("r.reassem_tcp_size").as("tcp"),
        col("r.reassem_file_size").as("file"),
        col("r.reassem_frag_size").as("frag"),
        col("r.reassem_unknown_size").as("unknown")).as("reassembly_size"),
      col("r.pkt_lag").as("timestamp_lag")))
    Zeek.finish(out)
  }
}

/** capture_loss.log (zeek/tables/capture_loss.yml): drop-rate metrics. */
object ZeekCaptureLoss {
  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("ts_delta", DoubleType),
    StructField("peer", StringType),
    StructField("gaps", LongType),
    StructField("acks", LongType),
    StructField("percent_lost", DoubleType)))

  def apply(df: DataFrame): DataFrame = {
    var out = Zeek.parse(df, rawSchema)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    set("event.kind", lit("metric"))
    set("event.type", array(lit("info")))
    set("ts", timestamp_seconds(col("r.ts")))
    set("zeek.capture_loss", struct(
      col("r.ts_delta").as("ts_delta"),
      col("r.peer").as("peer"),
      col("r.gaps").as("gaps"),
      col("r.acks").as("acks"),
      col("r.percent_lost").as("percent_lost")))
    Zeek.finish(out)
  }
}
