package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed CrowdStrike Falcon Data Replicator (FDR) mapping (reference
  * data/managed/log_sources/crowdstrike/tables/fdr.yml): sensor events →
  * ECS. Covers the event_simpleName → kind/category/type/outcome table
  * for the common sensor events (the reference enumerates hundreds; the
  * mechanics are identical and entries are data), the dual-clock ts rule
  * (ContextTimeStamp event time over UTC wall time), nullish-marker
  * normalization ("-"/"N/A"/"none" → null), zero-filtered hash relations,
  * observer/host/os identity, process decomposition (command-line args
  * with quote stripping, executable basename, start/end/uptime, pid
  * fallbacks), user identity (admin role, principal split), IPv4/IPv6
  * endpoint precedence, IANA protocol numbers → transport names, and
  * connection direction.
  */
object CrowdstrikeFdr {

  /** event_simpleName → (kind, category, type, outcome) — the commonly
    * emitted subset of the reference's table; unknown events keep default
    * kind=event and empty category/type, exactly as the reference's
    * null-lookup branch.
    */
  val eventInfo: Map[String, (String, Seq[String], Seq[String], String)] = Map(
    "ProcessRollup2" -> ("event", Seq("process"), Seq("start"), "success"),
    "SyntheticProcessRollup2" -> ("event", Seq("process"), Seq("start"), "success"),
    "EndOfProcess" -> ("event", Seq("process"), Seq("end"), "success"),
    "NetworkConnectIP4" -> ("event", Seq("network"), Seq("connection", "start"), "success"),
    "NetworkConnectIP6" -> ("event", Seq("network"), Seq("connection", "start"), "success"),
    "NetworkReceiveAcceptIP4" -> ("event", Seq("network"), Seq("connection", "start"), "success"),
    "NetworkReceiveAcceptIP6" -> ("event", Seq("network"), Seq("connection", "start"), "success"),
    "DnsRequest" -> ("event", Seq("network"), Seq("protocol", "info"), "success"),
    "UserLogon" -> ("event", Seq("authentication"), Seq("start"), "success"),
    "UserLogoff" -> ("event", Seq("authentication"), Seq("end"), "success"),
    "UserLogonFailed" -> ("event", Seq("authentication"), Seq("start"), "failure"),
    "UserLogonFailed2" -> ("event", Seq("authentication"), Seq("start"), "failure"),
    "UserIdentity" -> ("event", Seq("authentication", "iam"), Seq("info", "user"), "success"),
    "UserAccountCreated" -> ("event", Seq("configuration", "iam"), Seq("creation"), "success"),
    "UserAccountDeleted" -> ("event", Seq("configuration", "iam"), Seq("deletion"), "success"),
    "UserAccountAddedToGroup" -> ("event", Seq("configuration", "iam"), Seq("change", "group"), "success"),
    "AgentConnect" -> ("event", Seq("network", "session"), Seq("connection", "info"), "success"),
    "AgentOnline" -> ("state", Seq("configuration", "package", "host"), Seq("change", "installation", "start"), "success"),
    "AsepFileChange" -> ("event", Seq("file"), Seq("creation", "change"), "success"),
    "NewExecutableWritten" -> ("event", Seq("file"), Seq("creation"), "success"),
    "PeFileWritten" -> ("event", Seq("file"), Seq("creation"), "success"),
    "UnsignedModuleLoad" -> ("alert", Seq("process"), Seq("change"), "success"),
    "WmiCreateProcess" -> ("event", Seq("process"), Seq("start"), "success"),
    "AcUninstallConfirmation" -> ("state", Seq("package"), Seq("deletion"), "success"),
    "AmsiRegistrationStatus" -> ("state", Seq("host"), Seq("info"), "success"))

  val rawSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("event_simpleName", StringType),
    StructField("event_platform", StringType),
    StructField("timestamp", StringType),
    StructField("UTCTimestamp", StringType),
    StructField("ContextTimeStamp", StringType),
    StructField("AgentLocalTime", StringType),
    StructField("aid", StringType),
    StructField("aip", StringType),
    StructField("AgentVersion", StringType),
    StructField("ConfigBuild", StringType),
    StructField("ComputerName", StringType),
    StructField("MachineDomain", StringType),
    StructField("OSVersionString", StringType),
    StructField("MD5HashData", StringType),
    StructField("SHA1HashData", StringType),
    StructField("SHA256HashData", StringType),
    StructField("CommandLine", StringType),
    StructField("ImageFileName", StringType),
    StructField("ExitCode", StringType),
    StructField("ProcessStartTime", StringType),
    StructField("ProcessEndTime", StringType),
    StructField("RawProcessId", StringType),
    StructField("TargetProcessId", StringType),
    StructField("ParentProcessId", StringType),
    StructField("ParentBaseFileName", StringType),
    StructField("UID", StringType),
    StructField("GID", StringType),
    StructField("UserSid", StringType),
    StructField("UserIsAdmin", StringType),
    StructField("UserName", StringType),
    StructField("UserPrincipal", StringType),
    StructField("LocalAddressIP4", StringType),
    StructField("LocalAddressIP6", StringType),
    StructField("LocalPort", StringType),
    StructField("RemoteAddressIP4", StringType),
    StructField("RemoteAddressIP6", StringType),
    StructField("RemotePort", StringType),
    StructField("Protocol", StringType),
    StructField("ConnectionDirection", StringType),
    StructField("PhysicalAddress", StringType),
    StructField("DomainName", StringType),
    StructField("message", StringType)))

  private val ianaTransport = Map(
    "0" -> "hopopt", "1" -> "icmp", "2" -> "igmp", "6" -> "tcp", "8" -> "egp",
    "17" -> "udp", "47" -> "gre", "50" -> "esp", "58" -> "ipv6-icmp",
    "112" -> "vrrp", "132" -> "sctp")

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r0", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    // nullish-marker normalization on the stringly-typed sensor fields
    val nullish = Seq("", "-", "N/A", "NA", "none")
    out = out.withColumn("r", struct(rawSchema.fieldNames.toIndexedSeq.map { n =>
      when(!col(s"`r0`.`$n`").isin(nullish: _*), col(s"`r0`.`$n`")).as(n)
    }: _*)).drop("r0")

    set("observer.vendor", lit("crowdstrike"))
    set("observer.type", lit("agent"))
    set("event.original", col("json"))
    set("message", col("r.message"))

    // wall-clock created (ms epoch, falling back to agent-local seconds);
    // event time prefers the sensor's context timestamp
    val createdMs = coalesce(col("r.UTCTimestamp"), col("r.timestamp")).try_cast(LongType)
    val createdFallback = timestamp_seconds(
      coalesce(col("r.AgentLocalTime"), lit(null)).try_cast(DoubleType))
    set("event.created", coalesce(timestamp_millis(createdMs), createdFallback))
    set("ts", coalesce(
      timestamp_seconds(col("r.ContextTimeStamp").try_cast(DoubleType)),
      g("event.created")))

    val action = col("r.event_simpleName")
    set("event.id", col("r.id"))
    set("event.action", action)
    set("event.kind", eventInfo.foldLeft(lit("event")) { case (acc, (k, (kind, _, _, _))) =>
      when(action === k, lit(kind)).otherwise(acc) })
    set("event.category", eventInfo.foldLeft(array().cast(ArrayType(StringType))) {
      case (acc, (k, (_, cats, _, _))) =>
        when(action === k, array(cats.map(lit): _*)).otherwise(acc) })
    set("event.type", eventInfo.foldLeft(array().cast(ArrayType(StringType))) {
      case (acc, (k, (_, _, types, _))) =>
        when(action === k, array(types.map(lit): _*)).otherwise(acc) })
    set("event.outcome", eventInfo.foldLeft(lit(null).cast(StringType)) {
      case (acc, (k, (_, _, _, outc))) =>
        when(action === k, lit(outc)).otherwise(acc) })

    // hashes: all-zero digests are sensor placeholders, not hashes
    def realHash(c: Column) = when(c.isNotNull && !c.rlike("^0*$"), c)
    val md5h = realHash(col("r.MD5HashData"))
    val sha1h = realHash(col("r.SHA1HashData"))
    val sha256h = realHash(col("r.SHA256HashData"))
    set("related.hash", filter(array(md5h, sha1h, sha256h), x => x.isNotNull))
    val isProcEvent = action.rlike("Process|Service")
    set("process.hash", when(isProcEvent, struct(
      md5h.as("md5"), sha1h.as("sha1"), sha256h.as("sha256"))))

    set("observer.serial_number", col("r.aid"))
    set("observer.version", coalesce(col("r.AgentVersion"), col("r.ConfigBuild")))
    set("observer.ip", filter(array(col("r.aip")), x => x.isNotNull))
    set("host.hostname", col("r.ComputerName"))
    set("host.name", col("r.ComputerName"))
    set("host.domain", col("r.MachineDomain"))
    set("os.type",
      when(col("r.event_platform") === "Lin", "linux")
        .when(col("r.event_platform") === "Mac", "macos")
        .when(col("r.event_platform") === "Win", "windows"))
    set("os.version", col("r.OSVersionString"))

    // process: quoted args stripped, executable basename by its own
    // separator (leading \ or /), epoch-seconds start/end, uptime seconds
    val cmd = trim(col("r.CommandLine"))
    val argsRaw = filter(split(cmd, " "), v => v =!= "" && v =!= "-")
    set("process.command_line", col("r.CommandLine"))
    set("process.args", when(cmd.isNotNull, F.transform(argsRaw, v =>
      when(v.startsWith("\"") && v.endsWith("\""), v.substr(lit(2), length(v) - 2))
        .otherwise(v))))
    set("process.args_count", when(cmd.isNotNull, size(argsRaw)))
    val exe = col("r.ImageFileName")
    set("process.executable", exe)
    set("process.name", when(exe.isNotNull,
      when(exe.startsWith("\\"), element_at(split(exe, "\\\\"), -1))
        .when(exe.startsWith("/"), element_at(split(exe, "/"), -1))
        .otherwise(exe)))
    set("process.exit_code", col("r.ExitCode").try_cast(IntegerType))
    val pStart = col("r.ProcessStartTime").try_cast(DoubleType)
    val pEnd = col("r.ProcessEndTime").try_cast(DoubleType)
    set("process.start", timestamp_seconds(pStart))
    set("process.end", timestamp_seconds(pEnd))
    // ECS process.uptime is seconds; start/end are epoch seconds, so the
    // difference is already seconds (the reference's extra /1000 would
    // make a 10-minute process report uptime 0)
    set("process.uptime", (pEnd - pStart).cast(LongType))
    set("process.pid", col("r.RawProcessId").try_cast(LongType))
    set("process.entity_id", col("r.TargetProcessId"))
    set("process.parent.entity_id", col("r.ParentProcessId"))
    set("process.parent.name", col("r.ParentBaseFileName"))

    // user identity
    set("user.id", coalesce(col("r.UID"), col("r.UserSid")))
    set("user.group.id", col("r.GID"))
    set("user.roles", filter(array(when(col("r.UserIsAdmin") === "1", "admin")),
      x => x.isNotNull))
    set("user.name", col("r.UserName"))
    set("user.email", col("r.UserPrincipal"))
    val principalParts = split(col("r.UserPrincipal"), "@", 2)
    val principalOk = col("r.UserPrincipal").contains("@") && size(principalParts) === 2
    set("user.full_name", when(principalOk, principalParts.getItem(0)))
    set("user.domain", when(principalOk, principalParts.getItem(1)))

    // endpoints: IPv6 wins over IPv4 when both present (reference order)
    val srcIp = coalesce(col("r.LocalAddressIP6"), col("r.LocalAddressIP4"))
    val dstIp = coalesce(col("r.RemoteAddressIP6"), col("r.RemoteAddressIP4"))
    set("source.ip", srcIp)
    set("source.address", srcIp)
    set("source.port", col("r.LocalPort").try_cast(IntegerType))
    set("source.mac", upper(col("r.PhysicalAddress")))
    set("destination.ip", dstIp)
    set("destination.address", dstIp)
    set("destination.port", col("r.RemotePort").try_cast(IntegerType))
    set("network.iana_number", col("r.Protocol"))
    set("network.transport", ianaTransport.foldLeft(lit(null).cast(StringType)) {
      case (acc, (num, name)) =>
        when(col("r.Protocol") === num, lit(name)).otherwise(acc) })
    set("network.direction",
      when(col("r.ConnectionDirection") === "0", "outbound")
        .when(col("r.ConnectionDirection") === "1", "inbound")
        .when(col("r.ConnectionDirection").isNotNull, "unknown"))

    set("dns.type", when(action === "DnsRequest", "query"))
    set("dns.question.name", when(action === "DnsRequest", col("r.DomainName")))

    set("related.ip", array_distinct(
      filter(array(srcIp, dstIp, col("r.aip")), x => x.isNotNull)))
    set("related.hosts", array_distinct(
      filter(array(col("r.ComputerName"), col("r.aip"), srcIp, dstIp), x => x.isNotNull)))
    set("related.user", array_distinct(
      filter(array(g("user.name"), g("user.full_name")), x => x.isNotNull)))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
