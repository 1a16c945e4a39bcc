package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Teleport audit-event mapping (reference
  * data/managed/log_sources/teleport/tables/audit.yml): JSON audit events
  * → ECS. Covers the event-action category/type tables, success/outcome,
  * session.command process fields, addr.remote/addr.local ip:port splits,
  * the session.network egress branch with IP-version typing, tx/rx byte
  * counters, and related.{ip,user,hosts} incl. session participants.
  */
object Teleport {

  val rawSchema: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("event", StringType),
    StructField("uid", StringType),
    StructField("code", StringType),
    StructField("success", BooleanType),
    StructField("error", StringType),
    StructField("session_start", StringType),
    StructField("session_stop", StringType),
    StructField("cluster_name", StringType),
    StructField("ei", LongType),
    StructField("interactive", BooleanType),
    StructField("method", StringType),
    StructField("namespace", StringType),
    StructField("participants", ArrayType(StringType)),
    StructField("proto", StringType),
    StructField("sid", StringType),
    StructField("server_addr", StringType),
    StructField("session_recording", StringType),
    StructField("user", StringType),
    StructField("login", StringType),
    StructField("server_hostname", StringType),
    StructField("server_id", StringType),
    StructField("program", StringType),
    StructField("path", StringType),
    StructField("argv", ArrayType(StringType)),
    StructField("return_code", IntegerType),
    StructField("pid", LongType),
    StructField("ppid", LongType),
    StructField("initial_command", ArrayType(StringType)),
    StructField("command", StringType),
    StructField("exitCode", StringType),
    StructField("addr.remote", StringType),
    StructField("addr.local", StringType),
    StructField("dst_addr", StringType),
    StructField("dst_port", IntegerType),
    StructField("src_addr", StringType),
    StructField("version", IntegerType),
    StructField("tx", LongType),
    StructField("rx", LongType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)
    def r(n: String): Column = col(s"`r`.`$n`")

    set("event.original", col("json"))
    set("ts", try_to_timestamp(col("r.time")))
    val action = col("r.event")
    set("event.action", action)

    val empty = array().cast(ArrayType(StringType))
    def tag(cond: Column, v: String) = when(cond, array(lit(v))).otherwise(empty)
    set("event.category", concat(
      tag(action.isin("auth", "user.login"), "authentication"),
      tag(action.contains("db."), "database"),
      tag(action.isin("session.disk", "scp"), "file"),
      tag(action === "session.network", "network"),
      tag(action.isin("session.start", "session.end", "session.join",
        "session.leave", "app.session.start"), "session")))
    set("event.type", concat(
      tag(action === "session.network", "connection"),
      tag(action.isin("session.start", "session.join", "app.session.start"), "start"),
      tag(action.isin("session.end", "session.leave"), "end")))

    set("event.id", col("r.uid"))
    set("event.code", col("r.code"))
    set("event.outcome", when(col("r.success") === true, "success")
      .when(col("r.success") === false, "failure"))
    set("event.reason", col("r.error"))
    set("event.start", try_to_timestamp(col("r.session_start")))
    set("event.end", try_to_timestamp(col("r.session_stop")))

    set("teleport", struct(
      col("r.cluster_name").as("cluster_name"),
      col("r.ei").as("ei"),
      col("r.interactive").as("interactive"),
      col("r.method").as("method"),
      col("r.namespace").as("namespace"),
      col("r.participants").as("participants"),
      col("r.proto").as("proto"),
      col("r.sid").as("sid"),
      col("r.server_addr").as("server_addr"),
      col("r.session_recording").as("session_recording")))

    set("source.user.name", col("r.user"))
    set("destination.user.name", col("r.login"))
    set("host.hostname", col("r.server_hostname"))
    set("host.id", col("r.server_id"))

    val isCmd = action === "session.command"
    set("process.name", when(isCmd, col("r.program")))
    set("process.executable", when(isCmd, col("r.path")))
    set("process.args", when(isCmd, col("r.argv")))
    set("process.pid", col("r.pid"))
    set("process.parent.pid", col("r.ppid"))
    set("process.command_line", coalesce(
      col("r.command"), array_join(col("r.initial_command"), " ")))
    set("process.exit_code", coalesce(
      col("r.exitCode").try_cast(IntegerType), when(isCmd, col("r.return_code"))))

    val isNet = action === "session.network"
    val srcAddr = when(isNet, col("r.src_addr")).otherwise(r("addr.remote"))
    val dstAddr = when(isNet, col("r.dst_addr")).otherwise(r("addr.local"))
    def ipOf(a: Column, net: Column) =
      when(isNet, net).otherwise(try_element_at(split(a, ":", 2), lit(1)))
    def portOf(a: Column, net: Column) =
      when(isNet, net).otherwise(
        try_element_at(split(a, ":", 2), lit(2)).try_cast(IntegerType))
    set("source.address", srcAddr)
    set("source.ip", ipOf(r("addr.remote"), col("r.src_addr")))
    set("source.port", portOf(r("addr.remote"), lit(null).cast(IntegerType)))
    set("destination.address", dstAddr)
    set("destination.ip", ipOf(r("addr.local"), col("r.dst_addr")))
    set("destination.port", portOf(r("addr.local"), col("r.dst_port")))
    set("network.direction", when(isNet, "egress"))
    set("network.type", when(isNet && col("r.version") === 4, "ipv4")
      .when(isNet && col("r.version") === 6, "ipv6"))

    set("file.directory", when(action === "scp", col("r.path")))
    set("source.bytes", col("r.tx"))
    set("destination.bytes", col("r.rx"))

    set("user", g("source.user"))
    set("related.ip", array_distinct(
      filter(array(g("source.ip"), g("destination.ip")), x => x.isNotNull)))
    set("related.user", array_distinct(concat(
      filter(array(col("r.user"), col("r.login")), x => x.isNotNull),
      coalesce(col("r.participants"), empty))))
    set("related.hosts", filter(array(col("r.server_hostname")), x => x.isNotNull))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
