package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed PAN-OS traffic-log mapping (reference
  * data/managed/log_sources/panw/tables/traffic.yml): syslog-prefixed
  * positional CSV → ECS. The prefix grok peels receive time / serial /
  * type / subtype / generated time; the remainder maps by position into
  * the panw.panos vendor struct with ECS mirrors (endpoints + NAT,
  * zones/interfaces, rule, app, byte/packet counters), the
  * domain\\user | user@domain | bare-user identity grok family applies to
  * src/dst users, timestamps parse as naive PAN-OS local time + the
  * configured zone (UTC default), and allow → success outcome.
  */
object PanwTraffic {

  private def userName(raw: Column): Column = coalesce(
    when(regexp_extract(raw, "^([^\\\\]+)\\\\+(.+)$", 2) =!= "",
      regexp_extract(raw, "^([^\\\\]+)\\\\+(.+)$", 2)),
    when(regexp_extract(raw, "^([^@]+)@(.+)$", 1) =!= "",
      regexp_extract(raw, "^([^@]+)@(.+)$", 1)),
    raw)
  private def userDomain(raw: Column): Column = coalesce(
    when(regexp_extract(raw, "^([^\\\\]+)\\\\+(.+)$", 1) =!= "",
      regexp_extract(raw, "^([^\\\\]+)\\\\+(.+)$", 1)),
    when(regexp_extract(raw, "^([^@]+)@(.+)$", 2) =!= "",
      regexp_extract(raw, "^([^@]+)@(.+)$", 2)))

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

    val srcUser = v(5); val dstUser = v(6)
    set("source.user.name", userName(srcUser))
    set("source.user.domain", userDomain(srcUser))
    set("destination.user.name", userName(dstUser))
    set("destination.user.domain", userDomain(dstUser))
    set("user", g("source.user"))

    set("panw.panos", struct(
      pfx(3).as("type"),
      pfx(4).as("sub_type"),
      panTs(pfx(6)).as("generated_time"),
      struct(v(0).as("ip"), v(17).try_cast(IntegerType).as("port"),
        struct(v(2).as("ip"), v(19).try_cast(IntegerType).as("port")).as("nat"),
        v(9).as("zone"), userName(srcUser).as("user"),
        v(34).as("location")).as("source"),
      struct(v(1).as("ip"), v(18).try_cast(IntegerType).as("port"),
        struct(v(3).as("ip"), v(20).try_cast(IntegerType).as("port")).as("nat"),
        v(10).as("zone"), userName(dstUser).as("user"),
        v(35).as("location")).as("destination"),
      v(4).as("ruleset"),
      struct(v(7).as("application"),
        v(24).try_cast(LongType).as("bytes"),
        v(27).try_cast(LongType).as("packets")).as("network"),
      v(8).as("virtual_sys"),
      v(11).as("inbound_interface"),
      v(12).as("outbound_interface"),
      v(13).as("log_profile"),
      v(15).as("flow_id"),
      v(16).try_cast(LongType).as("repeat_count"),
      v(22).as("protocol"),
      v(23).as("action"),
      v(25).try_cast(LongType).as("bytes_sent"),
      v(26).try_cast(LongType).as("bytes_received"),
      panTs(v(28)).as("start_time"),
      v(29).try_cast(LongType).as("elapsed_time"),
      struct(v(30).as("category")).as("url"),
      v(32).as("sequence_number"),
      v(37).try_cast(LongType).as("packets_sent"),
      v(38).try_cast(LongType).as("packets_received"),
      v(39).as("endreason"),
      v(45).as("device_name"),
      v(46).as("action_source"),
      v(58).as("rule_uuid")))

    set("event.outcome",
      when(g("panw.panos.action") === "allow", "success").otherwise("failure"))
    set("source.ip", g("panw.panos.source.ip"))
    set("source.port", g("panw.panos.source.port"))
    set("source.nat.ip", g("panw.panos.source.nat.ip"))
    set("source.nat.port", g("panw.panos.source.nat.port"))
    set("source.bytes", g("panw.panos.bytes_sent"))
    set("source.packets", g("panw.panos.packets_sent"))
    set("destination.ip", g("panw.panos.destination.ip"))
    set("destination.port", g("panw.panos.destination.port"))
    set("destination.nat.ip", g("panw.panos.destination.nat.ip"))
    set("destination.nat.port", g("panw.panos.destination.nat.port"))
    set("destination.bytes", g("panw.panos.bytes_received"))
    set("destination.packets", g("panw.panos.packets_received"))
    set("network.application", g("panw.panos.network.application"))
    set("network.bytes", g("panw.panos.network.bytes"))
    set("network.packets", g("panw.panos.network.packets"))
    set("network.transport", g("panw.panos.protocol"))
    set("event.duration", g("panw.panos.elapsed_time"))
    set("event.start", g("panw.panos.start_time"))
    set("observer.egress.interface.name", g("panw.panos.outbound_interface"))
    set("observer.egress.zone", g("panw.panos.destination.zone"))
    set("observer.hostname", g("panw.panos.device_name"))
    set("observer.ingress.interface.name", g("panw.panos.inbound_interface"))
    set("observer.ingress.zone", g("panw.panos.source.zone"))
    set("rule.uuid", g("panw.panos.rule_uuid"))
    set("related.ip", array_distinct(filter(array(
      g("source.ip"), g("destination.ip"),
      g("source.nat.ip"), g("destination.nat.ip")), x => x.isNotNull)))
    set("related.user", array_distinct(filter(array(
      g("source.user.name"), g("destination.user.name")), x => x.isNotNull)))

    out = out.drop("vals", "message")
    ecsFooter(out)
  }
}
