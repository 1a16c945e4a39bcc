package graft

import graft.operators.{Alerts, Detection}
import graft.sources.Framing
import graft.transform.managed.{VpcFlow, ZeekDns}
import org.apache.spark.sql.functions._

/** Managed source mappings (FIXTURES.md F2/F3) + matano_alerts rows (F8). */
class ManagedSpec extends SparkSpec {
  import spark.implicits._

  test("vpcflow: header lines abort; v2 line parses with numeric casts") {
    val lines = Seq(
      "version account-id interface-id srcaddr dstaddr srcport dstport protocol packets bytes start end action log-status",
      "2 123456789012 eni-0123456789abcdef0 10.0.0.1 10.0.0.2 443 49152 6 10 840 1658256000 1658256060 ACCEPT OK")
      .toDF("message").withColumn("ts", current_timestamp())
    val out = VpcFlow(lines)
    assert(out.count() == 1)
    assert(out.select("source.ip").head.getString(0) == "10.0.0.1")
    assert(out.select("destination.port").head.getInt(0) == 49152)
    assert(out.select("network.bytes").head.getLong(0) == 840L)
    assert(out.select("event.action").head.getString(0) == "accept")
    assert(out.select("related.ip").head.getSeq[String](0) == Seq("10.0.0.1", "10.0.0.2"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.getEpochSecond == 1658256000L)
    assert(out.select("aws.vpcflow.account_id").head.getString(0) == "123456789012")
  }

  test("vpcflow: malformed numeric tokens null out instead of failing") {
    val lines = Seq("2 acct eni-1 10.0.0.1 10.0.0.2 not-a-port 49152 6 10 840 1658256000 1658256060 REJECT OK")
      .toDF("message")
    val out = VpcFlow(lines)
    assert(out.select("source.port").head.isNullAt(0))
    assert(out.select("event.action").head.getString(0) == "reject")
  }

  test("zeek dns: F3 fixture maps to ECS dns/source/destination/related") {
    val line =
      """{"ts":1658256000.123,"uid":"C1a2b3","id.orig_h":"10.0.0.5","id.orig_p":54321,
        |"id.resp_h":"8.8.8.8","id.resp_p":53,"proto":"udp","query":"example.com",
        |"qclass":1,"qclass_name":"C_INTERNET","qtype":1,"qtype_name":"A","rcode":0,
        |"rcode_name":"NOERROR","AA":false,"TC":false,"RD":true,"RA":true,
        |"answers":["93.184.216.34"],"TTLs":[3600.0],"rejected":false}""".stripMargin.replace("\n", "")
    val out = ZeekDns(Framing.preTransformJsonParse(Seq(line).toDF("message")))
    assert(out.select("dns.question.name").head.getString(0) == "example.com")
    assert(out.select("dns.resolved_ip").head.getSeq[String](0) == Seq("93.184.216.34"))
    assert(out.select("source.port").head.getInt(0) == 54321)
    assert(out.select("network.transport").head.getString(0) == "udp")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("10.0.0.5", "8.8.8.8", "93.184.216.34"))
  }

  test("matano alert rows carry the F8 nested shape") {
    val rules = Seq(Detection.SimpleRule("r1", lit(true),
      severity = "warning", threshold = 2, windowSeconds = 900))
    val alerts = Seq(Alerts.AlertRow("r1", "k", "abc123",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 00:10:00"),
      3L, true, Some(java.sql.Timestamp.valueOf("2024-01-01 00:05:00")))).toDF
    val rows = Detection.matanoAlertRows(alerts, rules, "events")
    assert(rows.select("matano.table").head.getString(0) == "events")
    assert(rows.select("matano.alert.rule.threshold").head.getInt(0) == 2)
    assert(rows.select("matano.alert.activated").head.getBoolean(0))
    assert(rows.select("ts").head.getTimestamp(0)
      == java.sql.Timestamp.valueOf("2024-01-01 00:10:00"))
    assert(rows.select("matano.alert.rule.deduplication_window").head.getLong(0) == 900L)
  }
}
