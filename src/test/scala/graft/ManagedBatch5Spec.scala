package graft

import graft.transform.managed._
import org.apache.spark.sql.functions._

/** Golden tests for managed-source batch 5 — the remaining reference
  * sub-tables (duo, google_workspace, onepassword, snyk, cloudtrail,
  * panw).
  */
class ManagedBatch5Spec extends SparkSpec {
  import spark.implicits._

  test("duo admin: action taxonomy, failure actions, related user") {
    val mk = (a: String) =>
      s"""{"timestamp":1591980072,"action":"$a","username":"jo","object":"target1",
        |"description":"did a thing"}""".stripMargin.replace("\n", "")
    val out = DuoAdmin(Seq(mk("user_create"), mk("admin_login_error")).toDF("json"))
    val byAction = out.select(col("event.action"), col("event.type"),
      col("event.outcome"), col("event.category")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byAction("user_create").getSeq[String](1).toSet == Set("user", "creation"))
    assert(byAction("user_create").getString(2) == "success")
    assert(byAction("user_create").getSeq[String](3) == Seq("iam"))
    assert(byAction("admin_login_error").getString(2) == "failure")
    assert(byAction("admin_login_error").getSeq[String](1).contains("admin"))
    assert(out.select("related.user").head.getSeq[String](0) == Seq("jo"))
  }

  test("duo offline_enrollment: nested JSON description parses") {
    val line = """{"timestamp":1591980072,"action":"o2fa_user_provisioned",
      |"username":"jo","object":"laptop1",
      |"description":"{\"hostname\":\"host-7\",\"user_agent\":\"DuoCred/4.0\",\"factor\":\"duo_otp\"}"}"""
      .stripMargin.replace("\n", "")
    val out = DuoOfflineEnrollment(Seq(line).toDF("json"))
    assert(out.select("duo.offline_enrollment.description.hostname").head.getString(0) == "host-7")
    assert(out.select("duo.offline_enrollment.description.factor").head.getString(0) == "duo_otp")
    assert(out.select("related.hosts").head.getSeq[String](0) == Seq("host-7"))
  }

  test("duo summary + telephony counters") {
    val s = """{"admin_count":3,"integration_count":9,"telephony_credits_remaining":700,"user_count":84}"""
    val outS = DuoSummary(Seq(s).toDF("json"))
    assert(outS.select("duo.summary.user_count").head.getInt(0) == 84)
    assert(!outS.select("ts").head.isNullAt(0))

    val t = """{"timestamp":1591980072,"context":"authentication","credits":1,
      |"phone":"+15555550100","type":"sms"}""".stripMargin.replace("\n", "")
    val outT = DuoTelephony(Seq(t).toDF("json"))
    assert(outT.select("duo.telephony.type").head.getString(0) == "sms")
    assert(outT.select("duo.telephony.credits").head.getInt(0) == 1)
  }

  test("google_workspace admin: action-derived taxonomy, params to map") {
    val line = """{"kind":"admin#reports#activity",
      |"id":{"time":"2022-07-19T18:40:00Z","uniqueQualifier":"q-1",
      |"applicationName":"admin","customerId":"C1"},
      |"actor":{"callerType":"USER","email":"adm@example.com","profileId":"p-1"},
      |"ipAddress":"192.0.2.20","ownerDomain":"example.com",
      |"events":[{"type":"USER_SETTINGS","name":"CREATE_USER",
      |"parameters":[{"name":"USER_EMAIL","value":"new@example.com"}]}]}""".stripMargin.replace("\n", "")
    val out = GoogleWorkspaceAdmin(Seq(line).toDF("json"))
    assert(out.select("event.action").head.getString(0) == "CREATE_USER")
    assert(out.select("event.type").head.getSeq[String](0).toSet == Set("creation", "user"))
    assert(out.select("event.category").head.getSeq[String](0) == Seq("iam"))
    assert(out.select("user.email").head.getString(0) == "adm@example.com")
    assert(out.select(element_at(col("google_workspace.admin"), "USER_EMAIL"))
      .head.getString(0) == "new@example.com")
    assert(out.select("organization.id").head.getString(0) == "C1")
  }

  test("google_workspace alert: phishing source adds email category") {
    val line = """{"createTime":1591980072.0,"startTime":"2020-06-12T17:00:00Z",
      |"endTime":"2020-06-12T18:00:00Z","source":"Gmail phishing","customerId":"C1",
      |"alertId":"al-1","deleted":"false","etag":"e1","type":"User reported phishing",
      |"metadata":{"assignee":"sec@example.com","status":"NOT_STARTED","severity":"HIGH"},
      |"data":{"@type":"type.googleapis.com/google.apps.alertcenter.type.MailPhishing"}}"""
      .stripMargin.replace("\n", "")
    val out = GoogleWorkspaceAlert(Seq(line).toDF("json"))
    assert(out.select("event.kind").head.getString(0) == "alert")
    assert(out.select("event.category").head.getSeq[String](0)
      == Seq("email", "threat", "malware"))
    assert(out.select("google_workspace.alert.metadata.severity").head.getString(0) == "HIGH")
    assert(out.select("user.email").head.getSeq[String](0) == Seq("sec@example.com"))
    assert(out.select("event.start").head.getTimestamp(0).toInstant.toString
      == "2020-06-12T17:00:00Z")
  }

  test("onepassword item_usages: access event with client/os identity") {
    val line = """{"timestamp":1591980072,"uuid":"u-ev-1","action":"secure-copy",
      |"item_uuid":"item-9","vault_uuid":"vault-2","used_version":3,
      |"user":{"uuid":"usr-1","name":"Jo Doe","email":"jo@example.com"},
      |"client":{"app_name":"1Password Browser Extension","app_version":"20195",
      |"platform_name":"Chrome","os_name":"MacOSX","os_version":"10.15.6",
      |"ip_address":"198.51.100.8"}}""".stripMargin.replace("\n", "")
    val out = OnePasswordItemUsages(Seq(line).toDF("json"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("access"))
    assert(out.select("event.action").head.getString(0) == "secure-copy")
    assert(out.select("onepassword.item_uuid").head.getString(0) == "item-9")
    assert(out.select("os.name").head.getString(0) == "MacOSX")
    assert(out.select("related.user").head.getSeq[String](0).toSet
      == Set("usr-1", "jo@example.com", "Jo Doe"))
  }

  test("snyk vulnerabilities: CVE-else-SNYK enumeration, cvss score") {
    val cve = """{"issue":{"id":"SNYK-JS-X-1","url":"https://snyk.io/vuln/1","title":"Prototype Pollution",
      |"description":"bad","severity":"high","cvssScore":"7.5","CVSSv3":"CVSS:3.0/AV:N",
      |"isIgnored":false,"isPatchable":true,"packageManager":"npm","package":"lodash",
      |"version":"4.17.15","identifiers":{"CVE":["CVE-2020-1234"],"CWE":["CWE-400"]}},
      |"isFixed":false,"projectName":"api","org":{"name":"acme","id":"o-1"}}""".stripMargin.replace("\n", "")
    val alt = cve.replace("\"CVE\":[\"CVE-2020-1234\"],", "")
      .replace("{\"CVE\":[\"CVE-2020-1234\"]", "{")
      .replace("\"identifiers\":{", "\"identifiers\":{\"ALTERNATIVE\":[\"SNYK-JS-X-1\"],")
    val out = SnykVulnerabilities(Seq(cve, alt).toDF("json"))
    val rows = out.select("vulnerability.enumeration", "vulnerability.id",
      "vulnerability.score.base", "vulnerability.severity").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("CVE").getString(1) == "CVE-2020-1234")
    assert(rows("CVE").getDouble(2) == 7.5)
    assert(rows("SNYK").getString(1) == "SNYK-JS-X-1")
    assert(out.select("snyk.vulnerabilities.package_manager").head.getString(0) == "npm")
  }

  test("cloudtrail digest + insights tables") {
    val dg = """{"digestS3Bucket":"logs","digestS3Object":"AWSLogs/1/d.json.gz",
      |"digestStartTime":1591976472000,"digestEndTime":1591980072000,
      |"newestEventTime":1591980000000,"oldestEventTime":1591976500000,
      |"previousDigestSignature":"sigAB","digestSignatureAlgorithm":"SHA256withRSA",
      |"logFiles":[{"s3Object":"AWSLogs/1/x.json.gz","hashValue":"h1"}]}""".stripMargin.replace("\n", "")
    val outD = CloudTrailDigest(Seq(dg).toDF("json"))
    assert(outD.select("file.path").head.getString(0) == "AWSLogs/1/d.json.gz")
    assert(outD.select("related.hash").head.getSeq[String](0) == Seq("sigAB"))
    assert(outD.select("ts").head.getTimestamp(0).toInstant.getEpochSecond == 1591980072L)
    assert(outD.select("aws.cloudtrail.digest.log_files").head.getString(0).contains("h1"))

    val ins = """{"eventTime":"2020-06-12T17:21:12Z","eventSource":"cloudtrail.amazonaws.com",
      |"eventName":"StartLogging","awsRegion":"us-east-1","sourceIPAddress":"192.0.2.1",
      |"eventID":"ev-1","eventType":"AwsCloudTrailInsight",
      |"userIdentity":{"type":"AWSService","accountId":"123"},
      |"insightDetails":{"state":"Start","eventSource":"s3.amazonaws.com"}}""".stripMargin.replace("\n", "")
    val outI = CloudTrailInsights(Seq(ins).toDF("json"))
    assert(outI.select("aws.cloudtrail.flattened.insight_details").head.getString(0)
      .contains("\"state\":\"Start\""))
    assert(outI.select("event.action").head.getString(0) == "StartLogging")
  }

  test("panw globalprotect: VPN event with ip fallbacks and outcome") {
    val vals = Array.fill(42)("")
    vals(0) = "vsys1"; vals(1) = "gateway-auth"; vals(2) = "login"
    vals(3) = "SAML"; vals(4) = "tunnel"; vals(5) = "CORP\\jo"; vals(6) = "US"
    vals(7) = "LAPTOP-9"; vals(8) = "203.0.113.7"; vals(10) = "10.20.30.40"
    vals(12) = "host-id-1"; vals(13) = "SN-99"; vals(14) = "6.2.0"
    vals(15) = "Windows"; vals(16) = "Windows 11"; vals(17) = "1"
    vals(18) = "auth-ok"; vals(20) = "portal login succeeded"; vals(21) = "success"
    vals(22) = "US"; vals(23) = "5"; vals(24) = "manual"; vals(34) = "gw-east"
    vals(40) = "fw-east"
    val msg = "1,2024/01/05 10:11:12,0123456789,GLOBALPROTECT,0,2048," +
      "2024/01/05 10:11:13," + vals.mkString(",")
    val out = PanwGlobalProtect(Seq(msg).toDF("message"))
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("source.ip").head.getString(0) == "10.20.30.40")
    assert(out.select("source.nat.ip").head.getString(0) == "203.0.113.7")
    assert(out.select("host.name").head.getString(0) == "LAPTOP-9")
    assert(out.select("source.user.name").head.getString(0) == "jo")
    assert(out.select("panw.panos.gateway").head.getString(0) == "gw-east")
    assert(out.select("event.reason").head.getString(0) == "auth-ok")
  }

  test("panw threat: url subtype parses misc into url.*, alert taxonomy") {
    val vals = Array.fill(80)("")
    vals(0) = "203.0.113.9"; vals(1) = "198.51.100.2"; vals(4) = "block-threats"
    vals(7) = "web-browsing"; vals(9) = "untrust"; vals(10) = "trust"
    vals(17) = "41000"; vals(18) = "443"; vals(22) = "tcp"; vals(23) = "drop"
    vals(24) = "evil.test:8443/a/b.php?x=1"; vals(25) = "SQL Injection"
    vals(27) = "critical"; vals(28) = "0"; vals(52) = "fw-east"
    val msg = "1,2024/01/05 10:11:12,0123456789,THREAT,url,2048," +
      "2024/01/05 10:11:13," + vals.mkString(",")
    val out = PanwThreat(Seq(msg).toDF("message"))
    assert(out.select("event.kind").head.getString(0) == "alert")
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("network.direction").head.getString(0) == "inbound")
    assert(out.select("url.domain").head.getString(0) == "evil.test")
    assert(out.select("url.port").head.getInt(0) == 8443)
    assert(out.select("url.path").head.getString(0) == "/a/b.php")
    assert(out.select("url.query").head.getString(0) == "x=1")
    assert(out.select("panw.panos.threat.name").head.getString(0) == "SQL Injection")
    assert(out.select("log.level").head.getString(0) == "critical")
    assert(out.select("source.port").head.getInt(0) == 41000)
  }
}
