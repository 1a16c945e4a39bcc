package graft

import graft.operators.{Alerts, Detection}
import graft.sources.Framing
import graft.transform.managed.{VpcFlow, ZeekDns}
import org.apache.spark.sql.Row
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

  test("aws_elb: classic HTTP line maps to ECS http/source/tls") {
    import graft.transform.managed.AwsElb
    val line = "2015-05-13T23:39:43.945958Z my-loadbalancer 192.168.131.39:2817 10.0.0.1:80 0.000073 0.001048 0.000057 200 200 0 29 \"GET http://www.example.com:80/ HTTP/1.1\" \"curl/7.38.0\" - -"
    val out = AwsElb(Seq(line).toDF("message"))
    assert(out.select("aws.elb.name").head.getString(0) == "my-loadbalancer")
    assert(out.select("source.ip").head.getString(0) == "192.168.131.39")
    assert(out.select("source.port").head.getInt(0) == 2817)
    assert(out.select("aws.elb.backend.ip").head.getString(0) == "10.0.0.1")
    assert(out.select("http.response.status_code").head.getLong(0) == 200L)
    assert(out.select("http.request.method").head.getString(0) == "GET")
    assert(out.select("http.version").head.getString(0) == "1.1")
    assert(out.select("url.original").head.getString(0) == "http://www.example.com:80/")
    assert(out.select("url.domain").head.getString(0) == "www.example.com")
    assert(out.select("url.port").head.getLong(0) == 80L)
    assert(out.select("user_agent.original").head.getString(0) == "curl/7.38.0")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("event.category").head.getSeq[String](0) == Seq("web"))
    assert(out.select("aws.elb.protocol").head.getString(0) == "http")
    assert(out.select("aws.elb.request_processing_time.sec").head.getFloat(0) == 0.000073f)
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2015-05-13T23:39:43.945958Z")
  }

  test("aws_elb: ALB v2 line captures target group, trace id, actions, duration") {
    import graft.transform.managed.AwsElb
    val line = "http 2018-07-02T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 \"GET http://www.example.com:80/?a=1 HTTP/1.1\" \"curl/7.46.0\" - - arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 \"Root=1-58337262-36d228ad5d99923122bbe354\" \"-\" \"-\" 0 2018-07-02T22:22:48.364000Z \"forward\" \"-\" \"-\" \"10.0.0.1:80\" \"200\""
    val out = AwsElb(Seq(line).toDF("message"))
    assert(out.select("aws.elb.type").head.getString(0) == "http")
    assert(out.select("aws.elb.target_group.arn").head.getString(0)
      .endsWith("targetgroup/my-targets/73e2d6bc24d8a067"))
    assert(out.select("trace.id").head.getString(0) == "Root=1-58337262-36d228ad5d99923122bbe354")
    assert(out.select("aws.elb.action_executed").head.getSeq[String](0) == Seq("forward"))
    assert(out.select("aws.elb.target_status_code").head.getString(0) == "200")
    assert(out.select("url.query").head.getString(0) == "a=1")
    // duration = ts(22:23:00.186641) - start(22:22:48.364) in nanos
    assert(out.select("event.duration").head.getLong(0) == 11822641000L)
    assert(out.select("event.outcome").head.getString(0) == "success")
  }

  test("aws_elb: NLB tls line and classic TCP line take the non-http branches") {
    import graft.transform.managed.AwsElb
    val nlb = "tls 2.0 2018-12-20T02:59:40 my-nlb-c6e77e28c25b2234 g3d4b5e8bb8464cd 72.21.218.154:51341 172.100.100.185:443 5 2 98 246 - arn:aws:acm:us-east-2:123456789012:certificate/2a108f19 - ECDHE-RSA-AES128-SHA256 tlsv12 - my-nlb.elb.us-east-2.amazonaws.com"
    val tcp = "2015-05-13T23:39:43.945958Z my-loadbalancer 192.168.131.39:2817 10.0.0.1:80 0.001 0.000073 0.000049 - - 82 305 \"- - - \" \"-\" - -"
    val out = AwsElb(Seq(nlb, tcp).toDF("message"))
    val rows = out.selectExpr("aws.elb.protocol", "event.category", "source.bytes",
      "tls.version", "tls.version_protocol", "aws.elb.connection_time.ms",
      "aws.elb.type", "tls.cipher").collect()
    val nlbRow = rows.find(_.getString(6) == "tls").get
    val tcpRow = rows.find(_.getString(6) == null).get
    assert(nlbRow.getString(0) == "tcp" && nlbRow.getSeq[String](1) == Seq("network"))
    assert(nlbRow.getLong(2) == 98L)
    assert(nlbRow.isNullAt(3)) // "tlsv12" has no dotted version → VRL errs, stays unset
    assert(nlbRow.getString(4) == "tls")
    assert(nlbRow.getLong(5) == 5L)
    assert(nlbRow.getString(7) == "ECDHE-RSA-AES128-SHA256")
    assert(tcpRow.getString(0) == "tcp" && tcpRow.getLong(2) == 82L)
    assert(tcpRow.getSeq[String](1) == Seq("network"))
  }

  test("aws_s3access: server access log line maps to ECS web/event/tls") {
    import graft.transform.managed.S3Access
    val line = "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 [06/Feb/2019:00:00:38 +0000] 192.0.2.3 79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be 3E57427F3EXAMPLE REST.GET.VERSIONING - \"GET /awsexamplebucket1?versioning HTTP/1.1\" 200 - 113 - 7 - \"-\" \"S3Console/0.4\" - s9lzHYrFp76ZVxRcpX9+5cjAnEH2ROuNkd2BHfIa6UkFVdtjf5mKR3/eTPFvsiP/XV/VLi31234= SigV4 ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket1.s3.us-west-1.amazonaws.com TLSV1.2"
    val out = S3Access(Seq(line).toDF("message"))
    assert(out.select("aws.s3access.bucket").head.getString(0) == "awsexamplebucket1")
    assert(out.select("client.ip").head.getString(0) == "192.0.2.3")
    assert(out.select("event.id").head.getString(0) == "3E57427F3EXAMPLE")
    assert(out.select("event.action").head.getString(0) == "REST.GET.VERSIONING")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("event.duration").head.getLong(0) == 7000000L)
    assert(out.select("http.request.method").head.getString(0) == "GET")
    assert(out.select("http.response.status_code").head.getLong(0) == 200L)
    assert(out.select("http.response.body.bytes").head.getLong(0) == 113L)
    assert(out.select("url.original").head.getString(0) == "/awsexamplebucket1?versioning")
    assert(out.select("url.query").head.getString(0) == "versioning")
    assert(out.select("user_agent.original").head.getString(0) == "S3Console/0.4")
    assert(out.select("cloud.region").head.getString(0) == "us-west-1")
    assert(out.select("tls.version").head.getString(0) == "1.2")
    assert(out.select("tls.version_protocol").head.getString(0) == "tls")
    assert(out.select("tls.cipher").head.getString(0) == "ECDHE-RSA-AES128-GCM-SHA256")
    assert(out.select("related.user").head.getSeq[String](0).head.startsWith("79a59df9"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2019-02-06T00:00:38Z")
    assert(out.select("aws.s3access.http_status").head.getLong(0) == 200L)
  }

  test("aws_s3access: failed request with error code maps outcome failure") {
    import graft.transform.managed.S3Access
    val line = "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 [06/Feb/2019:00:01:00 +0000] 192.0.2.3 - 891CE47D2EXAMPLE REST.GET.LOGGING_STATUS - \"GET /awsexamplebucket1?logging HTTP/1.1\" 403 AccessDenied 243 - 11 - \"-\" \"S3Console/0.4\" - s9lzHYrFp76ZVxRcpX9+5cjAnEH2ROuNkd2BHfIa6UkFVdtjf5mKR3/eTPFvsiP/XV/VLi31234= SigV4 ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket1.s3.us-west-1.amazonaws.com TLSV1.2"
    val out = S3Access(Seq(line).toDF("message"))
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("event.code").head.getString(0) == "AccessDenied")
    assert(out.select("client.user.id").head.isNullAt(0)) // '-' requester
    assert(out.select("http.response.status_code").head.getLong(0) == 403L)
  }

  test("okta: session-start event maps categories, identities, outcome, UA") {
    import graft.transform.managed.Okta
    val line =
      """{"published":"2024-03-05T12:30:00.123Z","eventType":"user.session.start",
        |"displayMessage":"User login to Okta","uuid":"a1b2c3d4-0000-1111-2222-333344445555",
        |"actor":{"alternateId":"jdoe@example.com","displayName":"Jane Doe","id":"00u1abc","type":"User"},
        |"client":{"device":"Computer","ipAddress":"198.51.100.7","zone":"null",
        |"userAgent":{"browser":"CHROME","os":"Mac OS X","rawUserAgent":"Mozilla/5.0 Chrome/120.0"},
        |"geographicalContext":{"city":"Toronto","state":"Ontario","country":"Canada",
        |"geolocation":{"lat":43.6,"lon":-79.3}}},
        |"outcome":{"reason":null,"result":"SUCCESS"},
        |"target":[{"id":"0oa1xyz","type":"AppInstance","alternateId":"app","displayName":"MyApp"}],
        |"transaction":{"id":"tx1","type":"WEB"},
        |"securityContext":{"asNumber":13335,"asOrg":"ExampleNet","domain":"example.net","isProxy":false,"isp":"ExampleISP"},
        |"authenticationContext":{"externalSessionId":"102...","authenticationStep":0},
        |"debugContext":{"debugData":{"requestId":"req1","requestUri":"/api/v1/authn","threatSuspected":"false"}}}"""
        .stripMargin.replace("\n", "")
    val out = Okta(Seq(line).toDF("json"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2024-03-05T12:30:00.123Z")
    assert(out.select("event.category").head.getSeq[String](0) == Seq("authentication", "session"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("start", "user"))
    assert(out.select("event.action").head.getString(0) == "user.session.start")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("event.id").head.getString(0) == "a1b2c3d4-0000-1111-2222-333344445555")
    assert(out.select("source.ip").head.getString(0) == "198.51.100.7")
    assert(out.select("client.user.id").head.getString(0) == "00u1abc")
    assert(out.select("user.full_name").head.getString(0) == "Jane Doe")
    assert(out.select("client.geo.city_name").head.getString(0) == "Toronto")
    assert(out.select("client.as.organization.name").head.getString(0) == "ExampleNet")
    assert(out.select("okta.security_context.as.number").head.getLong(0) == 13335L)
    assert(out.select("related.user").head.getSeq[String](0) == Seq("Jane Doe"))
    assert(out.select("related.ip").head.getSeq[String](0) == Seq("198.51.100.7"))
    assert(out.select("user_agent.original").head.getString(0) == "Mozilla/5.0 Chrome/120.0")
    assert(out.select("user_agent.name").head.getString(0) == "Chrome")
    // AppInstance target is not a user/group target for a session event
    assert(out.select("user.target.id").head.isNullAt(0))
  }

  test("okta: group membership event picks group target and iam category") {
    import graft.transform.managed.Okta
    val line =
      """{"published":"2024-03-05T13:00:00Z","eventType":"group.user_membership.add",
        |"uuid":"u2","actor":{"displayName":"Admin","id":"00uadmin"},
        |"client":{"ipAddress":"null"},
        |"outcome":{"result":"DENY"},
        |"target":[{"id":"00u9","type":"User","displayName":"Bob","login":"bob@example.com"},
        |{"id":"00g7","type":"UserGroup","displayName":"Engineers"}]}"""
        .stripMargin.replace("\n", "")
    val out = Okta(Seq(line).toDF("json"))
    assert(out.select("event.category").head.getSeq[String](0) == Seq("iam"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("group", "change"))
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("user.target.group.name").head.getString(0) == "Engineers")
    assert(out.select("user.target.group.id").head.getString(0) == "00g7")
    // group.* event: user-target pick is gated on a user.* event_type
    assert(out.select("user.target.id").head.isNullAt(0))
    assert(out.select("client.ip").head.isNullAt(0)) // "null" literal cleaned
    assert(out.select("related.user").head.getSeq[String](0) == Seq("Admin"))
    assert(out.select("related.ip").head.getSeq[String](0) == Seq())
  }

  test("suricata: eve alert event maps rule/severity/endpoints/category") {
    import graft.transform.managed.Suricata
    val line =
      """{"timestamp":"2019-07-24T17:42:28.146831+0000","flow_id":1397900,
        |"event_type":"alert","src_ip":"10.10.3.2","src_port":53381,
        |"dest_ip":"10.10.1.10","dest_port":80,"proto":"TCP","app_proto":"http",
        |"ether":{"src_mac":"52:54:00:36:3e:ff","dest_mac":"52:54:00:a6:43:de"},
        |"alert":{"action":"blocked","signature_id":2101327,"signature":"GPL WEB_SERVER test",
        |"category":"Web Application Attack","severity":1,
        |"metadata":{"created_at":["2010_09_23"],"cve":["CVE-2020-0001"]}},
        |"flow":{"pkts_toserver":9,"pkts_toclient":5,"bytes_toserver":1111,"bytes_toclient":525,"state":"new"}}"""
        .stripMargin.replace("\n", "")
    val out = Suricata(Seq(line).toDF("json"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2019-07-24T17:42:28.146831Z")
    assert(out.select("event.kind").head.getString(0) == "alert")
    assert(out.select("event.category").head.getSeq[String](0) == Seq("network", "intrusion_detection"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("start", "denied"))
    assert(out.select("event.severity").head.getLong(0) == 1L)
    assert(out.select("rule.id").head.getString(0) == "2101327")
    assert(out.select("rule.name").head.getString(0) == "GPL WEB_SERVER test")
    assert(out.select("message").head.getString(0) == "Web Application Attack")
    assert(out.select("source.mac").head.getString(0) == "52-54-00-36-3E-FF")
    assert(out.select("source.ip").head.getString(0) == "10.10.3.2")
    assert(out.select("destination.port").head.getInt(0) == 80)
    assert(out.select("network.transport").head.getString(0) == "tcp")
    assert(out.select("network.protocol").head.getString(0) == "http")
    assert(out.select("source.packets").head.getLong(0) == 9L)
    assert(out.select("destination.bytes").head.getLong(0) == 525L)
    assert(out.select("related.ip").head.getSeq[String](0).toSet == Set("10.10.3.2", "10.10.1.10"))
    assert(out.select("suricata.eve.alert.metadata.cve").head.getSeq[String](0) == Seq("CVE-2020-0001"))
  }

  test("suricata: dns v2 answer yields answers array, resolved_ip, header flags") {
    import graft.transform.managed.Suricata
    val line =
      """{"timestamp":"2021-01-01T00:00:01.000000+0000","event_type":"dns",
        |"src_ip":"10.0.0.5","dest_ip":"8.8.8.8","proto":"UDP",
        |"dns":{"version":2,"type":"answer","id":1234,"rcode":"NOERROR",
        |"rrname":"example.com","rrtype":"A","rd":true,"ra":true,
        |"answers":[{"rrname":"example.com","rrtype":"A","rdata":"93.184.216.34","ttl":3600}]}}"""
        .stripMargin.replace("\n", "")
    val out = Suricata(Seq(line).toDF("json"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("protocol"))
    assert(out.select("network.protocol").head.getString(0) == "dns")
    assert(out.select("dns.id").head.getString(0) == "1234")
    assert(out.select("dns.question.name").head.getString(0) == "example.com")
    assert(out.select("dns.resolved_ip").head.getSeq[String](0) == Seq("93.184.216.34"))
    assert(out.select("dns.header_flags").head.getSeq[String](0) == Seq("RD", "RA"))
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("10.0.0.5", "8.8.8.8", "93.184.216.34"))
  }

  test("suricata: tls event parses version, sni, x509 subject, sha1") {
    import graft.transform.managed.Suricata
    val line =
      """{"timestamp":"2021-01-01T00:00:02.000000+0000","event_type":"tls",
        |"src_ip":"10.0.0.5","dest_ip":"1.2.3.4","proto":"TCP",
        |"tls":{"version":"TLS 1.2","sni":"example.com.","subject":"C=US, O=Example Org, CN=example.com",
        |"issuerdn":"C=US, O=Example CA, CN=Example Root","fingerprint":"5c:9c:ed:e6","serial":"0a:1b",
        |"session_resumed":false,"ja3":{"hash":"j3hash"},"ja3s":{"hash":"j3shash"}}}"""
        .stripMargin.replace("\n", "")
    val out = Suricata(Seq(line).toDF("json"))
    assert(out.select("tls.version").head.getString(0) == "1.2")
    assert(out.select("tls.version_protocol").head.getString(0) == "tls")
    assert(out.select("tls.client.server_name").head.getString(0) == "example.com")
    assert(out.select("destination.domain").head.getString(0) == "example.com")
    assert(out.select("tls.server.x509.subject.organization").head.getSeq[String](0) == Seq("Example Org"))
    assert(out.select("tls.server.x509.issuer.common_name").head.getSeq[String](0) == Seq("Example Root"))
    assert(out.select("tls.server.hash.sha1").head.getString(0) == "5C9CEDE6")
    assert(out.select("tls.server.x509.serial_number").head.getString(0) == "0a1b")
    assert(out.select("tls.client.ja3").head.getString(0) == "j3hash")
    assert(out.select("related.hosts").head.getSeq[String](0) == Seq("example.com"))
    assert(out.select("related.hash").head.getSeq[String](0) == Seq("5C9CEDE6"))
  }

  test("suricata: http event maps method/status/url and outcome") {
    import graft.transform.managed.Suricata
    val line =
      """{"timestamp":"2021-01-01T00:00:03.000000+0000","event_type":"http",
        |"src_ip":"10.0.0.5","dest_ip":"1.2.3.4","proto":"TCP",
        |"http":{"http_method":"GET","hostname":"example.com","url":"/index.html?x=1",
        |"status":404,"length":512,"http_refer":"http://ref.example.com"}}"""
        .stripMargin.replace("\n", "")
    val out = Suricata(Seq(line).toDF("json"))
    assert(out.select("event.category").head.getSeq[String](0) == Seq("network", "web"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("access", "protocol"))
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("http.request.method").head.getString(0) == "GET")
    assert(out.select("http.response.status_code").head.getLong(0) == 404L)
    assert(out.select("http.response.body.bytes").head.getLong(0) == 512L)
    assert(out.select("url.original").head.getString(0) == "/index.html?x=1")
    assert(out.select("url.path").head.getString(0) == "/index.html")
    assert(out.select("url.query").head.getString(0) == "x=1")
    assert(out.select("url.domain").head.getString(0) == "example.com")
    assert(out.select("destination.domain").head.getString(0) == "example.com")
  }

  test("github_audit: org membership event maps iam category and group") {
    import graft.transform.managed.GithubAudit
    val line =
      """{"_document_id":"abc123","created_at":1709640000123,"action":"org.update_member",
        |"actor":"octoadmin","actor_ip":"203.0.113.5","actor_location":{"country_code":"US"},
        |"user":"hubot","org":"acme","operation_type":"modify"}"""
        .stripMargin.replace("\n", "")
    val out = GithubAudit(Seq(line).toDF("json"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toEpochMilli == 1709640000123L)
    assert(out.select("event.action").head.getString(0) == "org.update_member")
    assert(out.select("github.category").head.getString(0) == "org")
    assert(out.select("event.category").head.getSeq[String](0)
      == Seq("configuration", "web", "iam"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("group", "user"))
    assert(out.select("user.name").head.getString(0) == "octoadmin")
    assert(out.select("user.target.name").head.getString(0) == "hubot")
    assert(out.select("group.name").head.getString(0) == "acme")
    assert(out.select("user.target.group.name").head.getString(0) == "acme")
    assert(out.select("client.ip").head.getString(0) == "203.0.113.5")
    assert(out.select("client.geo.country_iso_code").head.getString(0) == "US")
    assert(out.select("related.user").head.getSeq[String](0).toSet == Set("octoadmin", "hubot"))
    assert(out.select("related.ip").head.getSeq[String](0) == Seq("203.0.113.5"))
  }

  test("github_audit: repo create and workflow events derive types and duration") {
    import graft.transform.managed.GithubAudit
    val create = """{"_document_id":"d1","created_at":1709640001000,"action":"repo.create","actor":"dev1","repo":"acme/api","operation_type":"create"}"""
    val workflow = """{"_document_id":"d2","@timestamp":1709640002000,"action":"workflows.completed_workflow_run","actor":"dev2","repo":"acme/api","workflow_id":77,"workflow_run_id":991,"started_at":"2024-03-05T12:00:00Z","completed_at":"2024-03-05T12:00:30Z"}"""
    val out = GithubAudit(Seq(create, workflow).toDF("json")).orderBy("event.id")
    val rows = out.select("event.type", "github.workflow_run_id", "event.duration",
      "github.category", "event.id").collect()
    assert(rows(0).getSeq[String](0) == Seq("creation"))
    assert(rows(1).getSeq[String](0) == Seq("change"))
    assert(rows(1).getLong(1) == 991L)
    assert(rows(1).getLong(2) == 30000000000L) // 30 s in ns
    assert(rows(1).getString(3) == "workflows")
  }

  test("aws_waf: web acl log maps arn decomposition, action types, rule details") {
    import graft.transform.managed.AwsWaf
    val line =
      """{"timestamp":1576280412771,"webaclId":"arn:aws:wafv2:ap-southeast-2:111122223333:regional/webacl/STMTest/1EXAMPLE",
        |"action":"BLOCK","httpSourceName":"APIGW","httpSourceId":"10q1id","terminatingRuleId":"STMTest_SQLi_XSS",
        |"terminatingRuleType":"REGULAR","httpRequest":{"clientIp":"198.51.100.9","country":"AU","httpMethod":"POST",
        |"httpVersion":"HTTP/1.1","requestId":"rid1","uri":"/foo","args":"x=1",
        |"headers":[{"name":"Host","value":"api.example.com"}]},
        |"labels":[{"name":"awswaf:managed:aws:sqli"}],
        |"terminatingRuleMatchDetails":[{"conditionType":"SQL_INJECTION","sensitivityLevel":"HIGH",
        |"location":"UNKNOWN","matchedData":["10","AND","1"]}]}"""
        .stripMargin.replace("\n", "")
    val out = AwsWaf(Seq(line).toDF("json"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toEpochMilli == 1576280412771L)
    assert(out.select("event.action").head.getString(0) == "BLOCK")
    assert(out.select("event.type").head.getSeq[String](0) == Seq("access", "denied"))
    assert(out.select("cloud.account.id").head.getString(0) == "111122223333")
    assert(out.select("cloud.region").head.getString(0) == "ap-southeast-2")
    assert(out.select("cloud.service.name").head.getString(0) == "wafv2")
    assert(out.select("aws.waf.id").head.getString(0) == "regional/webacl/STMTest/1EXAMPLE")
    assert(out.select("http.version").head.getString(0) == "1.1")
    assert(out.select("network.protocol").head.getString(0) == "http")
    assert(out.select("network.transport").head.getString(0) == "tcp")
    assert(out.select("rule.id").head.getString(0) == "STMTest_SQLi_XSS")
    assert(out.select("source.ip").head.getString(0) == "198.51.100.9")
    assert(out.select("source.geo.country_iso_code").head.getString(0) == "AU")
    assert(out.select("tags").head.getSeq[String](0) == Seq("awswaf:managed:aws:sqli"))
    val det = out.select("aws.waf.terminating_rule_match_details").head.getSeq[Row](0)
    assert(det.head.getAs[String]("condition_type") == "SQL_INJECTION")
    assert(det.head.getAs[scala.collection.Seq[String]]("matched_data").toList
      == List("10", "AND", "1"))
  }

  test("route53 resolver: query log maps dns answers, related, network typing") {
    import graft.transform.managed.Route53Resolver
    val line =
      """{"version":"1.1","account_id":"111122223333","region":"us-east-1","vpc_id":"vpc-7example",
        |"query_timestamp":"2021-02-04T17:51:55Z","query_name":"cname.example.com.","query_type":"A",
        |"query_class":"IN","rcode":"NOERROR","answers":[
        |{"Rdata":"target.example.com.","Type":"CNAME","Class":"IN"},
        |{"Rdata":"203.0.113.9","Type":"A","Class":"IN"}],
        |"srcaddr":"10.0.0.4","srcport":"56067","transport":"UDP",
        |"srcids":{"instance":"i-0d15cd0d3example"},
        |"firewall_rule_action":"BLOCK","firewall_rule_group_id":"rslvr-frg-01",
        |"firewall_domain_list_id":"rslvr-fdl-01"}"""
        .stripMargin.replace("\n", "")
    val out = Route53Resolver(Seq(line).toDF("json"))
    assert(out.select("dns.question.name").head.getString(0) == "cname.example.com")
    assert(out.select("dns.response_code").head.getString(0) == "NOERROR")
    val answers = out.select("dns.answers").head.getSeq[Row](0)
    assert(answers(0).getAs[String]("data") == "target.example.com")
    assert(answers(0).getAs[String]("name") == "target.example.com") // CNAME naming
    assert(answers(1).getAs[String]("data") == "203.0.113.9")
    assert(out.select("related.ip").head.getSeq[String](0) == Seq("203.0.113.9"))
    assert(out.select("related.hosts").head.getSeq[String](0) == Seq("target.example.com"))
    assert(out.select("network.transport").head.getString(0) == "udp")
    assert(out.select("network.iana_number").head.getString(0) == "17")
    assert(out.select("network.type").head.getString(0) == "ipv4")
    assert(out.select("source.port").head.getInt(0) == 56067)
    assert(out.select("cloud.instance.id").head.getString(0) == "i-0d15cd0d3example")
    assert(out.select("aws.route53.firewall.action").head.getString(0) == "BLOCK")
    assert(out.select("event.outcome").head.getString(0) == "success")
  }

  test("gcp_audit: audit log maps identity, outcome, k8s; non-audit aborts") {
    import graft.transform.managed.GcpAudit
    val audit =
      """{"insertId":"ins1","logName":"projects/p1/logs/cloudaudit.googleapis.com%2Factivity",
        |"severity":"NOTICE","timestamp":"2021-10-20T11:49:29.101Z",
        |"resource":{"type":"gke_cluster","labels":{"project_id":"p1","cluster_name":"c1"}},
        |"protoPayload":{"@type":"type.googleapis.com/google.cloud.audit.AuditLog",
        |"methodName":"io.k8s.core.v1.configmaps.update","serviceName":"k8s.io",
        |"resourceName":"core/v1/namespaces/default/configmaps/cm1",
        |"authenticationInfo":{"principalEmail":"system:foo","principalSubject":"sub1"},
        |"authorizationInfo":[{"resource":"configmaps/cm1","permission":"io.k8s.update","granted":true}],
        |"requestMetadata":{"callerIp":"gce-internal-ip","callerSuppliedUserAgent":"kube/1.21"},
        |"status":{}}}"""
        .stripMargin.replace("\n", "")
    val nonAudit = """{"insertId":"x","protoPayload":{"@type":"other"}}"""
    val out = GcpAudit(Seq(audit, nonAudit).toDF("json"))
    assert(out.count() == 1) // non-audit entry aborted
    assert(out.select("event.id").head.getString(0) == "ins1")
    assert(out.select("event.provider").head.getString(0) == "activity")
    assert(out.select("cloud.project.id").head.getString(0) == "p1")
    assert(out.select("orchestrator.type").head.getString(0) == "kubernetes")
    assert(out.select("orchestrator.cluster.name").head.getString(0) == "c1")
    assert(out.select("client.user.email").head.getString(0) == "system:foo")
    assert(out.select("source.ip").head.isNullAt(0)) // internal marker filtered
    assert(out.select("user_agent.original").head.getString(0) == "kube/1.21")
    assert(out.select("event.action").head.getString(0) == "io.k8s.core.v1.configmaps.update")
    assert(out.select("cloud.service.name").head.getString(0) == "k8s.io")
    // no status code, single authz entry granted → success
    assert(out.select("event.outcome").head.getString(0) == "success")
  }

  test("cloudflare dns + audit tables map per-table ECS shapes") {
    import graft.transform.managed.Cloudflare
    val dnsLine =
      """{"Timestamp":1591980072,"SourceIP":"203.0.113.50","QueryName":"cf.example.com",
        |"QueryType":1,"ColoCode":"SJC","EDNSSubnet":"203.0.113.0","EDNSSubnetLength":24,
        |"ResponseCached":false,"ResponseCode":0}""".stripMargin.replace("\n", "")
    val d = Cloudflare.dns(Seq(dnsLine).toDF("json"))
    assert(d.select("dns.question.name").head.getString(0) == "cf.example.com")
    assert(d.select("cloudflare.dns.response.code").head.getLong(0) == 0L)
    assert(d.select("related.ip").head.getSeq[String](0) == Seq("203.0.113.50", "203.0.113.0"))
    assert(d.select("ts").head.getTimestamp(0).toInstant.getEpochSecond == 1591980072L)

    val auditLine =
      """{"When":1591980073,"ID":"aud1","ActionType":"token_create","ActionResult":true,
        |"ActorEmail":"admin@example.com","ActorID":"actor1","ActorIP":"198.51.100.1",
        |"ActorType":"user","Interface":"API","ResourceID":"res1","ResourceType":"account",
        |"NewValue":"{\"k\":1}"}""".stripMargin.replace("\n", "")
    val a = Cloudflare.audit(Seq(auditLine).toDF("json"))
    assert(a.select("event.action").head.getString(0) == "token_create")
    assert(a.select("event.outcome").head.getString(0) == "success")
    assert(a.select("user.email").head.getString(0) == "admin@example.com")
    assert(a.select("event.provider").head.getString(0) == "API")
    assert(a.select("cloudflare.audit.resource.type").head.getString(0) == "account")
    assert(a.select("related.user").head.getSeq[String](0) == Seq("actor1"))
  }

  test("cloudflare firewall_event: rule/action/http, protocol grok, UA parse") {
    import graft.transform.managed.Cloudflare
    val line =
      """{"Datetime":1591980072,"Action":"Block","ClientRequestMethod":"GET",
        |"EdgeResponseStatus":403,"RuleID":"r123","Ref":"ref-1","Description":"SQLi block",
        |"ClientASN":13335,"ClientASNDescription":"CLOUDFLARENET","ClientCountry":"us",
        |"ClientIP":"203.0.113.9","ClientIPClass":"noRecord","ClientRefererHost":"ref.example.com",
        |"ClientRequestHost":"www.example.com","ClientRequestPath":"/login",
        |"ClientRequestProtocol":"HTTP/1.1","ClientRequestQuery":"?id=1","ClientRequestScheme":"https",
        |"ClientRequestUserAgent":"Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        |"EdgeColoCode":"SJC","Kind":"firewall","MatchIndex":0,"Metadata":{"type":"customPage"},
        |"OriginResponseStatus":0,"OriginatorRayID":"00","RayID":"ray77","Source":"firewallrules"}"""
        .stripMargin.replace("\n", "")
    val f = Cloudflare.firewallEvent(Seq(line).toDF("json"))
    assert(f.select("event.action").head.getString(0) == "block")
    assert(f.select("rule.id").head.getString(0) == "r123")
    assert(f.select("rule.description").head.getString(0) == "SQLi block")
    assert(f.select("http.response.status_code").head.getLong(0) == 403L)
    assert(f.select("network.protocol").head.getString(0) == "http")
    assert(f.select("http.version").head.getString(0) == "1.1")
    assert(f.select("source.as.number").head.getLong(0) == 13335L)
    assert(f.select("user_agent.name").head.getString(0) == "Chrome")
    assert(f.select("user_agent.os.full").head.getString(0) == "Windows 10")
    assert(f.select("cloudflare.firewall_event.ray.id").head.getString(0) == "ray77")
    assert(f.select("cloudflare.firewall_event.metadata").head.getString(0)
      == """{"type":"customPage"}""")
    assert(f.select("related.hosts").head.getSeq[String](0).toSet
      == Set("ref.example.com", "www.example.com"))
    assert(f.select("ts").head.getTimestamp(0).toInstant.getEpochSecond == 1591980072L)
  }

  test("cloudflare http_request: edge/cache/origin telemetry, tls split") {
    import graft.transform.managed.Cloudflare
    val line =
      """{"EdgeStartTimestamp":1591980072,"EdgeEndTimestamp":1591980073,"OriginIP":"10.1.2.3",
        |"ClientRequestMethod":"POST","EdgeResponseContentType":"application/json",
        |"EdgeResponseStatus":201,"EdgeResponseBytes":512,"ClientASN":64496,"ClientCountry":"de",
        |"ClientIP":"198.51.100.7","ClientDeviceType":"desktop","BotScore":30,"BotScoreSrc":"ml",
        |"CacheCacheStatus":"miss","CacheResponseBytes":600,"CacheResponseStatus":201,
        |"CacheTieredFill":false,"ClientRequestBytes":1024,"ClientRequestHost":"api.example.com",
        |"ClientRequestPath":"/v1/items","ClientRequestProtocol":"HTTP/2",
        |"ClientRequestScheme":"https","ClientRequestURI":"/v1/items?x=1",
        |"ClientRequestUserAgent":"curl/8.5.0","ClientSSLCipher":"AEAD-AES128-GCM-SHA256",
        |"ClientSSLProtocol":"TLSv1.3","EdgeServerIP":"172.16.0.9","OriginResponseStatus":201,
        |"OriginResponseBytes":480,"OriginResponseDurationMs":41,"RayID":"ray88",
        |"WAFAction":"unknown","WAFRuleID":"","ZoneID":5}""".stripMargin.replace("\n", "")
    val h = Cloudflare.httpRequest(Seq(line).toDF("json"))
    assert(h.select("http.request.method").head.getString(0) == "POST")
    assert(h.select("http.response.status_code").head.getLong(0) == 201L)
    assert(h.select("http.response.mime_type").head.getString(0) == "application/json")
    assert(h.select("network.protocol").head.getString(0) == "http")
    assert(h.select("http.version").head.getString(0) == "2")
    assert(h.select("tls.version_protocol").head.getString(0) == "tls")
    assert(h.select("tls.version").head.getString(0) == "1.3")
    assert(h.select("destination.ip").head.getString(0) == "10.1.2.3")
    assert(h.select("user_agent.name").head.getString(0) == "curl")
    assert(h.select("user_agent.version").head.getString(0) == "8.5.0")
    assert(h.select("cloudflare.http_request.cache.status").head.getString(0) == "miss")
    assert(h.select("cloudflare.http_request.bot.score.value").head.getLong(0) == 30L)
    assert(h.select("cloudflare.http_request.origin.response.duration_ms").head.getLong(0) == 41L)
    assert(h.select("related.ip").head.getSeq[String](0).toSet
      == Set("198.51.100.7", "10.1.2.3", "172.16.0.9"))
  }

  test("cloudflare nel_report: error type and client asn") {
    import graft.transform.managed.Cloudflare
    val line = """{"Timestamp":1591980072,"Type":"network-error","ClientIPASN":"64496",
      |"ClientIPASNDescription":"EXAMPLE-AS","ClientIPCountry":"US",
      |"LastKnownGoodColoCode":"SJC","Phase":"connection"}""".stripMargin.replace("\n", "")
    val n = Cloudflare.nelReport(Seq(line).toDF("json"))
    assert(n.select("error.type").head.getString(0) == "network-error")
    assert(n.select("cloudflare.nel_report.client.ip.asn.value").head.getLong(0) == 64496L)
    assert(n.select("cloudflare.nel_report.last_known_good.colo.code").head.getString(0) == "SJC")
    assert(n.select("cloudflare.nel_report.phase").head.getString(0) == "connection")
  }

  test("cloudflare network_analytics: pass/drop outcome, L3/L4 lift, geo hashes") {
    import graft.transform.managed.Cloudflare
    val line = """{"Datetime":1591980072,"Outcome":"drop","Direction":"ingress",
      |"Verdict":"drop","IPSourceAddress":"203.0.113.9","SourcePort":42001,
      |"SourceASN":"64500","SourceCountry":"US","SourceGeoHash":"9q8yy",
      |"IPDestinationAddress":"198.51.100.2","DestinationPort":443,
      |"DestinationASN":"13335","DestinationGeoHash":"9q9hv","IPProtocolName":"TCP",
      |"IPProtocol":6,"IPTtl":54,"TCPFlags":2,"TCPFlagsString":"S","TCPWindowSize":64240,
      |"RuleID":"rule-7","AttackID":"atk-1","MitigationSystem":"flowtrackd",
      |"ColoGeoHash":"9q8zz","ColoName":"SJC"}""".stripMargin.replace("\n", "")
    val n = Cloudflare.networkAnalytics(Seq(line).toDF("json"))
    assert(n.select("event.outcome").head.getString(0) == "failure")
    assert(n.select("network.transport").head.getString(0) == "tcp")
    assert(n.select("source.as.number").head.getLong(0) == 64500L)
    assert(n.select("rule.id").head.getString(0) == "rule-7")
    assert(n.select("cloudflare.network_analytics.tcp.flags.string").head.getString(0) == "S")
    assert(n.select("cloudflare.network_analytics.ip.ttl.value").head.getLong(0) == 54L)
    assert(n.select("related.ip").head.getSeq[String](0).toSet
      == Set("203.0.113.9", "198.51.100.2"))
    assert(n.select("related.hash").head.getSeq[String](0).toSet
      == Set("9q8yy", "9q9hv", "9q8zz"))
  }

  test("cloudflare spectrum_event: session lifecycle, tls split, byte directions") {
    import graft.transform.managed.Cloudflare
    val line = """{"Timestamp":1591980072,"ConnectTimestamp":1591980070,
      |"DisconnectTimestamp":1591980090,"Event":"Disconnect","Application":"app-1",
      |"Status":0,"ClientAsn":64496,"ClientBytes":2048,"ClientCountry":"de",
      |"ClientIP":"198.51.100.7","ClientPort":50123,"ClientProto":"TCP",
      |"ClientTlsProtocol":"TLSv1.2","ClientTlsCipher":"AES128","ColoCode":"FRA",
      |"IpFirewall":true,"OriginBytes":4096,"OriginIP":"10.1.2.3","OriginPort":443,
      |"OriginProto":"TCP","OriginTlsMode":"full","ProxyProtocol":"off"}""".stripMargin.replace("\n", "")
    val s = Cloudflare.spectrumEvent(Seq(line).toDF("json"))
    assert(s.select("event.action").head.getString(0) == "disconnect")
    assert(s.select("event.start").head.getTimestamp(0).toInstant.getEpochSecond == 1591980070L)
    assert(s.select("event.end").head.getTimestamp(0).toInstant.getEpochSecond == 1591980090L)
    assert(s.select("source.bytes").head.getLong(0) == 2048L)
    assert(s.select("destination.bytes").head.getLong(0) == 4096L)
    assert(s.select("tls.version_protocol").head.getString(0) == "tls")
    assert(s.select("tls.version").head.getString(0) == "1.2")
    assert(s.select("network.transport").head.getString(0) == "tcp")
    assert(s.select("cloudflare.spectrum_event.origin.tls.mode").head.getString(0) == "full")
  }

  test("crowdstrike falcon: detection summary branch — alert kind, hashes, threat") {
    import graft.transform.managed.CrowdstrikeFalcon
    val line =
      """{"metadata":{"eventType":"DetectionSummaryEvent","eventCreationTime":1591980072000,
        |"offset":12,"customerIDString":"cust1","version":"1.0"},
        |"event":{"UserName":"alice","ComputerName":"HOST-1","MachineDomain":"CORP",
        |"SensorId":"sen-1","CommandLine":"  powershell.exe -enc AAA  ",
        |"ProcessId":"4242","ParentImageFileName":"C:\\Windows\\explorer.exe",
        |"ParentCommandLine":"explorer.exe","PatternDispositionDescription":"Prevention, process killed.",
        |"FalconHostLink":"https://falcon.crowdstrike.com/x","Severity":"4",
        |"DetectName":"NtdsFileAccessAttempt","DetectDescription":"Credential theft attempt",
        |"FileName":"powershell.exe","SHA256String":"a1b2","MD5String":"00000000",
        |"SHA1String":"c3d4","Technique":"Credential Dumping","Tactic":"Credential Access",
        |"LocalIP":"10.0.0.5"}}""".stripMargin.replace("\n", "")
    val out = CrowdstrikeFalcon(Seq(line).toDF("json"))
    assert(out.select("event.kind").head.getString(0) == "alert")
    assert(out.select("event.category").head.getSeq[String](0) == Seq("malware"))
    assert(out.select("event.severity").head.getLong(0) == 4L)
    assert(out.select("process.pid").head.getLong(0) == 4242L)
    assert(out.select("process.executable").head.getString(0) == "powershell.exe")
    assert(out.select("process.args").head.getSeq[String](0)
      == Seq("powershell.exe", "-enc", "AAA"))
    assert(out.select("threat.tactic.name").head.getSeq[String](0) == Seq("credential access"))
    // all-zero md5 placeholder excluded; real hashes kept
    assert(out.select("related.hash").head.getSeq[String](0).toSet == Set("a1b2", "c3d4"))
    assert(out.select("user.domain").head.getString(0) == "CORP")
    assert(out.select("source.ip").head.getString(0) == "10.0.0.5")
    assert(out.select("ts").head.getTimestamp(0).toInstant.getEpochSecond == 1591980072L)
  }

  test("crowdstrike falcon: firewall match orients endpoints by direction") {
    import graft.transform.managed.CrowdstrikeFalcon
    val mk = (dir: String) =>
      s"""{"metadata":{"eventType":"FirewallMatchEvent","eventCreationTime":1591980072},
        |"event":{"RuleName":"Block RDP","RuleId":"fw-1","RuleGroupName":"grp",
        |"ConnectionDirection":"$dir","LocalAddress":"10.0.0.5","LocalPort":3389,
        |"RemoteAddress":"203.0.113.9","RemotePort":50111,"Ipv":"ipv4",
        |"PID":"77","HostName":"HOST-2","EventType":"FirewallRuleIP4Matched"}}""".stripMargin.replace("\n", "")
    val out = CrowdstrikeFalcon(Seq(mk("1"), mk("0")).toDF("json"))
      .orderBy("network.direction")
    val rows = out.select("network.direction", "source.ip", "destination.ip",
      "source.port", "destination.port").collect()
    assert(rows(0).getString(0) == "egress" && rows(0).getString(1) == "10.0.0.5"
      && rows(0).getString(2) == "203.0.113.9" && rows(0).getLong(4) == 50111L)
    assert(rows(1).getString(0) == "ingress" && rows(1).getString(1) == "203.0.113.9"
      && rows(1).getString(2) == "10.0.0.5" && rows(1).getLong(4) == 3389L)
    assert(out.select("rule.name").head.getString(0) == "Block RDP")
    assert(out.select("message").head.getString(0) == "Firewall Rule 'Block RDP' triggered")
  }

  test("crowdstrike falcon: auth audit and remote response branches") {
    import graft.transform.managed.CrowdstrikeFalcon
    val auth = """{"metadata":{"eventType":"AuthActivityAuditEvent","eventCreationTime":1591980072},
      |"event":{"UserId":"bob@example.com","UserIp":"198.51.100.7",
      |"OperationName":"userAuthenticate","ServiceName":"CrowdStrike Authentication",
      |"Success":true}}""".stripMargin.replace("\n", "")
    val rrEnd = """{"metadata":{"eventType":"RemoteResponseSessionEndEvent","eventCreationTime":1591980073},
      |"event":{"UserName":"admin1","HostnameField":"HOST-3"}}""".stripMargin.replace("\n", "")
    val out = CrowdstrikeFalcon(Seq(auth, rrEnd).toDF("json")).orderBy("ts")
    val a = out.filter(col("event.action") === "userAuthenticate")
    assert(a.select("event.category").head.getSeq[String](0) == Seq("authentication"))
    assert(a.select("event.outcome").head.getString(0) == "success")
    assert(a.select("user.email").head.getString(0) == "bob@example.com")
    assert(a.select("source.ip").head.getString(0) == "198.51.100.7")
    val r = out.filter(col("event.action") === "remote_response_session_end_event")
    assert(r.select("event.type").head.getSeq[String](0) == Seq("end"))
    assert(r.select("message").head.getString(0) == "Remote response session ended.")
    assert(r.select("related.hosts").head.getSeq[String](0) == Seq("HOST-3"))
    assert(r.select("event.outcome").head.getString(0) == "unknown")
  }

  test("matano_alerts re-ingest: ISO timestamps parse, rule metadata kept") {
    import graft.transform.managed.MatanoAlerts
    val line = """{"ts":"2024-01-01T00:10:00Z","event":{"kind":"signal","id":"e1"},
      |"message":"threshold breach","matano":{"table":"events","alert":{"id":"al-1",
      |"dedupe":"k1","severity":"notice","activated":true,
      |"first_matched_at":"2024-01-01T00:00:00Z",
      |"original_timestamp":"2024-01-01T00:09:30Z",
      |"rule":{"name":"r1","severity":"notice","threshold":2,
      |"deduplication_window":900}}}}""".stripMargin.replace("\n", "")
    val out = MatanoAlerts(Seq(line).toDF("json"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2024-01-01T00:10:00Z")
    assert(out.select("matano.alert.first_matched_at").head.getTimestamp(0)
      .toInstant.toString == "2024-01-01T00:00:00Z")
    assert(out.select("matano.alert.rule.threshold").head.getInt(0) == 2)
    assert(out.select("matano.alert.activated").head.getBoolean(0))
    // no-ts records abort
    assert(MatanoAlerts(Seq("""{"message":"x"}""").toDF("json")).count() == 0)
  }

  test("aad auditlogs: category/opType refine event.type, targets snake_case") {
    import graft.transform.managed.AadAudit
    val line =
      """{"id":"a1","time":"2022-07-19T18:40:00Z","operationName":"Add user","category":"AuditLogs",
        |"tenantId":"t-1","correlationId":"c-1","durationMs":12,"callerIpAddress":"192.0.2.20",
        |"Level":"4","properties":{"category":"UserManagement","operationType":"Add",
        |"activityDateTime":"2022-07-19T18:40:00.5Z","activityDisplayName":"Add user",
        |"result":"success","resultReason":"","loggedByService":"Core Directory",
        |"additionalDetails":[{"key":"UserType","value":"Member"}],
        |"initiatedBy":{"user":{"id":"u-9","displayName":"Jo Admin",
        |"ipAddress":"192.0.2.20","userPrincipalName":"jo@example.com"}},
        |"targetResources":[{"id":"tr-1","displayName":"New User","type":"User",
        |"userPrincipalName":"new@example.com","modifiedProperties":[
        |{"displayName":"AccountEnabled","newValue":"[true]","oldValue":"[]"}]}]}}"""
        .stripMargin.replace("\n", "")
    val a = AadAudit(Seq(line).toDF("json"))
    assert(a.select("event.type").head.getSeq[String](0) == Seq("change", "user", "creation"))
    assert(a.select("event.outcome").head.getString(0) == "success")
    assert(a.select("event.action").head.getString(0) == "Add user")
    assert(a.select("event.duration").head.getLong(0) == 12000000L)
    assert(a.select("azure.tenant_id").head.getString(0) == "t-1")
    assert(a.select("user.name").head.getString(0) == "jo@example.com")
    assert(a.select("source.ip").head.getString(0) == "192.0.2.20")
    assert(a.select("azure.aad_auditlogs.operation_type").head.getString(0) == "Add")
    val tr = a.select("azure.aad_auditlogs.target_resources").head.getSeq[Row](0)
    assert(tr.head.getAs[String]("user_principal_name") == "new@example.com")
    assert(tr.head.getAs[Seq[Row]]("modified_properties").head
      .getAs[String]("display_name") == "AccountEnabled")
    assert(a.select("related.user").head.getSeq[String](0).toSet
      == Set("u-9", "Jo Admin", "jo@example.com"))
    assert(a.select("ts").head.getTimestamp(0).toInstant.getEpochSecond == 1658256000L)
  }

  test("duo auth: ip:port split, identities, outcome; empty response aborts") {
    import graft.transform.managed.DuoAuth
    val line =
      """{"timestamp":1532951962,"result":"success","reason":"user_approved","event_type":"authentication",
        |"factor":"duo_push","txid":"tx-1","email":"jdoe@example.com",
        |"user":{"key":"DU1","name":"jdoe","groups":["g1","g2"]},
        |"access_device":{"ip":"192.0.2.7:50022","hostname":"laptop-1","browser":"Chrome",
        |"browser_version":"67.0","os":"Mac OS X","os_version":"10.14.1",
        |"location":{"city":"Ann Arbor","country":"United States","state":"Michigan"}},
        |"auth_device":{"ip":"192.0.2.8","name":"+1 555-0100",
        |"location":{"city":"Ann Arbor","country":"United States","state":"Michigan"}},
        |"application":{"key":"DIY2","name":"Web SDK"}}""".stripMargin.replace("\n", "")
    val aborted = """{"timestamp":1532951963,"response":[],"result":"success"}"""
    val out = DuoAuth(Seq(line, aborted).toDF("json"))
    assert(out.count() == 1) // empty-response event aborted
    assert(out.select("source.ip").head.getString(0) == "192.0.2.7")
    assert(out.select("source.port").head.getInt(0) == 50022)
    assert(out.select("source.address").head.getString(0) == "laptop-1")
    assert(out.select("user.name").head.getString(0) == "jdoe")
    assert(out.select("source.user.group.name").head.getString(0) == "g1, g2")
    assert(out.select("user_agent.os.name").head.getString(0) == "Mac OS X")
    assert(out.select("duo.auth.factor").head.getString(0) == "duo_push")
    assert(out.select("duo.auth.auth_device.ip").head.getString(0) == "192.0.2.8")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("192.0.2.7", "192.0.2.8"))
    assert(out.select("related.hosts").head.getSeq[String](0) == Seq("laptop-1"))
  }

  test("s3inventory: csv manifest line maps file shape and md5 relation") {
    import graft.transform.managed.S3Inventory
    val line = "\"my-bucket\",\"photos/cat.jpg\",\"v1\",\"true\",\"false\",\"102400\"," +
      "\"2024-02-01T00:00:00.000Z\",\"d41d8cd98f00b204e9800998ecf8427e\",\"STANDARD\",\"false\"," +
      "\"\",\"SSE-S3\",\"\",\"\",\"\",\"\",\"ENABLED\",\"SHA256\""
    val out = S3Inventory(Seq(line).toDF("message"))
    assert(out.select("file.path").head.getString(0) == "s3://my-bucket/photos/cat.jpg")
    assert(out.select("file.size").head.getLong(0) == 102400L)
    assert(out.select("file.hash.md5").head.getString(0) == "d41d8cd98f00b204e9800998ecf8427e")
    assert(out.select("aws.s3inventory.is_latest").head.getBoolean(0))
    assert(out.select("aws.s3inventory.storage_class").head.getString(0) == "STANDARD")
    assert(out.select("related.hash").head.getSeq[String](0).head.startsWith("d41d8"))
    assert(out.select("cloud.service.name").head.getString(0) == "s3")
  }

  test("config_history: configuration item maps resource, tags, event typing") {
    import graft.transform.managed.ConfigHistory
    val line =
      """{"version":"1.3","configurationItemCaptureTime":"2024-01-15T10:00:00.000Z",
        |"configurationItemStatus":"ResourceDiscovered","configurationItemMD5Hash":"abc123",
        |"configurationStateId":"1705312800000","arn":"arn:aws:sqs:us-east-1:111122223333:q1",
        |"resourceType":"AWS::SQS::Queue","resourceId":"q1","resourceName":"my-queue",
        |"awsRegion":"us-east-1","awsAccountId":"111122223333","availabilityZone":"Not Applicable",
        |"relationships":[{"resourceName":"vpc-1","resourceType":"AWS::EC2::VPC",
        |"resourceId":"vpc-1"," relationshipName":"x","relationshipName":" Is contained in "}],
        |"tags":{"env":"prod","team":"sec"}}""".stripMargin.replace("\n", "")
    val out = ConfigHistory(Seq(line).toDF("json"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("creation"))
    assert(out.select("cloud.service.name").head.getString(0) == "sqs")
    assert(out.select("cloud.availability_zone").head.isNullAt(0))
    assert(out.select("aws.config_history.resource.name").head.getString(0) == "my-queue")
    val rel = out.select("aws.config_history.relationship").head.getSeq[Row](0)
    assert(rel.head.getAs[String]("name") == "Is contained in")
    assert(out.select("tags").head.getSeq[String](0).toSet == Set("env=prod", "team=sec"))
    assert(out.select("event.hash").head.getString(0) == "abc123")
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2024-01-15T10:00:00Z")
  }

  test("teleport: session and network audit events map ECS process/network") {
    import graft.transform.managed.Teleport
    val cmd =
      """{"event":"session.command","time":"2022-06-20T19:03:54.626Z","uid":"u1","code":"T4000I",
        |"cluster_name":"c1","user":"alice","login":"root","server_hostname":"node-1","sid":"s1",
        |"program":"bash","path":"/usr/bin/bash","argv":["-c","ls"],"return_code":0,
        |"pid":100,"ppid":99,"addr.remote":"203.0.113.9:45022","addr.local":"10.0.0.5:3022",
        |"success":true}""".stripMargin.replace("\n", "")
    val net =
      """{"event":"session.network","time":"2022-06-20T19:04:00.000Z","uid":"u2","code":"T4002I",
        |"user":"alice","login":"root","server_hostname":"node-1","dst_addr":"198.51.100.7",
        |"dst_port":443,"src_addr":"10.0.0.5","version":4,"participants":["alice","bob"]}"""
        .stripMargin.replace("\n", "")
    val out = Teleport(Seq(cmd, net).toDF("json")).orderBy("event.id")
    val rows = out.selectExpr("event.action", "process.name", "source.ip", "source.port",
      "event.outcome", "network.type", "destination.port", "related.user",
      "event.category").collect()
    assert(rows(0).getString(0) == "session.command")
    assert(rows(0).getString(1) == "bash")
    assert(rows(0).getString(2) == "203.0.113.9" && rows(0).getInt(3) == 45022)
    assert(rows(0).getString(4) == "success")
    assert(rows(1).getString(0) == "session.network")
    assert(rows(1).getString(5) == "ipv4" && rows(1).getInt(6) == 443)
    assert(rows(1).getSeq[String](7).toSet == Set("alice", "root", "bob"))
    assert(rows(1).getSeq[String](8) == Seq("network", "session").take(1)) // network only
  }

  test("1password signin: outcome mapping, identity fan-out, no-ts abort") {
    import graft.transform.managed.OnePassword
    val ok =
      """{"uuid":"e1","session_uuid":"s1","timestamp":"2023-03-15T12:00:00Z",
        |"category":"firewall_reported_success","type":"credentials_ok","country":"CA",
        |"target_user":{"uuid":"U7","name":"Jane Doe","email":"jane@example.com"},
        |"client":{"app_name":"1Password CLI","app_version":"2.16","os_name":"macOS",
        |"os_version":"13.2","ip_address":"203.0.113.1"}}""".stripMargin.replace("\n", "")
    val noTs = """{"uuid":"e2","category":"success"}"""
    val out = OnePassword(Seq(ok, noTs).toDF("json"))
    assert(out.count() == 1)
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("event.action").head.getString(0) == "firewall_reported_success")
    assert(out.select("user.email").head.getString(0) == "jane@example.com")
    assert(out.select("os.name").head.getString(0) == "macOS")
    assert(out.select("source.ip").head.getString(0) == "203.0.113.1")
    assert(out.select("related.user").head.getSeq[String](0).toSet
      == Set("U7", "jane@example.com", "Jane Doe"))
    assert(out.select("onepassword.client.app_name").head.getString(0) == "1Password CLI")
  }

  test("snyk audit: vendor ids and action map; ts from created") {
    import graft.transform.managed.SnykAudit
    val line =
      """{"groupId":"g1","orgId":"o1","projectId":"p1","userId":"u1",
        |"event":"org.project.test","created":"2023-05-01T09:30:00.000Z",
        |"content":"{\"after\":{}}"}""".stripMargin.replace("\n", "")
    val out = SnykAudit(Seq(line).toDF("json"))
    assert(out.select("event.action").head.getString(0) == "org.project.test")
    assert(out.select("user.group.id").head.getString(0) == "g1")
    assert(out.select("snyk.audit.org_id").head.getString(0) == "o1")
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2023-05-01T09:30:00Z")
  }

  test("o365 audit: record types, AAD user CRUD, sts logon, sp file ops") {
    import graft.transform.managed.O365Audit
    val aad =
      """{"CreationTime":"2020-02-07T16:43:53","Id":"id-aad","Operation":"Add user.",
        |"OrganizationId":"org1","RecordType":8,"ResultStatus":"Success","UserType":4,
        |"UserId":"admin@contoso.com","Workload":"AzureActiveDirectory",
        |"ObjectId":"newuser@contoso.com","ActorIpAddress":"198.51.100.9"}"""
        .stripMargin.replace("\n", "")
    val sp =
      """{"CreationTime":"2020-02-07T17:00:00Z","Id":"id-sp","Operation":"FileDeleted",
        |"RecordType":6,"UserId":"jdoe@contoso.com","Workload":"SharePoint",
        |"ObjectId":"https://contoso.sharepoint.com/x/doc.docx","ClientIP":"203.0.113.2",
        |"SourceRelativeUrl":"x","SourceFileName":"doc.docx","SourceFileExtension":"docx",
        |"Parameters":[{"Name":"Mailbox","Value":"m1"},{"Name":"Empty"}]}"""
        .stripMargin.replace("\n", "")
    val out = O365Audit(Seq(aad, sp).toDF("json")).orderBy("event.id")
    val rows = out.selectExpr("event.code", "event.action", "event.category",
      "event.type", "user.target.id", "source.ip", "file.name", "event.outcome",
      "event.id").collect()
    assert(rows(0).getString(0) == "AzureActiveDirectory")
    assert(rows(0).getString(1) == "added-user-account")
    assert(rows(0).getSeq[String](2) == Seq("web", "iam"))
    assert(rows(0).getSeq[String](3) == Seq("info", "user", "creation"))
    assert(rows(0).getString(4) == "newuser@contoso.com")
    assert(rows(0).getString(5) == "198.51.100.9")
    assert(rows(0).getString(7) == "success")
    assert(rows(1).getString(0) == "SharePointFileOperation")
    assert(rows(1).getSeq[String](2) == Seq("web", "file"))
    assert(rows(1).getSeq[String](3) == Seq("info", "deletion"))
    assert(rows(1).getString(6) == "doc.docx")
    val params = out.filter(col("event.id") === "id-sp")
      .select("o365.audit.parameters").head.getMap[String, String](0)
    assert(params("Mailbox") == "m1" && !params.contains("Empty"))
  }

  test("google_workspace login: email split, outcome, params map, target user") {
    import graft.transform.managed.GoogleWorkspaceLogin
    val line =
      """{"kind":"admin#reports#activity","ipAddress":"203.0.113.99","ownerDomain":"example.com",
        |"id":{"time":"2022-01-10T15:04:05.000Z","uniqueQualifier":"q1","applicationName":"login",
        |"customerId":"C03abc"},"actor":{"email":"kate@example.com","profileId":"114"},
        |"events":[{"name":"login_failure","type":"login",
        |"parameters":[{"name":"login_type","value":"google_password"},
        |{"name":"login_challenge_status","value":"Challenge Failed"},
        |{"name":"affected_email_address","value":"victim@example.com"},
        |{"name":"login_timestamp","intValue":"1641826245000000"}]}]}"""
        .stripMargin.replace("\n", "")
    val out = GoogleWorkspaceLogin(Seq(line).toDF("json"))
    assert(out.select("event.action").head.getString(0) == "login_failure")
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("event.category").head.getSeq[String](0)
      == Seq("authentication", "session"))
    assert(out.select("event.type").head.getSeq[String](0) == Seq("start"))
    assert(out.select("user.name").head.getString(0) == "kate")
    assert(out.select("user.domain").head.getString(0) == "example.com")
    assert(out.select("google_workspace.login.type").head.getString(0) == "google_password")
    assert(out.select("google_workspace.login.challenge_status").head.getString(0)
      == "Challenge Failed")
    assert(out.select("user.target.name").head.getString(0) == "victim")
    assert(out.select("related.user").head.getSeq[String](0) == Seq("kate", "victim"))
    assert(out.select("event.start").head.getTimestamp(0).toInstant.toString
      == "2022-01-10T14:50:45Z")
    assert(out.select("organization.id").head.getString(0) == "C03abc")
  }

  test("aad signin: upn split, outcome from error code, geo, message compose") {
    import graft.transform.managed.AadSignin
    val line =
      """{"callerIpAddress":"198.51.100.30","level":"4","durationMs":120,
        |"operationName":"Sign-in activity","tenantId":"t1","correlationId":"c1",
        |"properties":{"id":"sig1","createdDateTime":"2019-10-18T04:45:48.0729893Z",
        |"userPrincipalName":"mika@example.com","userDisplayName":"Mika P","userId":"uid1",
        |"appDisplayName":"Azure Portal","ipAddress":"198.51.100.30","isInteractive":false,
        |"status":{"errorCode":50126,"failureReason":"Invalid credentials",
        |"additionalDetails":"The user didn't enter the right credentials."},
        |"userAgent":"Mozilla/5.0","location":{"city":"Espoo","state":"Uusimaa",
        |"countryOrRegion":"FI","geoCoordinates":{"latitude":60.2,"longitude":24.7}}}}"""
        .stripMargin.replace("\n", "")
    val out = AadSignin(Seq(line).toDF("json"))
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("user.name").head.getString(0) == "mika")
    assert(out.select("user.domain").head.getString(0) == "example.com")
    assert(out.select("message").head.getString(0)
      == "Invalid credentials (The user didn't enter the right credentials.)")
    assert(out.select("geo.country_iso_code").head.getString(0) == "FI")
    assert(out.select("geo.location.lat").head.getDouble(0) == 60.2)
    assert(out.select("event.duration").head.getLong(0) == 120000000L)
    assert(out.select("azure.aad_signinlogs.app_display_name").head.getString(0) == "Azure Portal")
    assert(out.select("related.user").head.getSeq[String](0).toSet
      == Set("uid1", "mika", "Mika P"))
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString
      == "2019-10-18T04:45:48.072989Z")
  }

  test("zeek conn: state table, icmp repurposing, direction matrix, totals") {
    import graft.transform.managed.ZeekConn
    val tcp =
      """{"ts":1591367999.3,"uid":"CMdzit1AMNsmfAIiQc","id.orig_h":"192.168.4.76","id.orig_p":36844,
        |"id.resp_h":"192.168.4.1","id.resp_p":53,"proto":"udp","service":"dns","duration":0.0676,
        |"conn_state":"SF","local_orig":true,"local_resp":true,"missed_bytes":0,"history":"Dd",
        |"orig_pkts":2,"orig_ip_bytes":142,"resp_pkts":2,"resp_ip_bytes":320}"""
        .stripMargin.replace("\n", "")
    val icmp =
      """{"ts":1591368000.0,"uid":"Cicmp1","id.orig_h":"10.0.0.1","id.orig_p":8,
        |"id.resp_h":"10.0.0.2","id.resp_p":0,"proto":"icmp","conn_state":"OTH",
        |"local_orig":true,"local_resp":false,"orig_pkts":1,"orig_ip_bytes":64,"resp_pkts":0,"resp_ip_bytes":0}"""
        .stripMargin.replace("\n", "")
    val out = ZeekConn(Seq(tcp, icmp).toDF("json")).orderBy("event.id")
    val rows = out.selectExpr("event.type", "zeek.connection.state_message",
      "network.bytes", "network.direction", "zeek.connection.icmp.type",
      "source.port", "event.duration", "event.id").collect()
    val sf = rows.find(_.getString(7).startsWith("CMdzit")).get
    val ic = rows.find(_.getString(7) == "Cicmp1").get
    assert(sf.getSeq[String](0) == Seq("connection", "start", "end"))
    assert(sf.getString(1) == "Normal establishment and termination.")
    assert(sf.getLong(2) == 462L)
    assert(sf.getString(3) == "internal")
    assert(sf.getInt(5) == 36844)
    assert(sf.getLong(6) == 67600000L) // 0.0676 s in ns
    assert(ic.getInt(4) == 8) // icmp type from orig port
    assert(ic.isNullAt(5))    // icmp: no source.port
    assert(ic.getString(3) == "outbound")
  }

  test("zeek http: request/response mapping and outcome from status") {
    import graft.transform.managed.ZeekHttp
    val line =
      """{"ts":1591367999.5,"uid":"Chttp1","id.orig_h":"192.168.4.76","id.orig_p":46378,
        |"id.resp_h":"31.3.245.133","id.resp_p":80,"trans_depth":1,"method":"GET",
        |"host":"testmyids.com","uri":"/","version":"1.1","user_agent":"curl/7.47.0",
        |"request_body_len":0,"response_body_len":39,"status_code":200,"status_msg":"OK",
        |"resp_mime_types":["text/plain"]}""".stripMargin.replace("\n", "")
    val out = ZeekHttp(Seq(line).toDF("json"))
    assert(out.select("http.request.method").head.getString(0) == "GET")
    assert(out.select("url.domain").head.getString(0) == "testmyids.com")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("http.response.body.bytes").head.getLong(0) == 39L)
    assert(out.select("zeek.http.status_msg").head.getString(0) == "OK")
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("192.168.4.76", "31.3.245.133"))
  }

  test("inspector: vulnerability finding maps score max, packages, ec2 ips") {
    import graft.transform.managed.Inspector
    val line =
      """{"updatedAt":"2023-04-11T17:04:11Z","firstObservedAt":"2023-04-01T00:00:00Z",
        |"description":"A use-after-free flaw...","awsAccountId":"111122223333","severity":"HIGH",
        |"findingArn":"arn:aws:inspector2:us-east-1:111122223333:finding/f1","fixAvailable":"YES",
        |"inspectorScore":7.8,"status":"ACTIVE","title":"CVE-2023-1111 - kernel","type":"PACKAGE_VULNERABILITY",
        |"packageVulnerabilityDetails":{"vulnerabilityId":"CVE-2023-1111",
        |"referenceUrls":["https://a.example","https://b.example"],
        |"vendorSeverity":"important","source":"NVD",
        |"cvss":[{"baseScore":7.0,"scoringVector":"CVSS:3.1/...","source":"NVD","version":"3.1"},
        |{"baseScore":7.8,"scoringVector":"CVSS:2.0/...","source":"NVD","version":"2.0"}],
        |"vulnerablePackages":[{"name":"kernel","version":"5.10","arch":"X86_64",
        |"fixedInVersion":"5.11","packageManager":"OS","sourceLayerHash":"sha256:lay1"}]},
        |"resources":[{"id":"i-0abc","type":"AWS_EC2_INSTANCE","region":"us-east-1",
        |"details":{"awsEc2Instance":{"imageId":"ami-1","ipV4Addresses":["10.0.0.7"],
        |"ipV6Addresses":[],"type":"t3.micro","vpcId":"vpc-1"}}}]}"""
        .stripMargin.replace("\n", "")
    val out = Inspector(Seq(line).toDF("json"))
    assert(out.select("vulnerability.id").head.getString(0) == "CVE-2023-1111")
    assert(out.select("vulnerability.score.base").head.getDouble(0) == 7.8)
    assert(out.select("vulnerability.score.version").head.getString(0) == "3.1,2.0")
    assert(out.select("vulnerability.reference").head.getString(0)
      == "https://a.example,https://b.example")
    assert(out.select("vulnerability.severity").head.getString(0) == "important")
    assert(out.select("aws.inspector.severity").head.getString(0) == "HIGH")
    assert(out.select("aws.inspector.inspector_score").head.getDouble(0) == 7.8)
    assert(out.select("related.hash").head.getSeq[String](0) == Seq("sha256:lay1"))
    assert(out.select("related.ip").head.getSeq[String](0) == Seq("10.0.0.7"))
    assert(out.select("cloud.region").head.getString(0) == "us-east-1")
    assert(out.select("message").head.getString(0).startsWith("A use-after-free"))
    val pkg = out.select("aws.inspector.package_vulnerability_details.vulnerable_packages")
      .head.getSeq[Row](0).head
    assert(pkg.getAs[String]("fixed_in_version") == "5.11")
  }

  test("crowdstrike fdr: process rollup and network connect map ECS") {
    import graft.transform.managed.CrowdstrikeFdr
    val proc =
      """{"id":"ev1","event_simpleName":"ProcessRollup2","event_platform":"Win",
        |"timestamp":"1659640730000","ContextTimeStamp":"1659640729.895",
        |"aid":"agent1","aip":"203.0.113.20","AgentVersion":"6.44",
        |"ComputerName":"WIN-HOST","MachineDomain":"CORP",
        |"SHA256HashData":"a7c8e0f1","MD5HashData":"0000000000",
        |"CommandLine":"  \"C:\\Program\" -x  run ","ImageFileName":"\\Device\\HarddiskVolume1\\Windows\\System32\\cmd.exe",
        |"RawProcessId":"4321","TargetProcessId":"tp1","ParentBaseFileName":"explorer.exe",
        |"UserName":"jdoe","UserPrincipal":"jdoe@corp.example","UserIsAdmin":"1",
        |"ProcessStartTime":"1659640000.5"}""".stripMargin.replace("\n", "")
    val net =
      """{"id":"ev2","event_simpleName":"NetworkConnectIP4","event_platform":"Lin",
        |"timestamp":"1659640731000","aid":"agent1","ComputerName":"lin-host",
        |"LocalAddressIP4":"10.0.0.3","LocalPort":"51000","RemoteAddressIP4":"198.51.100.44",
        |"RemotePort":"443","Protocol":"6","ConnectionDirection":"0","UserSid":"-"}"""
        .stripMargin.replace("\n", "")
    val out = CrowdstrikeFdr(Seq(proc, net).toDF("json")).orderBy("event.id")
    val p = out.filter(col("event.id") === "ev1")
    assert(p.select("event.category").head.getSeq[String](0) == Seq("process"))
    assert(p.select("event.type").head.getSeq[String](0) == Seq("start"))
    assert(p.select("process.name").head.getString(0) == "cmd.exe")
    assert(p.select("process.args").head.getSeq[String](0)
      == Seq("C:\\Program", "-x", "run"))
    assert(p.select("process.pid").head.getLong(0) == 4321L)
    assert(p.select("user.roles").head.getSeq[String](0) == Seq("admin"))
    assert(p.select("user.full_name").head.getString(0) == "jdoe")
    assert(p.select("user.domain").head.getString(0) == "corp.example")
    assert(p.select("os.type").head.getString(0) == "windows")
    // zero-filled md5 filtered; sha256 kept; process event carries hashes
    assert(p.select("related.hash").head.getSeq[String](0) == Seq("a7c8e0f1"))
    assert(p.select("process.hash.sha256").head.getString(0) == "a7c8e0f1")
    assert(p.select("ts").head.getTimestamp(0).toInstant.toString
      == "2022-08-04T19:18:49.895Z") // ContextTimeStamp wins over wall clock
    val n = out.filter(col("event.id") === "ev2")
    assert(n.select("event.category").head.getSeq[String](0) == Seq("network"))
    assert(n.select("network.transport").head.getString(0) == "tcp")
    assert(n.select("network.direction").head.getString(0) == "outbound")
    assert(n.select("source.port").head.getInt(0) == 51000)
    assert(n.select("user.id").head.isNullAt(0)) // "-" marker nulled
    assert(n.select("related.ip").head.getSeq[String](0).toSet
      == Set("10.0.0.3", "198.51.100.44"))
  }

  test("panw traffic: syslog prefix + positional csv maps endpoints and outcome") {
    import graft.transform.managed.PanwTraffic
    // 0:future 1:receive_time 2:serial 3:type 4:subtype 5:cfgver 6:generated, then positional values
    val vals = Array.fill(108)(" ")
    vals(0) = "10.1.1.10"; vals(1) = "203.0.113.30"; vals(2) = "192.0.2.1"; vals(3) = "203.0.113.30"
    vals(4) = "allow-web"; vals(5) = "CORP\\jdoe"; vals(6) = "svc@partner.example"
    vals(7) = "web-browsing"; vals(9) = "trust"; vals(10) = "untrust"
    vals(11) = "ethernet1/1"; vals(12) = "ethernet1/2"; vals(15) = "1199"; vals(16) = "1"
    vals(17) = "54321"; vals(18) = "443"; vals(19) = "10148"; vals(20) = "443"
    vals(22) = "tcp"; vals(23) = "allow"; vals(24) = "7734"; vals(25) = "1995"; vals(26) = "5739"
    vals(27) = "33"; vals(28) = "2023/03/01 11:59:30"; vals(29) = "60"; vals(30) = "business"
    vals(37) = "20"; vals(38) = "13"; vals(39) = "tcp-fin"; vals(45) = "fw-edge-1"
    vals(58) = "rule-uuid-1"
    val line = "1," + "2023/03/01 12:00:00,007200001056,TRAFFIC,end,2561," +
      "2023/03/01 12:00:01," + vals.mkString(",")
    val out = PanwTraffic(Seq(line).toDF("message"))
    assert(out.select("panw.panos.type").head.getString(0) == "TRAFFIC")
    assert(out.select("panw.panos.sub_type").head.getString(0) == "end")
    assert(out.select("observer.serial_number").head.getString(0) == "007200001056")
    assert(out.select("ts").head.getTimestamp(0).toInstant.toString == "2023-03-01T12:00:01Z")
    assert(out.select("source.ip").head.getString(0) == "10.1.1.10")
    assert(out.select("source.user.name").head.getString(0) == "jdoe")
    assert(out.select("source.user.domain").head.getString(0) == "CORP")
    assert(out.select("destination.user.name").head.getString(0) == "svc")
    assert(out.select("destination.user.domain").head.getString(0) == "partner.example")
    assert(out.select("source.nat.port").head.getInt(0) == 10148)
    assert(out.select("destination.port").head.getInt(0) == 443)
    assert(out.select("network.application").head.getString(0) == "web-browsing")
    assert(out.select("network.bytes").head.getLong(0) == 7734L)
    assert(out.select("source.packets").head.getLong(0) == 20L)
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("event.duration").head.getLong(0) == 60L)
    assert(out.select("observer.ingress.zone").head.getString(0) == "trust")
    assert(out.select("rule.uuid").head.getString(0) == "rule-uuid-1")
    assert(out.select("panw.panos.endreason").head.getString(0) == "tcp-fin")
    assert(out.select("related.user").head.getSeq[String](0).toSet == Set("jdoe", "svc"))
    assert(out.select("event.start").head.getTimestamp(0).toInstant.toString
      == "2023-03-01T11:59:30Z")
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

  test("zeek ssl: version split, DN parse to x509 arrays, ja3 related.hash") {
    import graft.transform.managed.ZeekSsl
    val line =
      """{"ts":1591367999.7,"uid":"Cssl1","id.orig_h":"192.168.4.76","id.orig_p":46378,
        |"id.resp_h":"131.107.255.255","id.resp_p":443,"version":"TLSv12",
        |"cipher":"TLS_ECDHE_RSA_WITH_AES_256_GCM_SHA384","curve":"secp256r1",
        |"server_name":"example.com","resumed":false,"established":true,
        |"cert_chain_fuids":["F1","F2"],
        |"subject":"CN=example.com,O=Example Inc,L=Los Angeles,ST=California,C=US",
        |"issuer":"CN=DigiCert CA,OU=www.digicert.com,O=DigiCert Inc,C=US",
        |"validation_status":"ok","ja3":"a0e9f5d64349fb13191bc781f81f42e1","ja3s":"ae4edc6faf64d08308082ad26be60767",
        |"resp_certificate_sha1":"abcd1234","not_valid_before":1577836800.0,"not_valid_after":1640995200.0}"""
        .stripMargin.replace("\n", "")
    val out = ZeekSsl(Seq(line).toDF("json"))
    assert(out.select("tls.version").head.getString(0) == "1.2")
    assert(out.select("tls.version_protocol").head.getString(0) == "tls")
    assert(out.select("tls.cipher").head.getString(0) == "TLS_ECDHE_RSA_WITH_AES_256_GCM_SHA384")
    assert(out.select("tls.established").head.getBoolean(0))
    assert(out.select("zeek.ssl.server.name").head.getString(0) == "example.com")
    assert(out.select("tls.server.x509.subject.common_name").head.getSeq[String](0) == Seq("example.com"))
    assert(out.select("tls.server.x509.subject.organization").head.getSeq[String](0) == Seq("Example Inc"))
    assert(out.select("tls.server.x509.subject.state_or_province").head.getSeq[String](0) == Seq("California"))
    assert(out.select("tls.server.x509.issuer.organizational_unit").head.getSeq[String](0) == Seq("www.digicert.com"))
    assert(out.select("zeek.ssl.server.subject.common_name").head.getString(0) == "example.com")
    assert(out.select("zeek.ssl.server.issuer.organization").head.getString(0) == "DigiCert Inc")
    assert(out.select("tls.server.hash.sha1").head.getString(0) == "ABCD1234")
    assert(out.select("related.hash").head.getSeq[String](0)
      == Seq("ae4edc6faf64d08308082ad26be60767", "a0e9f5d64349fb13191bc781f81f42e1"))
    assert(out.select("tls.server.not_before").head.getTimestamp(0).toInstant.toString
      == "2020-01-01T00:00:00Z")
    assert(out.select("client.address").head.getString(0) == "192.168.4.76")
    assert(out.select("server.address").head.getString(0) == "131.107.255.255")
  }

  test("zeek ssl: SSLv3 version and missing DNs stay null") {
    import graft.transform.managed.ZeekSsl
    val line = """{"ts":1591368000.0,"uid":"Cssl2","id.orig_h":"10.0.0.1","id.orig_p":1024,
      |"id.resp_h":"10.0.0.2","id.resp_p":443,"version":"SSLv3"}""".stripMargin.replace("\n", "")
    val out = ZeekSsl(Seq(line).toDF("json"))
    assert(out.select("tls.version").head.getString(0) == "3.0")
    assert(out.select("tls.version_protocol").head.getString(0) == "ssl")
    assert(out.select("tls.server.x509.subject.common_name").head.isNullAt(0))
    assert(out.select("related.hash").head.getSeq[String](0).isEmpty)
  }

  test("zeek ssl: repeated DN attribute types dedup last-win, no batch failure") {
    import graft.transform.managed.ZeekSsl
    // multi-OU/DC subjects are common in enterprise X.509; with the default
    // spark.sql.mapKeyDedupPolicy=EXCEPTION a duplicate-key map would fail
    // the whole batch. Both the spaced and the no-space duplicate forms
    // must parse, keeping the last value per attribute type.
    val line =
      """{"ts":1591368001.0,"uid":"Cssl3","id.orig_h":"10.0.0.1","id.orig_p":1025,
        |"id.resp_h":"10.0.0.2","id.resp_p":443,"version":"TLSv12",
        |"subject":"OU=a, OU=b, CN=multi.example.com, O=Example",
        |"issuer":"DC=corp,DC=example,CN=Issuing CA"}""".stripMargin.replace("\n", "")
    val out = ZeekSsl(Seq(line).toDF("json"))
    assert(out.select("tls.server.x509.subject.common_name").head.getSeq[String](0)
      == Seq("multi.example.com"))
    assert(out.select("tls.server.x509.subject.organizational_unit").head.getSeq[String](0)
      == Seq("b"))
    assert(out.select("zeek.ssl.server.issuer.common_name").head.getString(0) == "Issuing CA")
  }

  test("zeek ssh: auth outcome, algorithm struct") {
    import graft.transform.managed.ZeekSsh
    val line =
      """{"ts":1591367999.0,"uid":"Cssh1","id.orig_h":"192.168.4.76","id.orig_p":53442,
        |"id.resp_h":"192.168.4.37","id.resp_p":22,"version":2,"auth_success":false,
        |"auth_attempts":3,"client":"SSH-2.0-OpenSSH_8.2","server":"SSH-2.0-OpenSSH_7.4",
        |"cipher_alg":"chacha20-poly1305@openssh.com","mac_alg":"umac-64-etm@openssh.com",
        |"compression_alg":"none","kex_alg":"curve25519-sha256","host_key_alg":"ssh-ed25519",
        |"host_key":"3e:a8:4f"}""".stripMargin.replace("\n", "")
    val out = ZeekSsh(Seq(line).toDF("json"))
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("zeek.ssh.auth.attempts").head.getInt(0) == 3)
    assert(out.select("zeek.ssh.algorithm.key_exchange").head.getString(0) == "curve25519-sha256")
    assert(out.select("zeek.ssh.algorithm.host_key").head.getString(0) == "ssh-ed25519")
    assert(out.select("network.protocol").head.getString(0) == "ssh")
    assert(out.select("destination.port").head.getInt(0) == 22)
  }

  test("zeek notice: alert kind, src/dst fallback endpoints, dropped → denied") {
    import graft.transform.managed.ZeekNotice
    val withConn =
      """{"ts":1591367999.0,"uid":"Cn1","id.orig_h":"192.168.4.76","id.orig_p":36844,
        |"id.resp_h":"192.168.4.1","id.resp_p":53,"proto":"tcp","note":"Scan::Port_Scan",
        |"msg":"10.0.0.1 scanned 50 ports","sub":"local","dropped":true,
        |"actions":["Notice::ACTION_LOG"],"suppress_for":3600.0}""".stripMargin.replace("\n", "")
    val connless =
      """{"ts":1591368000.0,"note":"Weird::Activity","msg":"something odd",
        |"src":"10.9.9.9","dst":"10.8.8.8","p":8080,"dropped":false}""".stripMargin.replace("\n", "")
    val out = ZeekNotice(Seq(withConn, connless).toDF("json"))
    val conn = out.filter(col("rule.name") === "Scan::Port_Scan")
    val noConn = out.filter(col("rule.name") === "Weird::Activity")
    assert(conn.select("event.kind").head.getString(0) == "alert")
    assert(conn.select("event.type").head.getSeq[String](0) == Seq("info", "denied"))
    assert(conn.select("rule.description").head.getString(0) == "10.0.0.1 scanned 50 ports")
    assert(conn.select("source.ip").head.getString(0) == "192.168.4.76")
    assert(noConn.select("event.type").head.getSeq[String](0) == Seq("info", "allowed"))
    assert(noConn.select("source.ip").head.getString(0) == "10.9.9.9")
    assert(noConn.select("destination.ip").head.getString(0) == "10.8.8.8")
    assert(noConn.select("destination.port").head.getInt(0) == 8080)
    assert(noConn.select("related.ip").head.getSeq[String](0).toSet == Set("10.9.9.9", "10.8.8.8"))
  }

  test("zeek files: hashes to file.hash + related, tx/rx hosts, conn uid") {
    import graft.transform.managed.ZeekFiles
    val line =
      """{"ts":1591367999.0,"fuid":"FBbQxG1GXLXgmWhbk9","tx_hosts":["192.168.4.37"],
        |"rx_hosts":["192.168.4.76"],"conn_uids":["CuKFds1"],"source":"HTTP","depth":0,
        |"analyzers":["MD5","SHA1"],"mime_type":"application/x-executable","filename":"a.out",
        |"duration":0.005,"is_orig":false,"seen_bytes":179272,"total_bytes":179272,
        |"missing_bytes":0,"overflow_bytes":0,"timedout":false,
        |"md5":"d41d8cd98f00b204e9800998ecf8427e","sha1":"da39a3ee5e6b4b0d3255bfef95601890afd80709"}"""
        .stripMargin.replace("\n", "")
    val out = ZeekFiles(Seq(line).toDF("json"))
    assert(out.select("file.name").head.getString(0) == "a.out")
    assert(out.select("file.size").head.getLong(0) == 179272L)
    assert(out.select("file.hash.md5").head.getString(0) == "d41d8cd98f00b204e9800998ecf8427e")
    assert(out.select("zeek.session_id").head.getString(0) == "CuKFds1")
    assert(out.select("server.ip").head.getString(0) == "192.168.4.37")
    assert(out.select("client.ip").head.getString(0) == "192.168.4.76")
    assert(out.select("related.hash").head.getSeq[String](0).size == 2)
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("192.168.4.37", "192.168.4.76"))
    assert(out.select("event.category").head.getSeq[String](0) == Seq("file"))
  }

  test("zeek weird: name to rule, additional info") {
    import graft.transform.managed.ZeekWeird
    val line =
      """{"ts":1591367999.0,"uid":"Cw1","id.orig_h":"192.168.4.76","id.orig_p":36844,
        |"id.resp_h":"192.168.4.1","id.resp_p":53,"name":"bad_TCP_checksum","addl":"extra",
        |"notice":false,"peer":"zeek"}""".stripMargin.replace("\n", "")
    val out = ZeekWeird(Seq(line).toDF("json"))
    assert(out.select("rule.name").head.getString(0) == "bad_TCP_checksum")
    assert(out.select("zeek.weird.additional_info").head.getString(0) == "extra")
    assert(out.select("zeek.weird.notice").head.getBoolean(0) == false)
    assert(out.select("event.type").head.getSeq[String](0) == Seq("info"))
  }

  test("zeek smtp: envelope fields, tls.established, date parse") {
    import graft.transform.managed.ZeekSmtp
    val line =
      """{"ts":1591367999.0,"uid":"Csm1","id.orig_h":"192.168.4.76","id.orig_p":25345,
        |"id.resp_h":"192.168.4.1","id.resp_p":25,"trans_depth":1,"helo":"mail.example.com",
        |"mailfrom":"alice@example.com","rcptto":["bob@example.org"],"date":1591367000.0,
        |"from":"\"Alice\" <alice@example.com>","to":["bob@example.org"],"msg_id":"<m1@example>",
        |"subject":"hello","last_reply":"250 OK","path":["192.168.4.1"],"user_agent":"mailer/1.0",
        |"tls":true,"fuids":[],"is_webmail":false}""".stripMargin.replace("\n", "")
    val out = ZeekSmtp(Seq(line).toDF("json"))
    assert(out.select("zeek.smtp.mail_from").head.getString(0) == "alice@example.com")
    assert(out.select("zeek.smtp.rcpt_to").head.getSeq[String](0) == Seq("bob@example.org"))
    assert(out.select("zeek.smtp.transaction_depth").head.getInt(0) == 1)
    assert(out.select("tls.established").head.getBoolean(0))
    assert(out.select("zeek.smtp.date").head.getTimestamp(0).toInstant.getEpochSecond == 1591367000L)
    assert(out.select("network.protocol").head.getString(0) == "smtp")
  }

  test("zeek kerberos: user/domain split, valid days, cert DN x509") {
    import graft.transform.managed.ZeekKerberos
    val line =
      """{"ts":1591367999.0,"uid":"Ck1","id.orig_h":"192.168.4.76","id.orig_p":49242,
        |"id.resp_h":"192.168.4.10","id.resp_p":88,"request_type":"TGS","client":"valid.user/EXAMPLE.COM",
        |"service":"krbtgt/EXAMPLE.COM","success":true,"from":1591367000.0,"till":1591453400.0,
        |"cipher":"aes256-cts-hmac-sha1-96","forwardable":true,"renewable":true,
        |"cert.client_subject":"CN=valid.user,OU=Users,O=Example,C=US"}""".stripMargin.replace("\n", "")
    val out = ZeekKerberos(Seq(line).toDF("json"))
    assert(out.select("user.name").head.getString(0) == "valid.user")
    assert(out.select("user.domain").head.getString(0) == "EXAMPLE.COM")
    assert(out.select("event.action").head.getString(0) == "TGS")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("zeek.kerberos.valid.days").head.getLong(0) == 1L)
    assert(out.select("tls.client.x509.subject.common_name").head.getSeq[String](0) == Seq("valid.user"))
    assert(out.select("tls.client.x509.subject.organizational_unit").head.getSeq[String](0) == Seq("Users"))
    assert(out.select("related.user").head.getSeq[String](0) == Seq("valid.user"))
    assert(out.select("event.category").head.getSeq[String](0) == Seq("network", "authentication"))
  }

  test("zeek ntlm: user/domain, server names, outcome") {
    import graft.transform.managed.ZeekNtlm
    val line =
      """{"ts":1591367999.0,"uid":"Cnt1","id.orig_h":"192.168.4.76","id.orig_p":49798,
        |"id.resp_h":"192.168.4.10","id.resp_p":445,"hostname":"WS01","domainname":"EXAMPLE",
        |"username":"jdoe","server_nb_computer_name":"DC01","server_dns_computer_name":"dc01.example.com",
        |"server_tree_name":"example.com","success":true}""".stripMargin.replace("\n", "")
    val out = ZeekNtlm(Seq(line).toDF("json"))
    assert(out.select("user.name").head.getString(0) == "jdoe")
    assert(out.select("user.domain").head.getString(0) == "EXAMPLE")
    assert(out.select("zeek.ntlm.server.name.dns").head.getString(0) == "dc01.example.com")
    assert(out.select("zeek.ntlm.server.name.netbios").head.getString(0) == "DC01")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("related.user").head.getSeq[String](0) == Seq("jdoe"))
  }

  test("zeek rdp: client/desktop/cert/encryption struct, ssl flag") {
    import graft.transform.managed.ZeekRdp
    val line =
      """{"ts":1591367999.0,"uid":"Cr1","id.orig_h":"192.168.4.76","id.orig_p":58405,
        |"id.resp_h":"192.168.4.161","id.resp_p":3389,"cookie":"jdoe","result":"encrypted",
        |"security_protocol":"HYBRID","client_build":"RDP 8.1","client_name":"WS01",
        |"client_dig_product_id":"pid-1","desktop_width":1920,"desktop_height":1080,
        |"requested_color_depth":"32bit","cert_type":"RSA","cert_count":1,"cert_permanent":true,
        |"encryption_level":"High","encryption_method":"FIPS","ssl":true}""".stripMargin.replace("\n", "")
    val out = ZeekRdp(Seq(line).toDF("json"))
    assert(out.select("zeek.rdp.client.name").head.getString(0) == "WS01")
    assert(out.select("zeek.rdp.desktop.width").head.getInt(0) == 1920)
    assert(out.select("zeek.rdp.cert.count").head.getInt(0) == 1)
    assert(out.select("zeek.rdp.encryption.method").head.getString(0) == "FIPS")
    assert(out.select("tls.established").head.getBoolean(0))
    assert(out.select("network.protocol").head.getString(0) == "rdp")
  }

  test("zeek tables: no-ts records abort across new mappings") {
    import graft.transform.managed.{ZeekFiles, ZeekSsh, ZeekSsl}
    val noTs = Seq("""{"uid":"Cx1","id.orig_h":"10.0.0.1"}""").toDF("json")
    assert(ZeekSsl(noTs).count() == 0)
    assert(ZeekSsh(noTs).count() == 0)
    assert(ZeekFiles(Seq("""{"fuid":"F1"}""").toDF("json")).count() == 0)
  }
}
