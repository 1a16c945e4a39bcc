package graft

import graft.transform.managed._
import org.apache.spark.sql.functions._

/** Golden tests for the batch-2/3 Zeek table mappings (reference
  * data/managed/log_sources/zeek/tables/&lt;t&gt;.yml). One realistic log line
  * per table; asserts cover the table-specific shaping on top of the
  * shared conn preamble (which ManagedSpec already covers in depth).
  */
class ZeekTablesSpec extends SparkSpec {
  import spark.implicits._

  private val conn =
    """"uid":"Cx1","id.orig_h":"192.168.4.76","id.orig_p":50000,
      |"id.resp_h":"10.0.0.9","id.resp_p":445""".stripMargin.replace("\n", "")

  test("dce_rpc: operation maps to event.action") {
    val line = s"""{"ts":1591367999.0,$conn,"rtt":0.1,"named_pipe":"\\\\pipe\\\\lsass",
      |"endpoint":"samr","operation":"SamrEnumerateDomainsInSamServer"}""".stripMargin.replace("\n", "")
    val out = ZeekDceRpc(Seq(line).toDF("json"))
    assert(out.select("event.action").head.getString(0) == "SamrEnumerateDomainsInSamServer")
    assert(out.select("zeek.dce_rpc.endpoint").head.getString(0) == "samr")
    assert(out.select("network.protocol").head.getString(0) == "dce_rpc")
  }

  test("tunnel: type/action lift") {
    val line = s"""{"ts":1591367999.0,$conn,"tunnel_type":"Tunnel::GRE","action":"Tunnel::DISCOVER"}"""
    val out = ZeekTunnel(Seq(line).toDF("json"))
    assert(out.select("zeek.tunnel.type").head.getString(0) == "Tunnel::GRE")
    assert(out.select("event.action").head.getString(0) == "Tunnel::DISCOVER")
  }

  test("dpd: proto becomes network.transport") {
    val line = s"""{"ts":1591367999.0,$conn,"proto":"udp","analyzer":"DNS",
      |"failure_reason":"Binpac exception"}""".stripMargin.replace("\n", "")
    val out = ZeekDpd(Seq(line).toDF("json"))
    assert(out.select("network.transport").head.getString(0) == "udp")
    assert(out.select("zeek.dpd.analyzer").head.getString(0) == "DNS")
  }

  test("ftp: user/command/file and reply nesting") {
    val line = s"""{"ts":1591367999.0,$conn,"user":"anonymous","password":"ftp",
      |"command":"RETR","arg":"ftp://x/f.txt","mime_type":"text/plain","file_size":42,
      |"reply_code":226,"reply_msg":"Transfer complete.","data_channel.passive":true,
      |"data_channel.orig_h":"192.168.4.76","data_channel.resp_h":"10.0.0.9",
      |"data_channel.resp_p":55488,"fuid":"Fftp1"}""".stripMargin.replace("\n", "")
    val out = ZeekFtp(Seq(line).toDF("json"))
    assert(out.select("user.name").head.getString(0) == "anonymous")
    assert(out.select("event.action").head.getString(0) == "RETR")
    assert(out.select("file.size").head.getLong(0) == 42L)
    assert(out.select("zeek.ftp.reply.code").head.getInt(0) == 226)
    assert(out.select("zeek.ftp.data_channel.passive").head.getBoolean(0))
    assert(out.select("related.user").head.getSeq[String](0) == Seq("anonymous"))
  }

  test("sip: status-derived outcome and error event.type") {
    val ok = s"""{"ts":1591367999.0,$conn,"trans_depth":0,"method":"REGISTER",
      |"uri":"sip:example.com","call_id":"abc@10.0.0.1","seq":"1 REGISTER",
      |"request_from":"<sip:a@x>","request_to":"<sip:b@x>","status_code":200,
      |"status_msg":"OK","request_body_len":0,"response_body_len":0}""".stripMargin.replace("\n", "")
    val bad = ok.replace("\"status_code\":200", "\"status_code\":486")
    val out = ZeekSip(Seq(ok, bad).toDF("json")).orderBy("zeek.sip.status.code")
    val rows = out.select("event.outcome", "zeek.sip.sequence.number").collect()
    assert(rows(0).getString(0) == "success" && rows(0).getString(1) == "1")
    assert(rows(1).getString(0) == "failure")
    assert(out.orderBy(col("zeek.sip.status.code").desc)
      .select("event.type").head.getSeq[String](0).contains("error"))
    assert(out.select("url.full").head.getString(0) == "sip:example.com")
  }

  test("snmp: PDU counters and up_since timestamp") {
    val line = s"""{"ts":1591367999.0,$conn,"duration":1.2,"version":"2c",
      |"community":"public","get_requests":5,"get_bulk_requests":0,"get_responses":5,
      |"set_requests":1,"up_since":1577836800.0}""".stripMargin.replace("\n", "")
    val out = ZeekSnmp(Seq(line).toDF("json"))
    assert(out.select("zeek.snmp.get.requests").head.getInt(0) == 5)
    assert(out.select("zeek.snmp.set.requests").head.getInt(0) == 1)
    assert(out.select("zeek.snmp.up_since").head.getTimestamp(0).toInstant.toString
      == "2020-01-01T00:00:00Z")
  }

  test("socks: request host fallback to name; outcome from status") {
    val line = s"""{"ts":1591367999.0,$conn,"version":5,"user":"u1",
      |"status":"succeeded","request.name":"example.com","request_p":443,
      |"bound.host":"10.0.0.9","bound_p":8443}""".stripMargin.replace("\n", "")
    val out = ZeekSocks(Seq(line).toDF("json"))
    assert(out.select("zeek.socks.request.host").head.getString(0) == "example.com")
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("zeek.socks.bound.port").head.getInt(0) == 8443)
  }

  test("mysql: connect gets access+start+session; change commands typed") {
    val mk = (cmd: String, ok: Boolean) =>
      s"""{"ts":1591367999.0,$conn,"cmd":"$cmd","arg":"db1","success":$ok,"rows":1}"""
    val out = ZeekMysql(Seq(mk("connect", true), mk("drop_db", true),
      mk("query", false)).toDF("json"))
    val byCmd = out.select(col("zeek.mysql.cmd"), col("event.type"),
      col("event.category"), col("event.outcome")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byCmd("connect").getSeq[String](1) ==
      Seq("connection", "protocol", "access", "start"))
    assert(byCmd("connect").getSeq[String](2).contains("session"))
    assert(byCmd("drop_db").getSeq[String](1) == Seq("connection", "protocol", "change"))
    assert(byCmd("query").getSeq[String](1) == Seq("connection", "protocol", "info"))
    assert(byCmd("query").getString(3) == "failure")
  }

  test("ntp: epoch time fields become timestamps") {
    val line = s"""{"ts":1591367999.0,$conn,"version":4,"mode":3,"stratum":2,
      |"poll":64.0,"precision":1.0E-6,"root_delay":0.01,"root_disp":0.02,
      |"ref_id":"GPS","ref_time":1591367000.0,"org_time":1591367990.0,
      |"rec_time":1591367991.0,"xmt_time":1591367992.0,"num_exts":0}""".stripMargin.replace("\n", "")
    val out = ZeekNtp(Seq(line).toDF("json"))
    assert(out.select("zeek.ntp.stratum").head.getInt(0) == 2)
    assert(out.select("zeek.ntp.ref_time").head.getTimestamp(0).toInstant.getEpochSecond
      == 1591367000L)
    assert(out.select("network.type").head.getString(0) == "ipv4")
  }

  test("radius: result is outcome, user related") {
    val line = s"""{"ts":1591367999.0,$conn,"username":"alice","mac":"aa:bb:cc:dd:ee:ff",
      |"result":"success","ttl":0.004}""".stripMargin.replace("\n", "")
    val out = ZeekRadius(Seq(line).toDF("json"))
    assert(out.select("event.outcome").head.getString(0) == "success")
    assert(out.select("user.name").head.getString(0) == "alice")
    assert(out.select("related.user").head.getSeq[String](0) == Seq("alice"))
  }

  test("rfb: version/auth nesting") {
    val line = s"""{"ts":1591367999.0,$conn,"client_major_version":"003",
      |"client_minor_version":"008","server_major_version":"003","server_minor_version":"008",
      |"authentication_method":"VNC","auth":true,"share_flag":false,
      |"desktop_name":"desk1","width":1920,"height":1080}""".stripMargin.replace("\n", "")
    val out = ZeekRfb(Seq(line).toDF("json"))
    assert(out.select("zeek.rfb.version.client.major").head.getString(0) == "003")
    assert(out.select("zeek.rfb.auth.success").head.getBoolean(0))
    assert(out.select("zeek.rfb.auth.method").head.getString(0) == "VNC")
  }

  test("irc: dcc file fields lift to ECS file") {
    val line = s"""{"ts":1591367999.0,$conn,"nick":"n1","user":"u1","command":"DCC",
      |"value":"SEND","addl":"info","dcc_file_name":"warez.zip","dcc_file_size":1024,
      |"dcc_mime_type":"application/zip","fuid":"Firc1"}""".stripMargin.replace("\n", "")
    val out = ZeekIrc(Seq(line).toDF("json"))
    assert(out.select("file.name").head.getString(0) == "warez.zip")
    assert(out.select("file.size").head.getLong(0) == 1024L)
    assert(out.select("zeek.irc.dcc.mime_type").head.getString(0) == "application/zip")
  }

  test("modbus: exception drives failure outcome") {
    val ok = s"""{"ts":1591367999.0,$conn,"func":"READ_COILS"}"""
    val bad = s"""{"ts":1591368000.0,$conn,"func":"READ_COILS","exception":"ILLEGAL_ADDRESS"}"""
    val out = ZeekModbus(Seq(ok, bad).toDF("json")).orderBy("ts")
    val rows = out.select("event.outcome", "zeek.modbus.function").collect()
    assert(rows(0).getString(0) == "success")
    assert(rows(1).getString(0) == "failure")
    assert(rows(0).getString(1) == "READ_COILS")
  }

  test("dnp3: reply wins event.action, lowercased") {
    val line = s"""{"ts":1591367999.0,$conn,"fc_request":"READ","fc_reply":"RESPONSE","iin":0}"""
    val out = ZeekDnp3(Seq(line).toDF("json"))
    assert(out.select("event.action").head.getString(0) == "response")
    assert(out.select("zeek.dnp3.function.request").head.getString(0) == "READ")
  }

  test("syslog: facility/severity into log.syslog; msg into message") {
    val line = s"""{"ts":1591367999.0,$conn,"proto":"udp","facility":"AUTH",
      |"severity":"NOTICE","message":"sshd[1]: accepted"}""".stripMargin.replace("\n", "")
    val out = ZeekSyslog(Seq(line).toDF("json"))
    assert(out.select("log.syslog.facility.name").head.getString(0) == "AUTH")
    assert(out.select("message").head.getString(0) == "sshd[1]: accepted")
    assert(out.select("network.transport").head.getString(0) == "udp")
  }

  test("traceroute: src/dst endpoints without conn tuple") {
    val line = """{"ts":1591367999.0,"src":"192.168.4.76","dst":"8.8.8.8","proto":"udp"}"""
    val out = ZeekTraceroute(Seq(line).toDF("json"))
    assert(out.select("source.ip").head.getString(0) == "192.168.4.76")
    assert(out.select("destination.ip").head.getString(0) == "8.8.8.8")
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("192.168.4.76", "8.8.8.8"))
  }

  test("dhcp: uids join to event.id, port defaults, address nesting") {
    val line = """{"ts":1591367999.0,"uids":["CdhcpA","CdhcpB"],
      |"client_addr":"192.168.4.152","server_addr":"192.168.4.1",
      |"mac":"00:11:22:33:44:55","host_name":"host1","domain":"lan",
      |"requested_addr":"192.168.4.152","assigned_addr":"192.168.4.152",
      |"lease_time":86400.0,"msg_types":["DISCOVER","OFFER"],"duration":0.5}""".stripMargin.replace("\n", "")
    val out = ZeekDhcp(Seq(line).toDF("json"))
    assert(out.select("event.id").head.getString(0) == "CdhcpA,CdhcpB")
    assert(out.select("source.port").head.getInt(0) == 68)
    assert(out.select("destination.port").head.getInt(0) == 67)
    assert(out.select("zeek.dhcp.address.assigned").head.getString(0) == "192.168.4.152")
    assert(out.select("network.name").head.getString(0) == "lan")
    assert(out.select("related.ip").head.getSeq[String](0).toSet
      == Set("192.168.4.152", "192.168.4.1"))
  }

  test("smb_cmd: referenced file lift; error status types") {
    val line = s"""{"ts":1591367999.0,$conn,"command":"NT_CREATE_ANDX",
      |"argument":"\\\\\\\\srv\\\\share","status":"ACCESS_DENIED","rtt":0.001,
      |"version":"SMB2","username":"bob","tree":"share","tree_service":"DISK",
      |"referenced_file.uid":"Fsmb1","referenced_file.id.orig_h":"192.168.4.76",
      |"referenced_file.id.resp_h":"10.0.0.9","referenced_file.action":"SMB::FILE_OPEN",
      |"referenced_file.name":"doc.txt","referenced_file.path":"\\\\\\\\srv\\\\share"}""".stripMargin.replace("\n", "")
    val out = ZeekSmbCmd(Seq(line).toDF("json"))
    assert(out.select("event.outcome").head.getString(0) == "failure")
    assert(out.select("event.type").head.getSeq[String](0).contains("error"))
    assert(out.select("zeek.smb_cmd.file.uid").head.getString(0) == "Fsmb1")
    assert(out.select("zeek.smb_cmd.file.name").head.getString(0) == "doc.txt")
    assert(out.select("user.name").head.getString(0) == "bob")
  }

  test("smb_files: times to ECS file timestamps; delete maps to deletion") {
    val line = s"""{"ts":1591367999.0,$conn,"fuid":"Fsf1","action":"SMB::FILE_DELETE",
      |"path":"\\\\\\\\srv\\\\share","name":"gone.txt","size":10,
      |"times.modified":1591360000.0,"times.accessed":1591360001.0,
      |"times.created":1591350000.0,"times.changed":1591360002.0}""".stripMargin.replace("\n", "")
    val out = ZeekSmbFiles(Seq(line).toDF("json"))
    assert(out.select("event.type").head.getSeq[String](0)
      == Seq("connection", "protocol", "deletion"))
    assert(out.select("file.created").head.getTimestamp(0).toInstant.getEpochSecond
      == 1591350000L)
    assert(out.select("file.path").head.getString(0) == "\\\\srv\\share\\gone.txt")
    assert(out.select("zeek.smb_files.previous_name").head.isNullAt(0))
  }

  test("smb_mapping: share metadata") {
    val line = s"""{"ts":1591367999.0,$conn,"path":"\\\\\\\\srv\\\\IPC$$",
      |"service":"IPC","share_type":"PIPE"}""".stripMargin.replace("\n", "")
    val out = ZeekSmbMapping(Seq(line).toDF("json"))
    assert(out.select("zeek.smb_mapping.share_type").head.getString(0) == "PIPE")
    assert(out.select("network.protocol").head.getString(0) == "smb")
  }

  test("x509: DN parse to both shapes, sig-alg display map, SAN flatten") {
    val line = """{"ts":1591367999.0,"id":"Fx5091","certificate.version":3,
      |"certificate.serial":"0A1B2C","certificate.subject":"CN=example.com,O=Example Inc,C=US",
      |"certificate.issuer":"CN=Example CA,O=Example Trust,C=US",
      |"certificate.not_valid_before":1577836800.0,"certificate.not_valid_after":1640995200.0,
      |"certificate.key_alg":"rsaEncryption","certificate.sig_alg":"sha256WithRSAEncryption",
      |"certificate.key_type":"rsa","certificate.key_length":2048,"certificate.exponent":"65537",
      |"san.dns":["example.com","www.example.com"],"san.ip":["93.184.216.34"],
      |"basic_constraints.ca":false}""".stripMargin.replace("\n", "")
    val out = ZeekX509(Seq(line).toDF("json"))
    assert(out.select("zeek.x509.certificate.subject.common_name").head.getString(0)
      == "example.com")
    assert(out.select("file.x509.subject.common_name").head.getSeq[String](0)
      == Seq("example.com"))
    assert(out.select("file.x509.signature_algorithm").head.getString(0) == "SHA256-RSA")
    assert(out.select("file.x509.public_key_size").head.getInt(0) == 2048)
    assert(out.select("file.x509.public_key_exponent").head.getInt(0) == 65537)
    assert(out.select("file.x509.alternative_names").head.getSeq[String](0).toSet
      == Set("example.com", "www.example.com", "93.184.216.34"))
    assert(out.select("file.x509.not_before").head.getTimestamp(0).toInstant.toString
      == "2020-01-01T00:00:00Z")
    assert(out.select("zeek.session_id").head.getString(0) == "Fx5091")
  }

  test("ocsp: camelCase fields lift; issuer hashes into related.hash") {
    val line = """{"ts":1591367999.0,"id":"Focsp1","hashAlgorithm":"sha1",
      |"issuerNameHash":"AABB","issuerKeyHash":"CCDD","serialNumber":"0A1B",
      |"certStatus":"good","thisUpdate":1591300000.0,"nextUpdate":1591400000.0}""".stripMargin.replace("\n", "")
    val out = ZeekOcsp(Seq(line).toDF("json"))
    assert(out.select("zeek.ocsp.hash.issuer.name").head.getString(0) == "AABB")
    assert(out.select("zeek.ocsp.status").head.getString(0) == "good")
    assert(out.select("related.hash").head.getSeq[String](0) == Seq("AABB", "CCDD"))
    assert(out.select("zeek.ocsp.update.next").head.getTimestamp(0).toInstant.getEpochSecond
      == 1591400000L)
  }

  test("pe: compile_ts to timestamp; section names kept") {
    val line = """{"ts":1591367999.0,"id":"Fpe1","machine":"AMD64",
      |"compile_ts":1546300800.0,"os":"Windows","subsystem":"WINDOWS_GUI",
      |"is_exe":true,"is_64bit":true,"uses_aslr":true,"uses_dep":true,
      |"has_import_table":true,"section_names":[".text",".data"]}""".stripMargin.replace("\n", "")
    val out = ZeekPe(Seq(line).toDF("json"))
    assert(out.select("zeek.pe.compile_time").head.getTimestamp(0).toInstant.toString
      == "2019-01-01T00:00:00Z")
    assert(out.select("zeek.pe.section_names").head.getSeq[String](0)
      == Seq(".text", ".data"))
    assert(out.select("event.category").head.getSeq[String](0) == Seq("file"))
  }

  test("intel: indicator typed into ECS threat fields by type") {
    val mk = (t: String, v: String) =>
      s"""{"ts":1591367999.0,$conn,"seen.indicator":"$v","seen.indicator_type":"$t",
        |"seen.where":"Conn::IN_RESP","matched":["Intel::ADDR"],
        |"sources":["feed1"]}""".stripMargin.replace("\n", "")
    val out = ZeekIntel(Seq(
      mk("Intel::ADDR", "203.0.113.7"),
      mk("Intel::URL", "http://evil.test/x"),
      mk("Intel::EMAIL", "a@evil.test")).toDF("json"))
    val rows = out.select("zeek.intel.seen.indicator_type", "threat.indicator.type",
      "threat.indicator.ip", "threat.indicator.url.original",
      "threat.indicator.email.address").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("Intel::ADDR").getString(1) == "ipv4-addr")
    assert(rows("Intel::ADDR").getString(2) == "203.0.113.7")
    assert(rows("Intel::URL").getString(1) == "url")
    assert(rows("Intel::URL").getString(3) == "http://evil.test/x")
    assert(rows("Intel::EMAIL").getString(4) == "a@evil.test")
    assert(out.select("event.kind").head.getString(0) == "enrichment")
  }

  test("signature: src/dst endpoints and rule fields") {
    val line = """{"ts":1591367999.0,"uid":"Csig1","src_addr":"192.168.4.76",
      |"src_port":50000,"dst_addr":"10.0.0.9","dst_port":80,
      |"note":"Signatures::Sensitive_Signature","sig_id":"sid-1000",
      |"event_msg":"match on /etc/passwd","sig_count":1}""".stripMargin.replace("\n", "")
    val out = ZeekSignature(Seq(line).toDF("json"))
    assert(out.select("event.kind").head.getString(0) == "alert")
    assert(out.select("rule.id").head.getString(0) == "sid-1000")
    assert(out.select("source.ip").head.getString(0) == "192.168.4.76")
    assert(out.select("network.type").head.getString(0) == "ipv4")
  }

  test("software: version nesting and host.ip array") {
    val line = """{"ts":1591367999.0,"host":"192.168.4.76","host_p":80,
      |"software_type":"HTTP::SERVER","name":"nginx","version.major":1,
      |"version.minor":25,"version.minor2":3,"unparsed_version":"nginx/1.25.3"}""".stripMargin.replace("\n", "")
    val out = ZeekSoftware(Seq(line).toDF("json"))
    assert(out.select("zeek.software.version.full").head.getString(0) == "nginx/1.25.3")
    assert(out.select("zeek.software.version.major").head.getInt(0) == 1)
    assert(out.select("host.ip").head.getSeq[String](0) == Seq("192.168.4.76"))
    assert(out.select("network.type").head.getString(0) == "ipv4")
  }

  test("known_hosts / known_services / known_certs inventory shaping") {
    val kh = """{"ts":1591367999.0,"host":"2001:db8::7"}"""
    val outH = ZeekKnownHosts(Seq(kh).toDF("json"))
    assert(outH.select("network.type").head.getString(0) == "ipv6")
    assert(outH.select("host.ip").head.getSeq[String](0) == Seq("2001:db8::7"))

    val ks = """{"ts":1591367999.0,"host":"10.0.0.9","port_num":445,
      |"port_proto":"tcp","service":["SMB","GSSAPI"]}""".stripMargin.replace("\n", "")
    val outS = ZeekKnownServices(Seq(ks).toDF("json"))
    assert(outS.select("server.port").head.getInt(0) == 445)
    assert(outS.select("network.application").head.getString(0) == "smb")

    val kc = """{"ts":1591367999.0,"host":"10.0.0.9","port_num":443,
      |"subject":"CN=example.com,O=Example","issuer_subject":"CN=Example CA",
      |"serial":"0A1B"}""".stripMargin.replace("\n", "")
    val outC = ZeekKnownCerts(Seq(kc).toDF("json"))
    assert(outC.select("tls.server.x509.subject.common_name").head.getSeq[String](0)
      == Seq("example.com"))
    assert(outC.select("tls.server.x509.serial_number").head.getString(0) == "0A1B")
    assert(outC.select("tls.server.subject").head.getString(0) == "CN=example.com,O=Example")
  }

  test("stats / capture_loss metrics shaping") {
    val st = """{"ts":1591367999.0,"peer":"zeek","mem":512,"pkts_proc":1000,
      |"pkts_dropped":5,"pkts_link":1005,"bytes_recv":123456,"tcp_conns":10,
      |"active_tcp_conns":2,"events_proc":5000,"timers":100,"pkt_lag":0.01}""".stripMargin.replace("\n", "")
    val outS = ZeekStats(Seq(st).toDF("json"))
    assert(outS.select("event.kind").head.getString(0) == "metric")
    assert(outS.select("zeek.stats.packets.dropped").head.getLong(0) == 5L)
    assert(outS.select("zeek.stats.connections.tcp.active").head.getLong(0) == 2L)

    val cl = """{"ts":1591367999.0,"ts_delta":900.0,"peer":"zeek","gaps":3,
      |"acks":1000,"percent_lost":0.3}""".stripMargin.replace("\n", "")
    val outC = ZeekCaptureLoss(Seq(cl).toDF("json"))
    assert(outC.select("zeek.capture_loss.percent_lost").head.getDouble(0) == 0.3)
    assert(outC.select("event.kind").head.getString(0) == "metric")
  }

  test("no-ts records abort across table families") {
    val noTs = s"""{$conn,"command":"RETR"}"""
    assert(ZeekFtp(Seq(noTs).toDF("json")).count() == 0)
    assert(ZeekX509(Seq("""{"id":"F1"}""").toDF("json")).count() == 0)
    assert(ZeekDhcp(Seq("""{"client_addr":"10.0.0.1"}""").toDF("json")).count() == 0)
  }
}
