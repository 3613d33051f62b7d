package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RsyslogConfig

/** impcap packet decode against hand-assembled frames — field names,
  * insertion order, and renderings from the C parsers
  * (contrib/impcap: eth_parser.c, ipv4_parser.c, ipv6_parser.c,
  * tcp_parser.c, udp_parser.c, icmp_parser.c, impcap.c packet_parse).
  */
class ImpcapSpec extends SparkSpec {
  import spark.implicits._

  private def pkt(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val ethIp4 = "00 1A 2B 3C 4D 5E" + // dst
    "AA BB CC DD EE 0F" +                     // src
    "08 00"                                   // IPv4

  test("eth+ipv4+tcp: fields, glibc MAC rendering, flags, payload hex") {
    val hex = ethIp4 +
      "45 00 00 30 00 00 00 00 40 06 00 00" + // ihl5, ttl 64, proto tcp
      "0A 00 01 02" +                          // src 10.0.1.2
      "C0 A8 01 01" +                          // dst 192.168.1.1
      "D4 31 01 BB" +                          // ports 54321 -> 443
      "00 00 00 07 00 00 00 00" +              // seq 7, ack 0
      "50 12 00 00 00 00 00 00" +              // dor 0x50, flags SYN|ACK
      "DE AD BE EF"                            // payload
    val feed = Seq((1L, pkt(hex))).toDF("id", "packet")
      .withColumn("ts", to_timestamp(lit("2024-06-01 10:00:00")))
    val cfg = RsyslogConfig.parse(
      "input(type=\"impcap\" tag=\"pcap:\")\n*.* /dev/null\n")
    val r = cfg.activate(spark, feeds = Map("impcap" -> feed),
      now = to_timestamp(lit("2024-01-01 00:00:00")))("")
      .frame.select("vars_msg", "syslogtag", "msg").collect().head
    assert(r.getString(0) ==
      """{"data":{"length":8,"content":"DEADBEEF"},""" +
      """"impcap":{"ID":1,"timestamp":"2024-06-01T10:00:00.000000+00:00",""" +
      """"net_bytes_total":58,""" +
      """"ETH_src":"aa:bb:cc:dd:ee:f","ETH_dst":"0:1a:2b:3c:4d:5e",""" +
      """"ETH_type":2048,"ETH_typestr":"IP",""" +
      """"net_dst_ip":"192.168.1.1","net_src_ip":"10.0.1.2",""" +
      """"IP_ihl":5,"net_ttl":64,"IP_proto":6,""" +
      """"net_src_port":54321,"net_dst_port":443,""" +
      """"TCP_seq_number":7,"TCP_ack_number":0,"net_flags":"SA",""" +
      """"net_bytes_data":4}}""")
    assert(r.getString(1) == "pcap:")
    assert(r.getString(2) == "")
  }

  test("eth+vlan+ipv4+udp") {
    val hex = "00 1A 2B 3C 4D 5E AA BB CC DD EE 0F" +
      "81 00 00 64 08 00" + // 802.1Q tag 100, then IPv4
      "45 00 00 24 00 00 00 00 20 11 00 00" + // ttl 32, proto udp
      "0A 00 00 01 0A 00 00 02" +
      "00 35 82 9B 00 0C BE EF" + // 53 -> 33435, len 12, cksum 0xBEEF
      "61 62"                      // payload "ab"
    val out = graft.sources.Sources.impcapDecode(
      Seq((9L, pkt(hex))).toDF("id", "packet")
        .withColumn("ts", to_timestamp(lit("2024-06-01 10:00:01"))))
      .select("vars_msg").as[String].collect().head
    assert(out.contains(""""ETH_tag":100"""))
    assert(out.contains(""""net_src_port":53,"net_dst_port":33435"""))
    assert(out.contains(""""UDP_Length":12,"UDP_Checksum":48879"""))
    assert(out.contains(""""content":"6162""""))
  }

  test("eth+ipv6+tcp: inet_ntop-compressed addresses") {
    val hex = "00 1A 2B 3C 4D 5E AA BB CC DD EE 0F 86 DD" +
      "60 00 00 00 00 14 06 40" + // v6, next=tcp, hop 64
      "20 01 0D B8 00 00 00 00 00 00 00 00 00 00 00 01" + // 2001:db8::1
      "FE 80 00 00 00 00 00 00 00 00 00 00 00 00 00 09" + // fe80::9
      "1F 90 00 50 00 00 00 01 00 00 00 02 50 18 00 00 00 00 00 00"
    val out = graft.sources.Sources.impcapDecode(
      Seq((2L, pkt(hex))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(out.contains(""""net_dst_ip":"fe80::9","net_src_ip":"2001:db8::1""""))
    assert(out.contains(""""net_ttl":64"""))
    assert(out.contains(""""net_src_port":8080,"net_dst_port":80"""))
    assert(out.contains(""""net_flags":"PA""""))
  }

  test("icmp echo request and unhandled ethertype") {
    val icmpHex = ethIp4 +
      "45 00 00 1C 00 00 00 00 FF 01 00 00 0A 00 00 01 0A 00 00 02" +
      "08 00 12 34 00 01 00 02" + "41"
    val icmp = graft.sources.Sources.impcapDecode(
      Seq((3L, pkt(icmpHex))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(icmp.contains(
      """"net_icmp_type":8,"net_icmp_code":0,"icmp_checksum":4660"""))
    assert(icmp.contains(""""content":"41""""))
    // LLDP: eth_proto_parse's default = dont_parse → whole rest is data
    val lldpHex = "00 1A 2B 3C 4D 5E AA BB CC DD EE 0F 88 CC 02 07"
    val lldp = graft.sources.Sources.impcapDecode(
      Seq((4L, pkt(lldpHex))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(lldp.contains(""""ETH_typestr":"LLDP""""))
    assert(lldp.contains(""""content":"0207""""))
    assert(lldp.contains(""""net_bytes_data":2"""))
  }

  private val ip4Tcp20 = // ihl5 ttl64 tcp, 10.0.1.2 -> 192.168.1.1
    "45 00 00 00 00 00 00 00 40 06 00 00 0A 00 01 02 C0 A8 01 01"
  private def tcpTo(dstPortHex: String): String =
    "D4 31 " + dstPortHex + " 00 00 00 07 00 00 00 00 50 18 00 00 00 00 00 00"

  test("app-layer dns: question walk, rcode/type/class tables (dns_parser.c)") {
    val dns = "30 39" + "01 00" + // txid 12345, flags RD (Z=0)
      "00 01 00 00 00 00 00 00" +
      "03 77 77 77 07 65 78 61 6D 70 6C 65 03 63 6F 6D 00" + // www.example.com
      "00 1C 00 01" // AAAA IN
    val udp = "08 00 00 35 00 10 BE EF" // src 2048 -> dst 53
    val out = graft.sources.Sources.impcapDecode(
      Seq((1L, pkt(ethIp4 +
        "45 00 00 00 00 00 00 00 40 11 00 00 0A 00 01 02 C0 A8 01 01" +
        udp + dns))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(out.contains(""""DNS_transaction_id":12345"""))
    assert(out.contains(""""DNS_response_flag":false"""))
    assert(out.contains(""""DNS_rcode":0,"DNS_error":"NoError""""))
    assert(out.contains(""""DNS_QDCOUNT":1"""))
    assert(out.contains(
      """{"qname":"www.example.com","qtype":28,"type":"AAAA","qclass":1,"class":"IN"}"""))
    // a set reserved (Z) bit aborts the DNS parse entirely
    val badFlags = "30 39" + "01 40" + "00 01 00 00 00 00 00 00"
    val bad = graft.sources.Sources.impcapDecode(
      Seq((2L, pkt(ethIp4 +
        "45 00 00 00 00 00 00 00 40 11 00 00 0A 00 01 02 C0 A8 01 01" +
        udp + badFlags + "00 00 00 00"))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(!bad.contains("DNS_transaction_id"))
  }

  test("app-layer http: request + response status lines and header fields") {
    val req = "GET /x HTTP/1.1\r\nHost: a.example\r\nXK: 1\r\n\r\nbody"
    val out = graft.sources.Sources.impcapDecode(
      Seq((1L, pkt(ethIp4 + ip4Tcp20 + tcpTo("00 50")) ++
        req.getBytes("US-ASCII"))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(out.contains(""""HTTP_method":"GET""""))
    assert(out.contains(""""HTTP_request_URI":"/x""""))
    assert(out.contains(""""HTTP_version":"HTTP/1.1""""))
    assert(out.contains(""""HTTP_header_fields":{"Host":"a.example","XK":"1"}"""))
    val resp = "HTTP/1.1 404 Not Found\r\nServer: s\r\n\r\n"
    val out2 = graft.sources.Sources.impcapDecode(
      Seq((2L, pkt(ethIp4 + ip4Tcp20 + tcpTo("1F 90")) ++ // 8080
        resp.getBytes("US-ASCII"))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(out2.contains(""""HTTP_version":"HTTP/1.1""""))
    assert(out2.contains(""""HTTP_status_code":"404""""))
    assert(out2.contains(""""HTTP_reason":"Not Found""""))
  }

  test("app-layer ftp: code vs command vs the UNKNOWN fallthrough (ftp_parser.c)") {
    def ftp(payload: String): String = graft.sources.Sources.impcapDecode(
      Seq((1L, pkt(ethIp4 + ip4Tcp20 + tcpTo("00 15")) ++
        payload.getBytes("US-ASCII"))).toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(ftp("USER alice\r\n").contains(""""FTP_request":"USER""""))
    assert(ftp("230 Login ok\r\n").contains(""""FTP_response":230"""))
    // non-numeric unknown first token reports UNKNOWN (the reference's
    // own fallthrough: check_Command_ftp never returns NULL)
    assert(ftp("XYZZY now\r\n").contains(""""FTP_request":"UNKNOWN""""))
  }

  test("app-layer smb2: header fields, LE layout, R flag (smb_parser.c)") {
    val smb = "FE 53 4D 42" + "40 00" + "00 00" + // magic, hdrLen 64, pad
      "16 00 00 00" +  // ntStatus 22 (LE)
      "05 00" + "00 00" + // opCode CREATE, pad2
      "01 00 00 00" +  // flags = R
      "00 00 00 00" +  // chainOffset
      "2A 00 00 00 00 00 00 00" + // comSeq 42
      "07 00 00 00" +  // processID 7
      "03 00 00 00" +  // treeID 3
      "09 00 00 00 00 00 00 00" + // userID 9
      "00 00 00 00 00 00 00 00 00 00 00 00 00 00 00 00" // signature
    val out = graft.sources.Sources.impcapDecode(
      Seq((1L, pkt(ethIp4 + ip4Tcp20 + tcpTo("01 BD") + smb)))
        .toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(out.contains(""""SMB_version":2""")) // smb_parser.c:124 quirk
    assert(out.contains(""""SMB_NTstatus":22"""))
    assert(out.contains(""""SMB_operation":5"""))
    assert(out.contains(""""SMB_flags":"R""""))
    assert(out.contains(""""SMB_seqNumber":42"""))
    assert(out.contains(""""SMB_processID":7,"SMB_treeID":3,"SMB_userID":9"""))
    // short payload on the SMB port: no fields, no failure
    val short = graft.sources.Sources.impcapDecode(
      Seq((2L, pkt(ethIp4 + ip4Tcp20 + tcpTo("01 BD") + "FE 53 4D 42")))
        .toDF("id", "packet"))
      .select("vars_msg").as[String].collect().head
    assert(!short.contains("SMB_version"))
  }

  test("fuzz: random payloads on app ports never throw and always yield valid JSON") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val ports = Seq("00 35", "00 50", "1F 90", "00 15", "00 14", "01 BD")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val frames = (0 until 120).map { i =>
      val payload = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(payload)
      val port = ports(i % ports.length)
      val head =
        if (port == "00 35") // UDP for the DNS port
          pkt(ethIp4 +
            "45 00 00 00 00 00 00 00 40 11 00 00 0A 00 01 02 C0 A8 01 01" +
            "08 00 " + port + " 00 10 BE EF")
        else pkt(ethIp4 + ip4Tcp20 + tcpTo(port))
      (i.toLong, head ++ payload)
    }
    val out = graft.sources.Sources.impcapDecode(
      frames.toDF("id", "packet")).select("vars_msg").as[String].collect()
    assert(out.length == 120)
    out.foreach { j =>
      val node = mapper.readTree(j) // throws on any escaping/structure slip
      assert(node.isObject && node.has("impcap"), j.take(200))
    }
  }

  test("applayer single-parse extraction == 17x get_json_object (r15)") {
    // one frame per protocol branch + the fuzz mix, so every extracted
    // path is exercised both PRESENT and MISSING (missing keys must
    // stay null through json_tuple exactly as through get_json_object)
    val rnd = new scala.util.Random(0xBEEF17)
    val dns = "30 39 01 00 00 01 00 00 00 00 00 00" +
      "03 77 77 77 07 65 78 61 6D 70 6C 65 03 63 6F 6D 00 00 1C 00 01"
    val frames = Seq(
      pkt(ethIp4 +
        "45 00 00 00 00 00 00 00 40 11 00 00 0A 00 01 02 C0 A8 01 01" +
        "08 00 00 35 00 10 BE EF" + dns),
      pkt(ethIp4 + ip4Tcp20 + tcpTo("00 50")) ++
        "GET /p7 HTTP/1.1\r\nHost: h3.example\r\nXKey: v2\r\n\r\nbody"
          .getBytes("ISO-8859-1"),
      pkt(ethIp4 + ip4Tcp20 + tcpTo("00 15")) ++
        "USER u4\r\n".getBytes("ISO-8859-1"),
      pkt(ethIp4 + ip4Tcp20 + tcpTo("00 15")) ++
        "230 Login ok\r\n".getBytes("ISO-8859-1"),
      pkt(ethIp4 + ip4Tcp20 + tcpTo("01 BD") +
        "FE 53 4D 42 40 00 00 00 07 00 00 00 05 00 00 00 01 00 00 00" +
        "00 00 00 00 09 00 00 00 00 00 00 00 0A 00 00 00 0B 00 00 00" +
        "0C 00 00 00 00 00 00 00" + "00" * 32)
    ) ++ (0 until 40).map { _ =>
      val payload = new Array[Byte](rnd.nextInt(100))
      rnd.nextBytes(payload)
      pkt(ethIp4 + ip4Tcp20 + tcpTo("00 50")) ++ payload
    }
    val dec = graft.sources.Sources.impcapDecode(
      frames.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("id", "packet"))
    val flat = Seq("DNS_transaction_id", "DNS_error", "HTTP_method",
      "HTTP_request_URI", "FTP_request", "FTP_response", "SMB_version",
      "SMB_NTstatus", "SMB_operation", "SMB_flags", "SMB_seqNumber",
      "SMB_treeID", "SMB_userID")
    val nested = Seq("DNS_Names[0].qname", "DNS_Names[0].type",
      "HTTP_header_fields.Host", "HTTP_header_fields.XKey")
    val direct = dec.select(
      (flat ++ nested).map(p =>
        get_json_object(col("vars_msg"), "$.impcap." + p).as(p)): _*)
      .collect().map(_.toSeq).toSeq
    val staged = dec
      .withColumn("__imp", get_json_object(col("vars_msg"), "$.impcap"))
      .select(Seq(col("__imp")) :+ json_tuple(col("__imp"), flat: _*): _*)
      .toDF(("__imp" +: flat.map("f_" + _)): _*)
      .select(flat.map(f => col("f_" + f).as(f)) ++
        nested.map(p => get_json_object(col("__imp"), "$." + p).as(p)): _*)
      .collect().map(_.toSeq).toSeq
    assert(staged == direct)
  }
}
