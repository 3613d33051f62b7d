package graft

import org.apache.spark.sql.functions._
import graft.functions.rainer

/** The reference's parsertest-parse1.sh corpus — the de-facto spec of the
  * default pmrfc3164/pmrfc5424 chain — replayed through SyslogParseExpr.
  * Each row asserts (pri, rendered 3164 timestamp, hostname, programname,
  * tag, msg) against the test's exported EXPECTED table verbatim.
  * Receiver-dependent fields ($RS_HOSTNAME rows) assert null here (our
  * analogue of "hostname = receiving host"); timestamps parsed from an
  * explicit UTC offset assert the instant instead of the local rendering.
  */
class Rfc3164CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def parse(raw: String): org.apache.spark.sql.Row =
    Seq(raw).toDF("raw")
      .select(rainer.parse_syslog(col("raw"), defaultYear = 2024).as("p"))
      .select(col("p.*"),
        concat(date_format(col("p.ts"), "MMM "),
          lpad(date_format(col("p.ts"), "d"), 2, " "),
          date_format(col("p.ts"), " HH:mm:ss")).as("ts3164"))
      .collect()(0)

  // (raw, pri, ts3164-rendered, hostname, programname, tag, msg)
  private val corpus: Seq[(String, Int, String, String, String, String, String)] = Seq(
    ("<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: UDP request discarded from SERVER1/2741 to test_app:255.255.255.255/61601",
      167, "Mar  6 16:57:54", "172.20.245.8", "%PIX-7-710005", "%PIX-7-710005:",
      " UDP request discarded from SERVER1/2741 to test_app:255.255.255.255/61601"),
    ("<167>Mar 27 19:06:53 source_server sshd(pam_unix)[12750]: session opened for user foo by (uid=0)",
      167, "Mar 27 19:06:53", "source_server", "sshd(pam_unix)", "sshd(pam_unix)[12750]:",
      " session opened for user foo by (uid=0)"),
    ("<167>Apr  6 15:07:10 lxcvs07 sshd(pam_unix)[31738]: session closed for user cvsadmin",
      167, "Apr  6 15:07:10", "lxcvs07", "sshd(pam_unix)", "sshd(pam_unix)[31738]:",
      " session closed for user cvsadmin"),
    ("<167>Jul 31 21:39:21 example-b example-gw[10538]: disconnect host=/192.0.2.1 destination=192.0.2.2/11282 in=3274 out=1448 duration=0",
      167, "Jul 31 21:39:21", "example-b", "example-gw", "example-gw[10538]:",
      " disconnect host=/192.0.2.1 destination=192.0.2.2/11282 in=3274 out=1448 duration=0"),
    ("<167>AUG 10 22:18:24 host tag This msg contains 8-bit European chars: äöü",
      167, "Aug 10 22:18:24", "host", "tag", "tag",
      " This msg contains 8-bit European chars: äöü"),
    ("<167> Mar  7 19:06:53 example tag: testmessage (only date actually tested)",
      167, "Mar  7 19:06:53", "example", "tag", "tag:",
      " testmessage (only date actually tested)"),
    ("<167>Mar 7 2008 19:06:53: example tag: testmessage (only date actually tested)",
      167, "Mar  7 19:06:53", "example", "tag", "tag:",
      " testmessage (only date actually tested)"),
    ("<167>Mar 7 2008 19:06:53 example tag: testmessage (only date actually tested)",
      167, "Mar  7 19:06:53", "example", "tag", "tag:",
      " testmessage (only date actually tested)"),
    ("<167>Mar 7 19:06:53: example tag: testmessage (only date actually tested)",
      167, "Mar  7 19:06:53", "example", "tag", "tag:",
      " testmessage (only date actually tested)"),
    ("<14>Jan  6 2009 15:22:26 localhost",
      14, "Jan  6 15:22:26", "localhost", null, null, ""),
    ("<167>Oct  8 23:05:06 10.321.1.123 05\",result_code=200,b",
      167, "Oct  8 23:05:06", "10.321.1.123",
      "05\",result_code=200,b", "05\",result_code=200,b", ""),
    ("<167>Feb 18 16:01:59 serverX -- MARK --",
      167, "Feb 18 16:01:59", "serverX", "--", "--", " MARK --"),
    ("Feb 18 16:01:59 serverX -- MARK --",
      13, "Feb 18 16:01:59", "serverX", "--", "--", " MARK --"),
    ("<38>Mar 27 19:06:53 source_server 0123456789012345678901234567890123456789: MSG part",
      38, "Mar 27 19:06:53", "source_server",
      "0123456789012345678901234567890123456789",
      "0123456789012345678901234567890123456789:", " MSG part"),
    ("<29>Oct 16 20:47:24 example-p exam-pl[12345]: connect host= /192.0.2.1",
      29, "Oct 16 20:47:24", "example-p", "exam-pl", "exam-pl[12345]:",
      " connect host= /192.0.2.1"),
    ("<34>Oct 11 22:14:15 mymachine su: su root failed for lonvick on /dev/pts/8",
      34, "Oct 11 22:14:15", "mymachine", "su", "su:",
      " su root failed for lonvick on /dev/pts/8"),
    // RFC5424 rows: TAG without colon, one SP after SD consumed
    ("<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - BOMsu root failed for lonvick on /dev/pts/8",
      34, "Oct 11 22:14:15", "mymachine.example.com", "su", "su",
      "BOMsu root failed for lonvick on /dev/pts/8"),
    ("<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut=\"3\" eventSource= \"Application\" eventID=\"1011\"][examplePriority@32473 class=\"high\"]",
      165, "Oct 11 22:14:15", "mymachine.example.com", "evntslog", "evntslog", ""),
    ("<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut=\"3\" eventSource= \"Application\" eventID=\"1011\"] BOMAn application event log entry...",
      165, "Oct 11 22:14:15", "mymachine.example.com", "evntslog", "evntslog",
      "BOMAn application event log entry..."),
    // year AFTER time is NOT consumed by default: it becomes the hostname
    ("<6>AUG 10 22:18:24 2009  netips-warden2-p [audit] user=[*SMS] src=192.168.11.11 iface=5 access=9 Update State Reset",
      6, "Aug 10 22:18:24", "2009", null, null,
      " netips-warden2-p [audit] user=[*SMS] src=192.168.11.11 iface=5 access=9 Update State Reset"),
    ("<14>Aug 30 23:00:05 X4711 AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
      14, "Aug 30 23:00:05", "X4711",
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA", ""),
    ("<14>Aug 30 23:00:05 X4711 ", 14, "Aug 30 23:00:05", "X4711", null, null, ""),
    ("<14>Aug 30 23:00:05 X4711", 14, "Aug 30 23:00:05", "X4711", null, null, ""),
    ("<14>Aug 30 23:00:05 ", 14, "Aug 30 23:00:05", null, null, null, ""),
    ("<14>Aug 30 23:00:05", 14, "Aug 30 23:00:05", null, null, null, ""),
    ("<14>2010-08-30T23:00:05Z X4711 AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
      14, "Aug 30 23:00:05", "X4711",
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA", ""),
    ("<14>2010-08-30T23:00:05Z X4711 ", 14, "Aug 30 23:00:05", "X4711", null, null, ""),
    ("<14>2010-08-30T23:00:05Z X4711", 14, "Aug 30 23:00:05", "X4711", null, null, ""),
    // parsertest-parse-nodate.sh: no timestamp — parsing continues;
    // hostname = receiver (null here) for the tag-first row, and the
    // classic BSD mis-parse for the bare-text row
    ("<27>xapi: [error|xen3|15|Guest liveness monitor D:bca30ab3f1c1|master_connection] Connection to master died. I will continue to retry indefinitely (suppressing future logging of this message)",
      27, null, null, "xapi", "xapi:",
      " [error|xen3|15|Guest liveness monitor D:bca30ab3f1c1|master_connection] Connection to master died. I will continue to retry indefinitely (suppressing future logging of this message)"),
    ("This is a message!", 13, null, "This", "is", "is", " a message!")
  )

  test("parsertest-parse1 corpus: every row matches the reference EXPECTED table") {
    corpus.zipWithIndex.foreach { case ((raw, pri, ts, host, prog, tag, msg), idx) =>
      val r = parse(raw)
      def ctx(field: String, got: Any, want: Any) =
        assert(got == want, s"row $idx [$raw] $field: got '$got' want '$want'")
      ctx("pri", r.getAs[Int]("pri"), pri)
      if (ts != null) ctx("ts", r.getAs[String]("ts3164"), ts)
      ctx("hostname", r.getAs[String]("hostname"), host)
      ctx("programname", r.getAs[String]("programname"), prog)
      ctx("tag", r.getAs[String]("syslogtag"), tag)
      ctx("msg", r.getAs[String]("msg"), msg)
    }
  }

  test("parsertest-parse2: snare-style '#001' token is TAG, not hostname") {
    // tests/parsertest-parse2.sh: '#' is not a hostname char, so the
    // token stays TAG/MSG and hostname falls back to the receiver
    // (localHostname there; null here). #011 in the .sh = a real TAB.
    val body = "MSWinEventLog 0\tSecurity\t19023582\tFri Oct 16 16:30:44 " +
      "2009\t592\tSecurity\trgabcde\tUser\tSuccess Audit\tXSXSXSN01\t" +
      "Detailed Tracking\t\t2572\t19013885"
    val r = parse(s"<175>Oct 16 23:47:31 #001 $body")
    assert(r.getAs[Int]("pri") == 175)
    assert(r.getAs[Int]("facility") == 21)  // local5
    assert(r.getAs[Int]("severity") == 7)   // debug
    assert(r.getAs[String]("ts3164") == "Oct 16 23:47:31")
    assert(r.getAs[String]("hostname") == null)
    assert(r.getAs[String]("programname") == "#001")
    assert(r.getAs[String]("syslogtag") == "#001")
    assert(r.getAs[String]("msg") == s" $body")
  }

  test("parsertest-parse3: Cisco year-in-hour-position rows render csv fields") {
    // tests/parsertest-parse3.sh: "Oct 16 2009 23:47:31" — the year sits
    // where the hour would be; both rows share everything but [procid]
    val r1 = parse("<175>Oct 16 2009 23:47:31 hostname tag This is a message")
    assert(r1.getAs[java.sql.Timestamp]("ts").toInstant.toString
      == "2009-10-16T23:47:31Z")
    assert(r1.getAs[String]("hostname") == "hostname")
    assert(r1.getAs[String]("programname") == "tag")
    assert(r1.getAs[String]("syslogtag") == "tag")
    assert(r1.getAs[String]("procid") == null)
    assert(r1.getAs[Int]("severity") == 7)
    assert(r1.getAs[String]("msg") == " This is a message")
    val r2 = parse("<175>Oct 16 2009 23:47:31 hostname tag[1234] This is a message")
    assert(r2.getAs[String]("syslogtag") == "tag[1234]")
    assert(r2.getAs[String]("programname") == "tag")
    assert(r2.getAs[String]("procid") == "1234")
    assert(r2.getAs[String]("msg") == " This is a message")
  }

  test("offset timestamp row: instant preserved (our UTC normalization)") {
    // "<165>1 2003-08-24T05:14:15.000003-07:00 ..." — rsyslog renders the
    // original -07:00 local time; we normalize to a UTC instant
    val r = parse("<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc 8710 - - %% Its time to make the do-nuts.")
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant.toString
      == "2003-08-24T12:14:15.000003Z")
    assert(r.getAs[String]("hostname") == "192.0.2.1")
    assert(r.getAs[String]("syslogtag") == "myproc[8710]")
    assert(r.getAs[String]("programname") == "myproc")
    assert(r.getAs[String]("msg") == "%% Its time to make the do-nuts.")
  }
}
