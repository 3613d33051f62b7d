package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RsyslogConfig

/** Preset decodes for the niche input transports, exercised through the
  * config activation path (input(type=..) + a bound feed) the way a
  * distro config would reach them. Reference semantics:
  *  - imklog: plugins/imklog/bsd.c submitSyslog (kernel-ts strip),
  *    imklog.c Syslog:245-277 (secondary PRI, kern-only gate)
  *  - imkmsg: contrib/imkmsg/kmsg.c submitSyslog:68-190
  *  - improg/imfifo: contrib/improg/improg.c enqLine:360-384
  *  - imhiredis: contrib/imhiredis/imhiredis.c enqMsg/enqMsgJson
  *  - imuxsock: plugins/imuxsock/imuxsock.c SubmitMsg:985-1091
  *  - imhttp: contrib/imhttp/imhttp.c doSubmitMsg:528-566
  */
class NicheTransportSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = to_timestamp(lit("2024-06-01 12:00:00"))

  test("imklog: secondary PRI wins, kernel ts stripped, kern-only gate") {
    val feed = Seq(
      "<6>[  12.345678] usb 1-1: new device",  // kern.info, ts stripped
      "<4>[ 99.5] <30>systemd[1]: started",    // systemd double-PRI -> 30
      "no pri at all",                         // klog default kern.info
      "<35>mail thing"                         // non-kern -> dropped
    ).toDF("value")
    val cfg = RsyslogConfig.parse(
      "module(load=\"imklog\")\ninput(type=\"imklog\")\n*.* /var/log/all\n")
    val out = cfg.activate(spark, feeds = Map("imklog" -> feed), now = t0)("")
      .frame.select("pri", "facility", "msg", "syslogtag")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    // the kern-only gate drops BOTH foreign-facility rows — including
    // the systemd secondary-PRI one (pri 30 → daemon), exactly like
    // Syslog()'s pri2fac check runs AFTER the secondary-PRI override
    assert(out.length == 2)
    assert(out.contains((6, 0, " usb 1-1: new device")))
    assert(out.contains((6, 0, "no pri at all")))
  }

  test("imklog: permitnonkernelfacility keeps foreign facilities incl. secondary PRI") {
    val feed = Seq("<35>mail thing",
      "<4>[ 99.5] <30>systemd[1]: started").toDF("value")
    val cfg = RsyslogConfig.parse(
      "input(type=\"imklog\" permitnonkernelfacility=\"on\")\n*.* /dev/null\n")
    val out = cfg.activate(spark, feeds = Map("imklog" -> feed), now = t0)("")
      .frame.select("pri", "msg").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((35, "mail thing"), (30, "systemd[1]: started")))
  }

  test("imkmsg: header parse, property tree, malformed drop") {
    val feed = Seq(
      "6,123,456789,-;pcieport: link up\n DEVICE=+pci:0000\n SUBSYSTEM=pci",
      "14,7,1;plain record",
      "garbage without header"
    ).toDF("value")
    val cfg = RsyslogConfig.parse(
      "input(type=\"imkmsg\")\n*.* /dev/null\n")
    val rows = cfg.activate(spark, feeds = Map("imkmsg" -> feed), now = t0)("")
      .frame.select("pri", "msg", "vars_msg").collect()
    assert(rows.length == 2)
    val byPri = rows.map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byPri(6)._1 == "pcieport: link up")
    assert(byPri(6)._2 ==
      """{"sequnum":123,"msg":"pcieport: link up","DEVICE":"+pci:0000","SUBSYSTEM":"pci"}""")
    assert(byPri(14)._2 == """{"sequnum":7,"msg":"plain record"}""")
  }

  test("improg/imfifo: line submit with tag PRI defaults, empty dropped") {
    val feed = Seq("line one", "", "line two").toDF("value")
    val cfg = RsyslogConfig.parse(
      "input(type=\"improg\" tag=\"prog:\" binary=\"/bin/x\")\n*.* /dev/null\n")
    val rows = cfg.activate(spark, feeds = Map("improg" -> feed), now = t0)("")
      .frame.select("pri", "app_name", "syslogtag", "msg").collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getInt(0) == 133 && r.getString(1) == "prog:" &&
      r.getString(2) == "prog:"))
  }

  test("imhiredis stream mode: fields under $!, $.redis metadata, empty msg") {
    val feed = Seq(("""{"k":"v","n":5}""", "111-0")).toDF("value", "index")
    val cfg = RsyslogConfig.parse(
      """input(type="imhiredis" mode="stream" key="logs"
        |      stream.consumergroup="g1" stream.consumername="c1")
        |*.* /dev/null
        |""".stripMargin)
    val r = cfg.activate(spark, feeds = Map("imhiredis" -> feed), now = t0)("")
      .frame.select("msg", "vars_msg", "vars_local", "facility", "severity")
      .collect().head
    assert(r.getString(0) == "")
    assert(r.getString(1) == """{"k":"v","n":5}""")
    assert(r.getString(2) ==
      """{"redis":{"stream":"logs","index":"111-0","group":"g1","consumer":"c1"}}""")
    assert(r.getInt(3) == 24 && r.getInt(4) == 7)
  }

  test("imuxsock: annotate appends trusted text, parsetrusted fills CEE root") {
    val feed = Seq(("<13>Jun  1 11:00:00 h1 app[42]: hello", 42L, 0L, 0L,
      "app", "/usr/bin/app", "app -d"))
      .toDF("value", "pid", "uid", "gid", "comm", "exe", "cmdline")
    val annotated = RsyslogConfig.parse(
      "input(type=\"imuxsock\" annotate=\"on\")\n*.* /dev/null\n")
      .activate(spark, feeds = Map("imuxsock" -> feed), now = t0)("")
      .frame.select("msg").as[String].collect().head
    assert(annotated ==
      " hello @[_PID=42 _UID=0 _GID=0 _COMM=app _EXE=/usr/bin/app _CMDLINE=app -d]")
    val trusted = RsyslogConfig.parse(
      "input(type=\"imuxsock\" annotate=\"on\" parsetrusted=\"on\")\n*.* /dev/null\n")
      .activate(spark, feeds = Map("imuxsock" -> feed), now = t0)("")
      .frame.select("msg", "vars_msg").collect().head
    assert(trusted.getString(0) == " hello")
    assert(trusted.getString(1) ==
      """{"pid":42,"uid":0,"gid":0,"appname":"app","exe":"/usr/bin/app","cmd":"app -d"}""")
  }

  test("imuxsock: per-PID ratelimit, emergencies exempt") {
    // pid 42 floods 5 notice messages in one window (burst 2) plus one
    // emerg (severity 0 < threshold 1 -> exempt); pid 7 sends 1
    val rows = (1 to 5).map(i =>
      (s"<13>Jun  1 11:00:0$i app[42]: flood $i", 42L, i.toLong)) ++
      Seq(("<8>Jun  1 11:00:06 app[42]: panic", 42L, 6L),
          ("<13>Jun  1 11:00:07 other[7]: ok", 7L, 7L))
    val feed = rows.toDF("value", "pid", "seq")
    val cfg = RsyslogConfig.parse(
      """input(type="imuxsock" ratelimit.interval="60" ratelimit.burst="2")
        |*.* /dev/null
        |""".stripMargin)
    val out = cfg.activate(spark, feeds = Map("imuxsock" -> feed), now = t0)("")
      .frame.select("msg").as[String].collect().toSeq.sorted
    assert(out == Seq(" flood 1", " flood 2", " ok", " panic"))
  }

  test("imtuxedoulog: README cases 1-4 parse; Java exception lines dropped") {
    val feed = Seq(
      ("105211.70.sic-in2-tmsl1!IMSproxiCSFI4EC.26607818.1.0: TSAM_CAT:305:4563628752 ; I ;TPSUCCESS service", 1),
      ("011458.705.sic-tst-tmsl1!LMS.5243392.772.3: TSAM_CAT:305: WARN: (23498) times logon", 2),
      ("105211.704.sic-in2-tmsl1!IMSproxiCSFI4EC.26607818.1.0: ECID <000003GBORvD4iopwSXBiW01xG2M00001n>: 4563628752", 3),
      ("164313.151.sic-tst-tmsm1!ARTIMPP_UDB.42722.1.0: gtrid x0 x2 a0f: ECID <000001833^5pVl3iY00f003UF^>: TRACE:at", 4),
      ("\tat java.base/jdk.internal.misc.Unsafe.park(Native Method)", 5)
    ).toDF("value", "case_no")
      .withColumn("filedate", to_date(lit("2024-03-15")))
    val cfg = RsyslogConfig.parse(
      "input(type=\"imtuxedoulog\" ulogbase=\"/app/ULOG\")\n*.* /dev/null\n")
    val rows = cfg.activate(spark, feeds = Map("imtuxedoulog" -> feed), now = t0)("")
      .frame.select("case_no", "hostname", "procid", "structured_data", "msg")
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    assert(rows.size == 4) // the Java line fails the time scan
    assert(rows(1) == ("sic-in2-tmsl1", "IMSproxiCSFI4EC.26607818.1", null,
      "TSAM_CAT:305:4563628752 ; I ;TPSUCCESS service"))
    assert(rows(2) == ("sic-tst-tmsl1", "LMS.5243392.772", null,
      "TSAM_CAT:305: WARN: (23498) times logon"))
    assert(rows(3) == ("sic-in2-tmsl1", "IMSproxiCSFI4EC.26607818.1",
      "[ECID=\"000003GBORvD4iopwSXBiW01xG2M00001n\"]", "4563628752"))
    assert(rows(4) == ("sic-tst-tmsm1", "ARTIMPP_UDB.42722.1",
      "[ECID=\"000001833^5pVl3iY00f003UF^\"]", "TRACE:at"))
  }

  test("imsolaris: header PRI/time win, in-body date ignored, receiver hostname") {
    val feed = Seq(("Oct 11 22:14:15 su: 'su root' failed", 10, 1700000123L))
      .toDF("value", "pri", "ctl_sec")
    val cfg = RsyslogConfig.parse(
      "input(type=\"imsolaris\")\n*.* /dev/null\n")
    val r = cfg.activate(spark, feeds = Map("imsolaris" -> feed), now = t0)("")
      .frame.select("pri", "facility", "severity", "syslogtag", "msg",
        "ts", "hostname", "fromhost").collect().head
    assert(r.getInt(0) == 10 && r.getInt(1) == 1 && r.getInt(2) == 2)
    assert(r.getString(3) == "su:")
    assert(r.getString(4) == " 'su root' failed")
    assert(r.getTimestamp(5).getTime / 1000 == 1700000123L) // not Oct 11
    assert(r.getString(6) == r.getString(7)) // receiver, never parsed
  }

  test("imhttp: parser chain runs, metadata lands under $!metadata") {
    val feed = Seq(("<13>Jun  1 11:00:00 h9 web: request",
      "10.1.2.3", """{"user-agent":"curl/8"}""", """{"q":"1"}"""))
      .toDF("value", "remoteaddr", "headers_json", "query_json")
    val cfg = RsyslogConfig.parse(
      "input(type=\"imhttp\" addmetadata=\"on\")\n*.* /dev/null\n")
    val r = cfg.activate(spark, feeds = Map("imhttp" -> feed), now = t0)("")
      .frame.select("hostname", "msg", "vars_msg", "fromhost").collect().head
    assert(r.getString(0) == "h9")
    assert(r.getString(1) == " request")
    assert(r.getString(2) ==
      """{"metadata":{"httpheaders":{"user-agent":"curl/8"},"queryparams":{"q":"1"}}}""")
    assert(r.getString(3) == "10.1.2.3")
  }
}
