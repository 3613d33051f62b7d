package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.{RatelimitPolicy, RsyslogConfig}
import graft.operators.RateLimit

/** Named ratelimit() objects + YAML policy files (runtime/ratelimit.c,
  * rsconf.c initFunc_ratelimit) — the policy parser, the duration
  * grammar, override resolution, the action/input application, and the
  * policyWatch hot-reload face. Replays the shapes of
  * tests/action-ratelimit-drop.sh, action-ratelimit-pace.sh,
  * action-ratelimit-reload.sh and imptcp-persource-ratelimit-policy.sh.
  */
class RatelimitPolicySpec extends SparkSpec {
  import spark.implicits._

  private def tmpPolicy(text: String): java.io.File = {
    val f = java.io.File.createTempFile("rlpolicy", ".yaml")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, text.getBytes("UTF-8"))
    f
  }

  test("duration grammar: bare=s, ms must be whole seconds, m/h scale") {
    assert(RatelimitPolicy.durationSeconds("2") == 2L)
    assert(RatelimitPolicy.durationSeconds("2s") == 2L)
    assert(RatelimitPolicy.durationSeconds("2000ms") == 2L)
    assert(RatelimitPolicy.durationSeconds("3m") == 180L)
    assert(RatelimitPolicy.durationSeconds("1h") == 3600L)
    intercept[IllegalArgumentException](
      RatelimitPolicy.durationSeconds("1500ms"))
    intercept[IllegalArgumentException](
      RatelimitPolicy.durationSeconds("2d"))
  }

  test("policy parse: action-ratelimit-drop.sh output policy") {
    val p = RatelimitPolicy.parse(
      """scope: output
        |mode: drop
        |interval: 60
        |burst: 5
        |""".stripMargin)
    assert(p.scope == "output" && p.mode == "drop")
    assert(p.intervalSec == 60L && p.burst == 5L)
    assert(p.perSource.isEmpty)
  }

  test("policy parse: imptcp per-source policy with override") {
    val p = RatelimitPolicy.parse(
      """perSource:
        |  enabled: true
        |  keyTemplate: "PerSourceKey"
        |  default:
        |    max: 5
        |    window: 2s
        |  overrides:
        |    - key: "quiethost"
        |      max: 50
        |      window: 2s
        |""".stripMargin)
    val ps = p.perSource.get
    assert(ps.keyTemplate.contains("PerSourceKey"))
    assert(ps.limitFor("anyhost") == (5L, 2L))
    assert(ps.limitFor("quiethost") == (50L, 2L))
  }

  test("policy validation: bad scope/mode rejected, perSource needs default") {
    intercept[IllegalArgumentException](RatelimitPolicy.parse("scope: nope"))
    intercept[IllegalArgumentException](RatelimitPolicy.parse("mode: slow"))
    intercept[IllegalArgumentException](RatelimitPolicy.parse(
      "perSource:\n  enabled: true\n"))
  }

  test("replay action-ratelimit-drop.sh: 20 injected, first 5 delivered") {
    val f = tmpPolicy("scope: output\nmode: drop\ninterval: 60\nburst: 5\n")
    val cfg = RsyslogConfig.parse(
      s"""ratelimit(name="out_drop" policy="${f.getPath}")""")
    val policy = cfg.ratelimitPolicy("out_drop").get
    val df = (0 until 20).map(i => (i.toLong, "2024-03-01 10:00:00"))
      .toDF("num", "t").withColumn("ts", to_timestamp(col("t")))
    val out = RateLimit.enforce(
      RateLimit.applyPolicy(df, policy, lit("all"), col("ts"), col("num")),
      policy)
    // seq_check 0 4: exactly the first five pass
    assert(out.select("num").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("pace mode keeps excess rows, marked for transport pacing") {
    val p = RatelimitPolicy.parse(
      "scope: output\nmode: pace\ninterval: 60\nburst: 3\n")
    val df = (0 until 6).map(i => (i.toLong, "2024-03-01 10:00:00"))
      .toDF("num", "t").withColumn("ts", to_timestamp(col("t")))
    val out = RateLimit.enforce(
      RateLimit.applyPolicy(df, p, lit("all"), col("ts"), col("num")), p)
    assert(out.count() == 6)
    assert(out.filter(col("rl_limited")).count() == 3)
  }

  test("per-source override + severity exemption without budget use") {
    val p = RatelimitPolicy.parse(
      """severity: 4
        |perSource:
        |  enabled: true
        |  default:
        |    max: 2
        |    window: 60s
        |  overrides:
        |    - key: "quiethost"
        |      max: 4
        |""".stripMargin)
    // per host: 6 messages, severities 0,7,7,7,7,7 — the severity-0
    // (exempt) row passes and must NOT consume bucket budget
    val rows = for (h <- Seq("h1", "quiethost"); i <- 0 until 6)
      yield (h, i.toLong, if (i == 0) 0 else 7, "2024-03-01 10:00:00")
    val df = rows.toDF("host", "num", "sev", "t")
      .withColumn("ts", to_timestamp(col("t")))
    val out = RateLimit.applyPolicy(df, p, col("host"), col("ts"),
      col("num"), col("sev"))
    val passed = out.filter(!col("rl_limited"))
      .groupBy("host").count().as[(String, Long)].collect().toMap
    // h1: exempt row + 2 budget; quiethost: exempt row + 4 budget
    assert(passed("h1") == 3L)
    assert(passed("quiethost") == 5L)
  }

  test("replay action-ratelimit-reload.sh: per-epoch re-resolution") {
    val f = tmpPolicy("scope: output\nmode: drop\ninterval: 60\nburst: 2\n")
    val cfg = RsyslogConfig.parse(
      s"""ratelimit(name="r" policy="${f.getPath}")""")
    assert(cfg.ratelimitPolicy("r").get.burst == 2L)
    // rewrite the policy file — the next resolution (≙ watch/HUP epoch)
    // sees the new limits, scope unchanged
    java.nio.file.Files.write(f.toPath,
      "scope: output\nmode: drop\ninterval: 60\nburst: 7\n".getBytes)
    assert(cfg.ratelimitPolicy("r").get.burst == 7L)
  }

  test("inline params merge: file fields win where set") {
    val f = tmpPolicy("burst: 9\n")
    val cfg = RsyslogConfig.parse(
      s"""ratelimit(name="m" interval="30" burst="5" severity="3" policy="${f.getPath}")""")
    val p = cfg.ratelimitPolicy("m").get
    assert(p.burst == 9L)        // file overrides
    assert(p.intervalSec == 30L) // inline survives (file leaves default)
    assert(p.severity == 3)
  }

  test("ratelimitKey renders the keyTemplate through the registry") {
    val cfg = RsyslogConfig.parse(
      """template(name="PerSourceKey" type="string" string="%hostname%")
        |ratelimit(name="ps" policy="/dev/null")
        |""".stripMargin)
    val p = RatelimitPolicy.Policy(perSource = Some(RatelimitPolicy.PerSource(
      enabled = true, Some("PerSourceKey"), 5L, 2L, Nil)))
    val df = Seq(("hostA", "m1")).toDF("hostname", "msg")
    val key = cfg.ratelimitKey(p, n => col(n))
    assert(df.select(key).as[String].head() == "hostA")
  }
}
