package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JsonPathUtil

/** Property-based hardening of the JSON mutation kernels — the engine's
  * central custom-Expression family (every `set`/`unset`/overlay read
  * rides on these). Pure driver-side checks against Jackson re-parse,
  * no Spark session needed. */
class JsonKernelPropertySpec extends AnyFunSuite {

  private def u(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // '!'-separated path segments: alphanumeric, nonempty
  private val seg: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val path: Gen[List[String]] = Gen.chooseNum(1, 4).flatMap(n =>
    Gen.listOfN(n, seg))
  // scalar strings that putTagged stores verbatim (not JSON-shaped):
  // any unicode string whose trim doesn't open an object/array
  private val scalarStr: Gen[String] =
    Gen.asciiPrintableStr.suchThat(s => {
      val t = s.trim; !t.startsWith("{") && !t.startsWith("[")
    })

  private def read(json: String, segs: List[String]): Option[String] = {
    var cur = JsonPathUtil.mapper.readTree(json)
    segs.foreach { s => if (cur != null) cur = cur.get(s) }
    if (cur == null || cur.isNull) None
    else if (cur.isTextual) Some(cur.asText())
    else Some(cur.toString)
  }

  test("set-then-read round-trips any non-JSON-shaped string") {
    check(Prop.forAll(path, scalarStr) { (p, v) =>
      val out = JsonPathUtil.setKernel(u("{}"), u(p.mkString("!")), u(v), 4)
      read(out.toString, p).contains(v)
    })
  }

  test("set of one path never disturbs a disjoint sibling") {
    check(Prop.forAll(path, path, scalarStr, scalarStr) { (p1, p2, v1, v2) =>
      // prefix-overlapping paths legitimately replace subtrees — the
      // invariant under test is disjoint-sibling isolation
      val overlap = p1.zip(p2).takeWhile { case (a, b) => a == b }.length ==
        math.min(p1.length, p2.length)
      overlap || {
        val once = JsonPathUtil.setKernel(u("{}"), u(p1.mkString("!")), u(v1), 4)
        val twice = JsonPathUtil.setKernel(once, u(p2.mkString("!")), u(v2), 4)
        read(twice.toString, p1).contains(v1) &&
        read(twice.toString, p2).contains(v2)
      }
    })
  }

  test("unset removes exactly the written path") {
    check(Prop.forAll(path, scalarStr) { (p, v) =>
      val set = JsonPathUtil.setKernel(u("{}"), u(p.mkString("!")), u(v), 4)
      val unset = JsonPathUtil.unsetKernel(set, u(p.mkString("!")))
      read(unset.toString, p).isEmpty
    })
  }

  test("exists agrees with a Jackson walk after set") {
    check(Prop.forAll(path, scalarStr) { (p, v) =>
      val set = JsonPathUtil.setKernel(u("{}"), u(p.mkString("!")), u(v), 4)
      JsonPathUtil.existsKernel(set, u(p.mkString("!"))) &&
      !JsonPathUtil.existsKernel(u("{}"), u(p.mkString("!")))
    })
  }

  test("numeric tags store JSON numbers whose text equals the Scala rendering") {
    check(Prop.forAll(path, Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (p, n) =>
      val out = JsonPathUtil.setKernel(u("{}"), u(p.mkString("!")),
        java.lang.Long.valueOf(n), 0)
      read(out.toString, p).contains(n.toString)
    })
  }

  test("JSON-shaped string values embed as subtrees (the overlay fallback contract)") {
    check(Prop.forAll(path, seg, Gen.chooseNum(0L, 1000L)) { (p, k, n) =>
      val v = s"""{"$k":$n}"""
      val out = JsonPathUtil.setKernel(u("{}"), u(p.mkString("!")), u(v), 4)
      read(out.toString, p :+ k).contains(n.toString)
    })
  }
}
