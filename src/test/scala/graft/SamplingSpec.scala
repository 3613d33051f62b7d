package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 2000)
    .map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("hash sample is deterministic across runs and repartitioning") {
    val a = Sampling.hashSample(docs, "id", numerator = 64)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(7), "id", numerator = 64)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("fraction lands near numerator/denominator") {
    val n = Sampling.hashSample(docs, "id", numerator = 64, digits = 2).count()
    // 64/256 = 25% of 2000 = 500 expected; md5 is uniform, allow ±20%
    assert(n > 400 && n < 600, s"got $n of 2000")
  }

  test("stratified sampling: adding rows to one stratum never changes another's selections") {
    val base = Sampling.stratifiedHashSample(docs, "lang", "id", numerator = 64)
      .filter($"lang" === "de").select("id").as[Long].collect().sorted.toSeq
    val grown = docs.unionByName(
      (10000 until 12000).map(i => (i.toLong, "en")).toDF("id", "lang"))
    val after = Sampling.stratifiedHashSample(grown, "lang", "id", numerator = 64)
      .filter($"lang" === "de").select("id").as[Long].collect().sorted.toSeq
    assert(base == after)
  }

  test("salt changes the selection, same salt reproduces it") {
    val s1 = Sampling.hashSample(docs, "id", 64, salt = "a")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs, "id", 64, salt = "b")
      .select("id").as[Long].collect().toSet
    val s1again = Sampling.hashSample(docs, "id", 64, salt = "a")
      .select("id").as[Long].collect().toSet
    assert(s1 == s1again && s1 != s2)
  }

  test("filter is a scan-side predicate: no shuffle in the plan") {
    val plan = Sampling.hashSample(docs, "id", 64).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling should not shuffle:\n$plan")
  }
}
