package graft

import org.apache.spark.sql.GraftBridge.{column => gcol, expression => gexp}
import org.apache.spark.sql.functions._
import graft.functions.{MisraGriesAgg, MisraGriesSummary}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.unsafe.types.UTF8String

class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private def mg(col0: org.apache.spark.sql.Column, capacity: Int) =
    gcol(MisraGriesAgg(gexp(col0), capacity).toAggregateExpression())

  test("misra_gries: exact counts when distinct keys fit the capacity") {
    val data = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    val out = data.toDF("k").repartition(3)
      .agg(mg(col("k"), 8).as("m"))
      .as[Map[String, Long]].head()
    assert(out == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
  }

  test("misra_gries: heavy hitter survives over-capacity streams with a lower-bound count") {
    // 1000 "hot" + 900 distinct singletons, capacity 16: N=1900,
    // undercount <= N/(cap+1) ~ 112, so "hot" must survive with
    // count in [888, 1000].
    val data = Seq.fill(1000)("hot") ++ (1 to 900).map(i => s"one$i")
    val out = data.toDF("k").repartition(5)
      .agg(mg(col("k"), 16).as("m"))
      .as[Map[String, Long]].head()
    assert(out.size <= 16)
    assert(out.contains("hot"))
    val c = out("hot")
    assert(c <= 1000L && c >= 1000L - 1900L / 17)
  }

  test("misra_gries summary: merge respects the capacity bound and error budget") {
    val a = new MisraGriesSummary(4)
    val b = new MisraGriesSummary(4)
    (1 to 50).foreach(_ => a.add(UTF8String.fromString("x")))
    (1 to 5).foreach(i => a.add(UTF8String.fromString(s"a$i")))
    (1 to 40).foreach(_ => b.add(UTF8String.fromString("x")))
    (1 to 5).foreach(i => b.add(UTF8String.fromString(s"b$i")))
    a.mergeIn(b)
    assert(a.counts.size <= 4)
    val x = a.counts.get(UTF8String.fromString("x"))
    // true count 90, stream mass 100 -> lower bound >= 90 - 100/5 = 70
    assert(x <= 90L && x >= 70L)
  }

  test("hotNgrams: matches the brute-force exact GROUP BY on a small corpus") {
    val boiler = "terms of service apply here"
    val docs = (1 to 40).map(i => (i.toLong, s"doc $i unique words $i then $boiler"))
      .toDF("doc_id", "text")
    // denom large enough that threshold = floorCount = 5
    val got = TextAnalysis.hotNgrams(docs, "text", n = 3,
        denom = 100000L, floorCount = 5L, capacity = 1 << 17)
      .as[(String, Long)].collect().toMap
    val want = docs
      .select(explode(TextAnalysis.wordNgrams(
        TextAnalysis.tokens(col("text")), 3)).as("g"))
      .groupBy("g").count().filter(col("count") >= 5)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got.contains("terms of service"))
  }

  test("hotNgrams: rejects capacity <= denom (superset guarantee precondition)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.hotNgrams(docs, "text", denom = 1000L, capacity = 999)
    }
  }

  test("snapshotDedup: equals the plain anti-join, exact despite bloom fpp") {
    // tiny bloom (1024 bits) + 500 snapshot keys => high fpp, so the
    // verify branch really exercises; result must still be exact.
    val snap = (1 to 500).map(i => (i.toLong, s"snapshot doc number $i"))
      .toDF("doc_id", "text")
    val input = (1 to 600).map(i =>
      (1000L + i, if (i % 3 == 0) s"snapshot doc number $i" else s"fresh doc $i"))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDedup(input, snap, "doc_id", "text",
        expectedItems = 500, numBits = 1024)
      .select("doc_id").as[Long].collect().toSet
    val fp = TextAnalysis.fingerprint(col("text"))
    val want = input.select(col("doc_id"), fp.as("fp"))
      .join(snap.select(fp.as("fp")), Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    // i%3==0 with i<=500 collide with the snapshot; i in (500,600] divisible
    // by 3 do NOT (snapshot stops at 500)
    val expectedDropped = (1 to 500).count(i => i % 3 == 0)
    assert(got.size == 600 - expectedDropped)
  }

  test("snapshotDedup: empty snapshot keeps every input row") {
    val input = (1 to 20).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val got = Dedup.snapshotDedup(input, empty, "doc_id", "text")
    assert(got.count() == 20L)
  }
}
