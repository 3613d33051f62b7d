package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches plain join results") {
    val big = (0 until 1000).map(i => (s"k${i % 3}", i.toLong)).toDF("key", "v")
    val small = Seq(("k0", "zero"), ("k1", "one"), ("k2", "two")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).agg(count(lit(1)), sum("v"))
      .collect()(0)
    val salted = Skew.saltedJoin(big, small, "key", col("v"), factor = 8)
      .agg(count(lit(1)), sum("v")).collect()(0)
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getLong(1) == salted.getLong(1))
  }

  test("salted aggregation equals direct aggregation") {
    val df = (0 until 1000).map(i => (s"k${i % 2}", i.toLong)).toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val salted = Skew.saltedAgg(df, "key", col("v"), factor = 4,
      partials = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      merge = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(direct.toSeq == salted.toSeq)
  }
}
