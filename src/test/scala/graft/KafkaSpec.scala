package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

/** Protocol-level Kafka coverage: this sandbox has no broker AND no
  * spark-sql-kafka connector jar, so what the engine owns — the source/
  * sink CONTRACT frames (imkafka decode, omkafka dynatopic shaping) — is
  * tested on synthesized contract-shaped frames. The connector only
  * changes who produces/consumes those columns.
  */
class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private def kafkaSourceFrame = {
    // the exact Spark kafka source schema (key/value BINARY + metadata)
    Seq(
      ("<13>Jan  2 03:04:05 host1 app[7]: hello", "k1", "syslog.a", 0, 100L),
      ("<166>Jan  2 03:04:06 host2 cron[8]: tick", "k2", "syslog.b", 1, 101L))
      .toDF("v", "k", "topic", "partition", "offset")
      .select(col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
  }

  test("imkafkaDecode: contract columns decode with imkafka provenance") {
    val out = Sources.imkafkaDecode(kafkaSourceFrame).collect()
      .sortBy(_.getAs[Long]("offset"))
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[String]("inputname") == "imkafka")
    assert(r.getAs[String]("topic") == "syslog.a")
    assert(r.getAs[Int]("partition") == 0)
    assert(r.getAs[Long]("offset") == 100L)
    assert(r.getAs[String]("hostname") == "host1")
    assert(r.getAs[String]("programname") == "app")
    assert(r.getAs[String]("msg") == " hello") // msg keeps leading space
    assert(r.getAs[Int]("facility") == 1 && r.getAs[Int]("severity") == 5)
    val r2 = out(1)
    assert(r2.getAs[String]("hostname") == "host2" &&
      r2.getAs[Int]("facility") == 20)
  }

  test("kafkaSinkFrame: omkafka dynatopic shaping matches the sink contract") {
    val in = Seq((7L, "t-a", "line one"), (8L, "t-b", "line two"))
      .toDF("id", "dyn_topic", "rendered")
    val shaped = Sources.kafkaSinkFrame(in, "dyn_topic", "rendered")
    // contract: exactly topic+value (no stray columns — the kafka sink
    // rejects unknown columns), both string-typed
    assert(shaped.schema == StructType(Seq(
      StructField("topic", StringType, nullable = true),
      StructField("value", StringType, nullable = true))))
    val rows = shaped.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set("t-a" -> "line one", "t-b" -> "line two"))
  }

  test("kafkaSinkFrame: optional key column rides as the partitioning key") {
    val in = Seq((7L, "t", "x")).toDF("id", "topic_col", "val_col")
    val shaped = Sources.kafkaSinkFrame(in, "topic_col", "val_col", keyCol = Some("id"))
    assert(shaped.columns.toSeq == Seq("topic", "value", "key"))
    assert(shaped.collect().head.getAs[String]("key") == "7")
  }

  test("round-trip: sink shaping feeds back through source decode") {
    val ev = Seq(("<13>Jan  2 03:04:05 h a[1]: m", "logs.app"))
      .toDF("rendered", "dyn")
    val sinkSide = Sources.kafkaSinkFrame(ev, "dyn", "rendered")
    // what the broker would hand back on the source side
    val sourceSide = sinkSide.select(
      lit(null).cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      col("topic"), lit(0).as("partition"), lit(0L).as("offset"))
    val decoded = Sources.imkafkaDecode(sourceSide).collect().head
    assert(decoded.getAs[String]("topic") == "logs.app")
    assert(decoded.getAs[String]("msg") == " m")
  }
}
