package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** rsyslog lookup tables — the engine's only join primitive (reference:
  * runtime/lookup.c:830-846 selects one of four physical strategies;
  * probed by `lookup(name, key)` grammar/rainerscript.c:2682).
  *
  * Spark-first re-expression:
  *  - `string`       → literal map (config-scale) or broadcast hash join
  *  - `array`        → dense offset: key - firstIdx into a literal array
  *  - `sparseArray`  → floor-match on sorted ranges → broadcast range join
  *                     (lo ≤ key < next-lo), the plan AQE can still tune
  *  - `regex`        → ordered first-match-wins `when` chain (broadcastable)
  * All carry rsyslog's `nomatch` stub value. Hot reload ≡ rebuilding the
  * broadcast per micro-batch epoch (foreachBatch re-reads the file).
  */
sealed trait LookupTable {
  def nomatch: String
  /** Probe as a Column expression (broadcast-literal strategy — the
    * config-file-scale path matching rsyslog's in-memory tables). */
  def probe(key: Column): Column
}

case class StringLookup(entries: Map[String, String], nomatch: String) extends LookupTable {
  def probe(key: Column): Column = {
    val m = typedlit(entries)
    coalesce(element_at(m, key.cast("string")), lit(nomatch))
  }
  /** Scale path: broadcast left join against a key/value DataFrame. */
  def joinDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toSeq.toDF("lk_key", "lk_value")
  }
}

case class ArrayLookup(firstIndex: Long, values: IndexedSeq[String], nomatch: String)
    extends LookupTable {
  def probe(key: Column): Column = {
    val arr = typedlit(values)
    val idx = (key.cast("long") - firstIndex + 1).cast("int")
    coalesce(
      when(idx >= 1 && idx <= values.size, element_at(arr, idx)),
      lit(nomatch))
  }
}

case class SparseArrayLookup(sorted: IndexedSeq[(Long, String)], nomatch: String)
    extends LookupTable {
  /** floor match: greatest index ≤ key (runtime/lookup.c:673-677). Emitted
    * as a binary-search-shaped nested when-chain over the sorted bounds —
    * constant-folded, codegen-friendly, no UDF. */
  def probe(key: Column): Column = {
    def build(lo: Int, hi: Int): Column = {
      if (lo > hi) lit(nomatch)
      else if (lo == hi) {
        when(key >= sorted(lo)._1, lit(sorted(lo)._2)).otherwise(lit(nomatch))
      } else {
        val mid = (lo + hi + 1) / 2
        when(key >= sorted(mid)._1, build(mid, hi)).otherwise(build(lo, mid - 1))
      }
    }
    build(0, sorted.size - 1)
  }
  /** Scale path: range DataFrame (lo, hi, value) for a broadcast range join. */
  def rangeDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = sorted.zipWithIndex.map { case ((lo, v), i) =>
      val hi = if (i + 1 < sorted.size) sorted(i + 1)._1 else Long.MaxValue
      (lo, hi, v)
    }
    rows.toDF("lk_lo", "lk_hi", "lk_value")
  }
}

case class RegexLookup(patterns: IndexedSeq[(String, String)], nomatch: String)
    extends LookupTable {
  /** ordered, first match wins (runtime/lookup.c:742). */
  def probe(key: Column): Column =
    patterns.foldRight(lit(nomatch): Column) { case ((re, v), rest) =>
      when(key.rlike(re), lit(v)).otherwise(rest)
    }
}

object LookupTable {
  private val mapper = new ObjectMapper()

  /** Load an rsyslog lookup-table JSON file:
    * {"version":1,"nomatch":"x","type":"string","table":[{"index":..,"value":..}]}
    */
  /** A malformed table file (empty, invalid JSON, wrong version/type,
    * missing table array) STUBS the table — every lookup returns the
    * nomatch value and the engine keeps running
    * (lookupReloadOrStub/lookupInitTable failure paths,
    * runtime/lookup.c:910-1011; tests/lookup_table_bad_configs.sh).
    * Rows missing index/value are skipped individually. */
  def load(path: String): LookupTable =
    try fromJson(mapper.readTree(new java.io.File(path)))
    catch { case e: Exception => stubbed(path, e) }

  def loadString(json: String): LookupTable =
    try fromJson(mapper.readTree(json))
    catch { case e: Exception => stubbed("<inline>", e) }

  private def stubbed(src: String, e: Exception): LookupTable = {
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"lookup table could not be loaded from $src - STUBBED " +
      s"(every lookup returns nomatch): ${e.getMessage}")
    StringLookup(Map.empty, "")
  }

  private def fromJson(root: com.fasterxml.jackson.databind.JsonNode): LookupTable = {
    require(root != null && root.isObject, "lookup table file is not a JSON object")
    require(!root.has("version") || root.get("version").asInt(1) == 1,
      "unsupported lookup table version")
    val nomatch = if (root.has("nomatch")) root.get("nomatch").asText else ""
    val typ = if (root.has("type")) root.get("type").asText else "string"
    require(root.has("table") && root.get("table").isArray,
      "lookup table has no table array")
    val rows = root.get("table").elements().asScala.toIndexedSeq
      .filter(r => r.has("index") && r.has("value"))
    typ match {
      case "string" =>
        StringLookup(rows.map(r => r.get("index").asText -> r.get("value").asText).toMap, nomatch)
      case "array" =>
        val pairs = rows.map(r => r.get("index").asLong -> r.get("value").asText)
          .sortBy(_._1)
        if (pairs.isEmpty) StringLookup(Map.empty, nomatch)
        else ArrayLookup(pairs.head._1, pairs.map(_._2), nomatch)
      case "sparseArray" =>
        SparseArrayLookup(
          rows.map(r => r.get("index").asLong -> r.get("value").asText).sortBy(_._1),
          nomatch)
      case "regex" =>
        RegexLookup(rows.map(r => r.get("index").asText -> r.get("value").asText), nomatch)
      case other => throw new IllegalArgumentException(s"unknown lookup type: $other")
    }
  }
}
