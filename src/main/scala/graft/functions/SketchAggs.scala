package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary (Misra & Gries 1982; merge rule
  * from Agarwal et al. 2012, "Mergeable Summaries", PODS) as a mutable
  * aggregation buffer: at most `capacity` counters, every stored count a
  * LOWER bound on the item's true count, total undercount bounded by
  * N/(capacity+1) for a stream of N items — a bound that survives ANY
  * merge tree, which is what makes the sketch usable as a Spark partial
  * aggregate (per-partition buffers, arbitrary combine order).
  */
final class MisraGriesSummary(val capacity: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](capacity * 2)

  /** Stream update: increment if present; insert if room; else the
    * classic decrement-all step. Amortized O(1): each decrement-all
    * consumes one unit of previously-added count mass per entry, and
    * total mass added is the stream length. */
  def add(key: UTF8String): Unit = {
    val cur = counts.get(key)
    if (cur != 0L) counts.put(key, cur + 1L)
    else if (counts.size < capacity) counts.put(key.clone(), 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries combine: sum counters, then if over capacity
    * subtract the (capacity+1)-th largest value from every counter and
    * drop the non-positive — at most `capacity` survive (only counters
    * strictly above the pivot), and the subtraction adds the same
    * undercount a decrement-all sequence would. */
  def mergeIn(other: MisraGriesSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      // keys in a deserialized summary own their bytes — safe to share
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // pivot = (capacity+1)-th largest = index size-(capacity+1) ascending
      val pivot = vals(vals.length - capacity - 1)
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= pivot) ei.remove() else e.setValue(e.getValue - pivot)
      }
    }
  }
}

/** `misra_gries(expr, capacity)` — aggregate a string column into a
  * frequent-items map `MAP<STRING, BIGINT>` of at most `capacity`
  * entries whose values are count lower bounds with total error
  * ≤ N/(capacity+1). The scale story: the shuffle carries one
  * capacity-bounded buffer per partition instead of the full key stream,
  * so a corpus-wide "hot keys" pass costs a scan plus kilobytes of
  * exchange — the candidate-generation half of the exact two-pass
  * heavy-hitters pattern ([[graft.operators.TextAnalysis.hotNgrams]]).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSummary] with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries: capacity must be positive")

  override def createAggregationBuffer(): MisraGriesSummary =
    new MisraGriesSummary(capacity)

  override def update(buf: MisraGriesSummary, row: InternalRow): MisraGriesSummary = {
    val v = child.eval(row)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: MisraGriesSummary, other: MisraGriesSummary): MisraGriesSummary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGriesSummary): Any = {
    val n = buf.counts.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: MisraGriesSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesSummary(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
