package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer: at most `k` (term, count)
  * counters regardless of stream length or vocabulary size. The
  * classic guarantee after any sequence of updates and merges over N
  * total items: every term with true frequency > N/(k+1) is present,
  * and each stored count undercounts by at most N/(k+1).
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(term: String, c: Long): Unit = {
    if (counts.containsKey(term)) { counts.put(term, counts.get(term) + c); () }
    else if (counts.size < k) { counts.put(term, c); () }
    else decrementAll(c, term)
  }

  /** The MG overflow step, generalized to weight `c` (needed for
    * merges): subtract min(c, smallest surviving decrement) from every
    * counter, insert the newcomer with any remainder. Implemented as
    * the standard "subtract the (k+1)-th largest" collapse over the
    * k existing counters plus the newcomer.
    */
  private def decrementAll(c: Long, term: String): Unit = {
    // (k+1) counters: existing k plus (term, c). Subtract the smallest
    // of them from all, drop non-positive — at least one entry dies, so
    // size stays ≤ k.
    var minC = c
    val it0 = counts.values().iterator()
    while (it0.hasNext) { val v = it0.next(); if (v < minC) minC = v }
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - minC
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
    if (c > minC) { counts.put(term, c - minC); () }
  }
}

/** Misra-Gries frequent-items sketch as a `TypedImperativeAggregate`:
  * O(k) state per partial buffer at ANY vocabulary size, map-side
  * partial aggregation and mergeable summaries (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) for free from the aggregate
  * contract. Returns the candidate term set (≤ k strings, sorted) —
  * guaranteed to contain every term with frequency > N/(k+1).
  *
  * This is the bounded-state half of the exact two-pass heavy-hitters
  * operator ([[graft.ops.TextAnalysis.heavyHitters]]): the sketch
  * yields candidates, an exact count of candidates only makes the
  * final answer deterministic and oracle-checkable. The sketch's own
  * counts are order-dependent and deliberately not exposed.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(k >= 1, s"graft_mg_candidates k must be >= 1, got $k")

  override def prettyName: String = "graft_mg_candidates"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    // UTF8String buffers are reused by the row reader — copy via toString
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); buf.add(e.getKey, e.getValue) }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val terms = new Array[String](buf.counts.size)
    val it = buf.counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { terms(i) = it.next(); i += 1 }
    java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(terms.map(UTF8String.fromString): Array[AnyRef])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (b, c) = entries.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API entry: `mgCandidates(col, k)` usable inside `agg(...)`. */
  def mgCandidates(c: Column, k: Int): Column =
    column(MisraGriesAgg(expression(c), k).toAggregateExpression())
}
