package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state KMV aggregation buffer: the `k` smallest DISTINCT
  * long hashes seen so far. A `TreeSet` gives O(log k) insert with the
  * largest element evictable in O(log k) — the buffer can never exceed
  * k entries no matter the group's cardinality.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    // skip early when h can't enter the k-min set (common case at scale)
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) { if (set.add(h)) { set.pollLast(); () } }
  }
}

/** k-minimum-values sketch state as a custom Catalyst aggregate — the
  * `TypedImperativeAggregate` extension point (SURVEY §7.3 listed this
  * API as the stretch path; the declarative
  * `slice(sort_array(collect_set(h)), 1, k)` is value-identical but
  * collects EVERY distinct hash per group before slicing, so its state
  * is O(cardinality)). This buffer is O(k) at any cardinality —
  * 1B distinct users per group costs the same 64 longs as 1000 —
  * with map-side partial aggregation and O(k log k) merges for free
  * from the aggregate contract.
  *
  * Returns the ≤ k smallest distinct hashes ascending (bit-identical to
  * the declarative form, so the DuckDB oracle is unchanged).
  */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 1, s"graft_kmv_mins k must be >= 1, got $k")

  override def prettyName: String = "graft_kmv_mins"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  // analysis-time type contract: without it a non-BIGINT input would
  // pass analysis and ClassCastException inside executors
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinsAgg =
    copy(child = newChildren.head)
}

object KmvMinsAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API entry: `kmvMins(col, k)` usable inside `agg(...)`. */
  def kmvMins(c: Column, k: Int): Column =
    column(KmvMinsAgg(expression(c), k).toAggregateExpression())
}
