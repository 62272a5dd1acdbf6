package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running sum over double vectors: `dim` doubles + a row
  * count, fixed size however many rows the group holds. `dim` is learned
  * from the first vector seen (so one aggregate works for any embedding
  * width) and every later vector must match it — a silent width mix
  * would otherwise produce a plausible-looking garbage mean.
  */
final class VecSumBuffer {
  var count: Long = 0L
  var sums: Array[Double] = null
  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (sums == null) sums = new Array[Double](n)
    else require(n == sums.length,
      s"graft_vec_mean: vector width mismatch in group ($n vs ${sums.length})")
    var i = 0
    while (i < n) {
      require(!v.isNullAt(i), s"graft_vec_mean: null element at index $i unsupported")
      sums(i) += v.getDouble(i)
      i += 1
    }
    count += 1L
  }
}

/** Element-wise mean of an `ARRAY<DOUBLE>` column as a custom Catalyst
  * aggregate — the pooling primitive a training pipeline uses to turn
  * chunk/token embeddings into one document vector (mean pooling is the
  * sentence-transformers default; the reference stores one bge-small
  * vector per chunk, `Qdrant/main.py:94`, and doc-level retrieval needs
  * them pooled).
  *
  * Why a native aggregate and not posexplode + groupBy(id, dim) + avg:
  * the declarative form multiplies the shuffle by the vector width —
  * every row becomes `dim` (row, dim_idx, value) tuples that all cross
  * the wire before re-assembly needs a SECOND shuffle back to one row
  * per group. This buffer keeps pooling at ONE shuffle whose volume is
  * `groups x dim` doubles (map-side partial aggregation from the
  * aggregate contract), independent of row count — at 100 TB of 384-d
  * chunk vectors that is the difference between shuffling 384x the
  * corpus twice and shuffling only the pooled output once.
  *
  * Returns `ARRAY<DOUBLE>` (sum/count element-wise); empty/all-null
  * groups return NULL. Like every distributed float aggregate
  * (`avg`, the kmeans update rule) the last bits depend on addition
  * order — consumers round (6 dp) before comparing, same discipline as
  * [[graft.ops.VectorOps.dimStats]].
  */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  override def prettyName: String = "graft_vec_mean"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<DOUBLE> input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) {
        buf.sums = other.sums.clone()
        buf.count = other.count
      } else {
        require(buf.sums.length == other.sums.length,
          s"$prettyName: vector width mismatch in merge " +
            s"(${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.count += other.count
      }
    }
    buf
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.sums == null) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * dim)
    bb.putLong(buf.count)
    bb.putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumBuffer
    buf.count = bb.getLong
    val dim = bb.getInt
    if (dim > 0 || buf.count > 0) {
      // count>0 with dim==0 means rows of zero-width vectors were seen;
      // keep the (valid, degenerate) empty-sum state rather than null
      buf.sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { buf.sums(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API entry: `vecMean(col)` usable inside `agg(...)`; input
    * must be `ARRAY<DOUBLE>` (use [[graft.ops.VectorOps.toDoubleArray]]
    * on float embeddings first).
    */
  def vecMean(c: Column): Column =
    column(VectorMeanAgg(expression(c)).toAggregateExpression())
}
