package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter bit array over 64-bit keys. Fixed O(numBits) state at
  * ANY input cardinality; merge is a word-wise OR — the textbook
  * mergeable summary, so map-side partial aggregation works unchanged.
  *
  * Bit selection is Kirsch-Mitzenmacher double hashing: two
  * splitmix64-style mixes of the key give (h1, h2); probe i sets
  * bit (h1 + i·h2) mod numBits. The serialized layout is
  * [numHashFns INT][words LONG...] so a probe needs only the bytes.
  */
final class BloomBuffer(val numWords: Int, val numHashFns: Int) {
  val words = new Array[Long](numWords)
  def add(v: Long): Unit = {
    val numBits = numWords.toLong * 64L
    val h1 = BloomProbe.mix64(v)
    val h2 = BloomProbe.mix64(v + BloomProbe.Golden) | 1L
    var i = 0
    while (i < numHashFns) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }
}

/** Static probe helpers — referenced by name from generated code (the
  * object compiles to static forwarders), so the expression's codegen
  * is a single static call with primitive args.
  */
object BloomProbe {
  val Golden = 0x9E3779B97F4A7C15L

  def mix64(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Membership probe against serialized filter bytes
    * ([k INT][words LONG...], big-endian per ByteBuffer default).
    */
  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val numWords = (bytes.length - 4) >>> 3
    val numBits = numWords.toLong * 64L
    val h1 = mix64(v)
    val h2 = mix64(v + Golden) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      if ((bb.getLong(4 + ((bit >>> 6).toInt << 3)) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter build as a custom Catalyst aggregate: BIGINT keys in,
  * serialized filter (BINARY) out. The caller picks `numBits` for the
  * expected key count (~10 bits/key ≈ 1% false positives with k=7;
  * false NEGATIVES are impossible, which is what makes the companion
  * [[graft.ops.BloomJoin]] exact). State is numBits/8 bytes per partial
  * buffer regardless of group cardinality — same bounded-state
  * discipline as [[KmvMinsAgg]] / [[MisraGriesAgg]].
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashFns: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  require(numBits >= 64, s"graft_bloom numBits must be >= 64, got $numBits")
  require(numBits % 64 == 0, s"graft_bloom numBits must be a multiple of 64, got $numBits")
  require(numHashFns >= 1 && numHashFns <= 16,
    s"graft_bloom numHashFns must be in [1, 16], got $numHashFns")

  private def numWords: Int = numBits / 64

  override def prettyName: String = "graft_bloom"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT key (hash the column first), got " +
          child.dataType.catalogString)

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numWords, numHashFns)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    var i = 0
    while (i < buf.words.length) { buf.words(i) |= other.words(i); i += 1 }
    buf
  }

  override def eval(buf: BloomBuffer): Any = serialize(buf)

  override def serialize(buf: BloomBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.words.length)
    bb.putInt(buf.numHashFns)
    var i = 0
    while (i < buf.words.length) { bb.putLong(buf.words(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val buf = new BloomBuffer((bytes.length - 4) / 8, k)
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** `might_contain(filterBytes, key)` — true if the key MAY be in the
  * set the filter was built over (never a false negative). One static
  * call in generated code; null filter or key → null (BinaryExpression
  * null-intolerant semantics).
  */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BINARY filter, BIGINT key), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(f: Any, v: Any): Any =
    BloomProbe.mightContain(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) =>
      s"${ev.value} = graft.functions.BloomProbe.mightContain($f, $v);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomAgg {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API entry: `bloomAgg(keyCol, numBits, numHashFns)` inside `agg(...)`. */
  def bloomAgg(c: Column, numBits: Int, numHashFns: Int = 7): Column =
    column(BloomAgg(expression(c), numBits, numHashFns).toAggregateExpression())

  def mightContain(filter: Column, key: Column): Column =
    column(BloomMightContainExpr(expression(filter), expression(key)))
}
