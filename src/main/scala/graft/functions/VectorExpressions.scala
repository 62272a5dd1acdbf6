package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §4 item 1:
  * "custom Expression with codegen over primitive float arrays — only if
  * the expression formulation is a bench bottleneck" — it is: interpreted
  * higher-order functions cost ~100 ns/element-lambda, a codegen'd loop
  * over primitive ArrayData is ~1 ns/element).
  *
  * Numeric contract (oracle parity): identical operation ORDER to the
  * `aggregate(zip_with(...))` formulation they replace — double-precision
  * sequential left fold, `acc += a[i]*b[i]` — so scores are bit-identical
  * and every DuckDB oracle keeps hash-matching.
  *
  * Both ARRAY<FLOAT> and ARRAY<DOUBLE> inputs are supported; elements are
  * widened to double before multiply (same as the `x::DOUBLE` cast in the
  * expression form). Unequal lengths score over the common prefix; null
  * input → null (NullIntolerant semantics via BinaryExpression).
  */
object VectorExpressions {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getter(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def getD(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  abstract class ArrayPairFold extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${prettyName} expects ARRAY<FLOAT|DOUBLE> inputs, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  /** a·b — one tight loop, whole-stage-codegen friendly. */
  case class DotProductExpr(left: Expression, right: Expression) extends ArrayPairFold {
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val lt = elemType(left); val rt = elemType(right)
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += getD(lt, x, i) * getD(rt, y, i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${getter(elemType(left), x, i)} * ${getter(elemType(right), y, i)};
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** cos(a,b) = a·b / (‖a‖‖b‖), 0.0 when either norm is zero — single
    * pass accumulating dot, Σa², Σb² together (4 interpreted array passes
    * collapse into 1 codegen loop). Same op order as the expression form.
    */
  case class CosineSimilarityExpr(left: Expression, right: Expression) extends ArrayPairFold {
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val lt = elemType(left); val rt = elemType(right)
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < n) {
        val xv = getD(lt, x, i); val yv = getD(rt, y, i)
        dot += xv * yv; sa += xv * xv; sb += yv * yv
        i += 1
      }
      // norms over the FULL arrays for unequal lengths (parity with the
      // l2Norm(a)*l2Norm(b) form); loop above covered the common prefix
      var j = n
      while (j < x.numElements()) { val v = getD(lt, x, j); sa += v * v; j += 1 }
      j = n
      while (j < y.numElements()) { val v = getD(rt, y, j); sb += v * v; j += 1 }
      val denom = math.sqrt(sa) * math.sqrt(sb)
      if (denom == 0.0) 0.0 else dot / denom
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val sa = ctx.freshName("sa")
        val sb = ctx.freshName("sb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val denom = ctx.freshName("denom")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $dot = 0.0; double $sa = 0.0; double $sb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = ${getter(elemType(left), x, i)};
           |  double $yv = ${getter(elemType(right), y, i)};
           |  $dot += $xv * $yv; $sa += $xv * $xv; $sb += $yv * $yv;
           |}
           |for (int $i = $n; $i < $x.numElements(); $i++) {
           |  double $xv = ${getter(elemType(left), x, i)}; $sa += $xv * $xv;
           |}
           |for (int $i = $n; $i < $y.numElements(); $i++) {
           |  double $yv = ${getter(elemType(right), y, i)}; $sb += $yv * $yv;
           |}
           |double $denom = java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb);
           |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** |A ∩ B| for two SORTED ARRAY<BIGINT> sets — single merge pass,
    * codegen'd. Used by Dedup.verifyJaccard: per-candidate-pair exact
    * intersection without exploding (pair × shingle) rows into a shuffle.
    */
  case class SortedIntersectSizeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def prettyName: String = "graft_sorted_intersect_size"
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects sorted ARRAY<BIGINT> inputs")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var n = 0L
      while (i < x.numElements() && j < y.numElements()) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { n += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $i = 0; int $j = 0; long $n = 0L;
           |while ($i < $x.numElements() && $j < $y.numElements()) {
           |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
           |  if ($xv == $yv) { $n++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Spark 4 Column <-> Expression bridge
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedIntersectSizeExpr(expression(a), expression(b)))

  def dot(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarityExpr(expression(a), expression(b)))
}
