package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over float-array embedding columns (SURVEY §4.3
  * escape hatch, taken because profiling showed the zip_with+aggregate
  * higher-order-function path dominating the cosine queries). Semantics
  * are EXACTLY the sequential left-fold in index order,
  * `Σ a(i).toDouble * b(i).toDouble` — the same accumulation DuckDB's
  * `list_cosine_similarity(CAST(... AS DOUBLE[]))` performs, keeping the
  * cosine oracles bit-exact. Codegen via a static helper call.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatVecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FloatVecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // fail loudly on corrupt data: DuckDB's list_cosine_similarity errors
    // on mismatched lengths too — silently truncating would return a
    // plausible but wrong similarity
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"FloatVecDot: vector length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Column-level dot product. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FloatVecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** cosine(a, b) built from native dots (double-exact, codegen'd). */
  def cosine(a: Column, b: Column): Column =
    apply(a, b) / (sqrt(apply(a, a)) * sqrt(apply(b, b)))
}
