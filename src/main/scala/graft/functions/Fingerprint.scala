package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting as native Catalyst expressions (SURVEY §4.3
  * escape hatch, used where a Scala UDF would break whole-stage codegen):
  *
  *  - `fingerprint64(s)` — FNV-1a 64-bit content fingerprint.
  *  - `rolling_min_hash64(s)` — minimum of a degree-256 polynomial
  *    rolling hash over every 16-byte window (winnowing-style document
  *    fingerprint, robust to content reordering at window granularity).
  *
  * Both implement `doGenCode` via a static call, so they stay inside
  * whole-stage codegen on the hot path.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable // enable ConstantFolding
  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64.fnv(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.fnv($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint64 {
  /** FNV-1a 64-bit. Public-knowledge constants. */
  def fnv(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

case class RollingMinHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable // enable ConstantFolding
  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash64.rollingMin(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingMinHash64.rollingMin($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash64 {
  final val Window = 16
  private final val B = 1000003L
  // B^(Window-1) for removing the outgoing byte
  private final val Bpow: Long = {
    var p = 1L; var i = 0
    while (i < Window - 1) { p *= B; i += 1 }
    p
  }

  def rollingMin(bytes: Array[Byte]): Long = {
    if (bytes.length == 0) return 0L
    if (bytes.length <= Window) return Fingerprint64.fnv(bytes)
    var h = 0L
    var i = 0
    while (i < Window) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = Hashing.mix64(h)
    while (i < bytes.length) {
      h = (h - (bytes(i - Window) & 0xffL) * Bpow) * B + (bytes(i) & 0xffL)
      val m = Hashing.mix64(h)
      if (m < min) min = m
      i += 1
    }
    min
  }
}

object FingerprintFunctions {
  /** Register both expressions for SQL/expr() use in a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_min_hash64", exprs => RollingMinHash64(exprs.head), "built-in")
  }
}
