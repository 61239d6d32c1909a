package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5(input) as a non-negative long — [[Md5Hash32]]'s
  * wide sibling for CORPUS-GLOBAL keys. 32 bits saturate by birthday
  * collision around 10⁵ distinct keys per bucket-load target; a 100 TB
  * corpus carries ~10¹⁰ distinct shingles, where 2³² buckets would mark
  * essentially every position as colliding. 2⁶⁰ keeps the expected
  * collision count for 10¹⁰ keys below 10² — negligible against any
  * downstream threshold. 60 (not 64) so the value is a positive signed
  * long both engines and the oracle's nibble-sum reproduce exactly.
  *
  * Value-identical to `conv(substring(md5(c), 1, 15), 16, 10)` (the
  * first 15 hex chars are the first 7.5 digest bytes big-endian — i.e.
  * the first 8 bytes logically shifted right by one nibble), which is
  * what the DuckDB oracle computes. */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.Md5Hash60.hash60($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static entry for generated code: first 8 digest bytes big-endian,
    * logically shifted right one nibble → 60 non-negative bits. */
  def hash60(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val top =
      ((b(0) & 0xFFL) << 56) | ((b(1) & 0xFFL) << 48) | ((b(2) & 0xFFL) << 40) |
        ((b(3) & 0xFFL) << 32) | ((b(4) & 0xFFL) << 24) | ((b(5) & 0xFFL) << 16) |
        ((b(6) & 0xFFL) << 8) | (b(7) & 0xFFL)
    top >>> 4
  }
}
