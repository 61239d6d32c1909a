package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 32 bits of md5(input) as an unsigned long — the engine's
  * portable per-token hash, computed directly from the digest bytes.
  *
  * Value-identical to the composed formulation
  * `conv(substring(md5(c), 1, 8), 16, 10).cast("long")` (the first 8 hex
  * chars ARE the first 4 digest bytes big-endian), which is what the
  * DuckDB oracle reproduces — but skips materializing the 32-char hex
  * string, the substring, and the base-16 parse on every call. This sits
  * under every MinHash shingle hash (`minhash_lsh`, `dedup_clusters`,
  * the near-dup re-rankers), where it runs once per (shingle × doc).
  */
case class Md5Hash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash32 expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.Md5Hash32.hash32($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash32 {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static entry for generated code. */
  def hash32(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }
}
