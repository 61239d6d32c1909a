package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

/** Gunzip a binary payload to a UTF-8 string; null on any decompression
  * failure (total, like the parser — a corrupt record must not kill the
  * job).
  *
  * Closes the reference's wire-format gap: its generator gzips every
  * record (timestream_kinesis_data_gen.py:75) but the Flink job reads
  * plain strings (StreamingJob.java:102, SimpleStringSchema) — a latent
  * POC bug. Here decompression is an explicit source-edge projection:
  * `binary payload → gunzip_text → LogParse.parse`.
  *
  * CodegenFallback is fine: the cost is the zlib inflate itself, not
  * expression dispatch.
  */
case class GunzipText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  // corrupt payloads evaluate to null even when the child column is
  // non-nullable — without this override the derived nullable=false lets
  // a null UTF8String reach the row writer (NPE) and lets the optimizer
  // fold away IsNotNull filters on the result
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"gunzip_text expects binary, got ${t.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try UTF8String.fromBytes(in.readAllBytes())
      finally in.close()
    } catch {
      case _: java.io.IOException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
