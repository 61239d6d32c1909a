package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the kernel under
  * the compressibility quality heuristic (`compress_ratio`): boilerplate
  * and template text compresses far below natural prose, and random
  * gibberish barely compresses at all, so compressed÷raw size is a cheap
  * model-free quality/diversity signal large-corpus curation pipelines
  * use beside the stopword/repetition features.
  *
  * Settings are PINNED (level 6, default strategy, zlib wrapper) so the
  * measurement is reproducible run-to-run; the Deflater is thread-local
  * and reset per call, never reallocated per row. This has no DuckDB
  * counterpart, so the query built on it is spec-gated rather than
  * oracle-gated (the repo's second no-oracle surface after the
  * `approx_stats` sketches).
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.DeflateSize.deflatedLength($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, false))

  /** Static entry for generated code: total DEFLATE output length. The
    * output bytes are discarded — only the size is the signal — so the
    * sink buffer is a reused thread-local scratch block. */
  private val scratch = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  def deflatedLength(s: UTF8String): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
