package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The dHash luma grid as a native expression: 72 block-average "pixels"
  * (row-major 8×9) over the payload's code points, `brightness` added to
  * every value before the mean — value-identical to the Catalyst
  * higher-order formulation
  *
  * {{{
  * transform(sequence(0, 71), k ->
  *   aggregate(sequence(k·L div 72 + 1, (k+1)·L div 72), 0L,
  *     (acc, i) -> acc + ascii(substring(text, i, 1)) + brightness)
  *   div ((k+1)·L div 72 − k·L div 72))
  * }}}
  *
  * which the DuckDB oracle mirrors (`SparkEntry.PhashFromU`). The HOF
  * form pays an interpreted lambda plus a per-character
  * `substring`→UTF8String allocation — ~2 allocations and a virtual
  * dispatch per "pixel" sample; this kernel is one code-point sweep in
  * compiled Scala (the [[WinnowFps]] discipline: the O(n) loop lives in
  * a static method, whole-stage codegen stays intact around the call).
  *
  * All arithmetic is exact integer (sums of code points, one integral
  * division per cell), so engine, oracle, and this kernel agree
  * bit-for-bit. Inputs shorter than 72 code points have an empty
  * segment (the HOF form would raise an ANSI divide-by-zero): loudly
  * rejected — callers filter `length(text) >= 72` first, the
  * `< 3 tokens ⇒ no signature` contract of the hash families.
  */
case class LumaGrid(child: Expression, brightness: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luma_grid expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    LumaGrid.computeArray(input.asInstanceOf[UTF8String].toString, brightness)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.LumaGrid.computeArray($x.toString(), $brightness);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LumaGrid {

  /** Static entry for generated code. */
  def computeArray(s: String, brightness: Int): ArrayData =
    new GenericArrayData(compute(s, brightness))

  /** The 72 block means over code points (matches `ascii(substring)`
    * semantics, which index characters, not bytes). */
  def compute(s: String, brightness: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    require(n >= 72,
      s"luma_grid needs >= 72 code points for its 8x9 grid, got $n " +
        "(filter length(text) >= 72 upstream)")
    val L = n.toLong
    val out = new Array[Long](72)
    var k = 0
    while (k < 72) {
      val start = (k * L / 72).toInt
      val end = ((k + 1) * L / 72).toInt
      var sum = 0L
      var i = start
      while (i < end) { sum += cps(i) + brightness; i += 1 }
      out(k) = sum / (end - start)
      k += 1
    }
    out
  }
}
