package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer–Wilkerson–Aiken) of a string as a
  * native expression: the sorted distinct set of per-window minima over
  * polynomial rolling hashes of the string's char `k`-grams.
  *
  * The hash of a k-gram is Σ cp(cⱼ)·Bᵏ⁻¹⁻ʲ mod 2³², B = 257, over Unicode
  * code points — O(1) per position via the rolling update
  * h′ = (h − cp(drop)·Bᵏ⁻¹)·B + cp(add) (mod 2³²), where the
  * higher-order-function formulation pays a fresh digest or an O(k)
  * re-sum per position plus per-element boxing (CodegenFallback). The
  * arithmetic is plain integer mod 2³², so the DuckDB oracle reproduces
  * it bit-for-bit from the non-rolling definition.
  *
  * Null → null (UnaryExpression default). Strings shorter than `k` code
  * points yield an empty array; shorter than `k+w−1` yield the single
  * global minimum (one window).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_fps needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFps.compute(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row; the O(n) loop lives in compiled Scala, so
    // whole-stage codegen stays intact around it
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.WinnowFps.computeArray($x.toString(), $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val B = 257L
  private val Mask = 0xFFFFFFFFL

  // Per-thread scratch deque, reused across rows (grown geometrically,
  // never shrunk): the monotonic-deque minimum needs an m-slot index
  // array per row, and a fresh allocation per document is the dominant
  // garbage source on long-text corpora. Spark evaluates an expression
  // on one task thread at a time, so ThreadLocal is exactly the right
  // ownership scope.
  private val dqScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }

  private def dqBuffer(m: Int): Array[Int] = {
    var a = dqScratch.get()
    if (a.length < m) {
      a = new Array[Int](java.lang.Integer.highestOneBit(m - 1) << 1 max m)
      dqScratch.set(a)
    }
    a
  }

  /** Static entry for generated code. */
  def computeArray(s: String, k: Int, w: Int): ArrayData =
    new GenericArrayData(compute(s, k, w))

  /** Sorted distinct window-minima of the rolling k-gram hashes. */
  def compute(s: String, k: Int, w: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1
    val hashes = new Array[Long](m)
    // B^(k-1) mod 2^32 — the coefficient of the dropped leading char
    var pk = 1L
    var j = 1
    while (j < k) { pk = (pk * B) & Mask; j += 1 }
    var h = 0L
    j = 0
    while (j < k) { h = (h * B + cps(j)) & Mask; j += 1 }
    hashes(0) = h
    var i = 1
    while (i < m) {
      h = ((h - ((cps(i - 1) * pk) & Mask)) * B + cps(i + k - 1)) & Mask
      hashes(i) = h
      i += 1
    }
    val mins =
      if (m < w) {
        var mn = hashes(0)
        i = 1
        while (i < m) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
        Array(mn)
      } else {
        // monotonic-deque sliding minimum: O(m) total instead of O(m·w)
        // rescans — each index enters and leaves the deque once
        val out = new Array[Long](m - w + 1)
        val dq = dqBuffer(m)
        var head = 0
        var tail = 0 // live window indices in dq(head until tail), values ascending
        i = 0
        while (i < m) {
          while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
          dq(tail) = i
          tail += 1
          if (dq(head) <= i - w) head += 1
          if (i >= w - 1) out(i - w + 1) = hashes(dq(head))
          i += 1
        }
        out
      }
    java.util.Arrays.sort(mins)
    // distinct over the sorted run, in place
    var len = 0
    i = 0
    while (i < mins.length) {
      if (len == 0 || mins(len - 1) != mins(i)) { mins(len) = mins(i); len = len + 1 }
      i += 1
    }
    java.util.Arrays.copyOf(mins, len)
  }
}
