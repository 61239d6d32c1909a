package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** 64-bit signed-random-projection (hyperplane LSH) signature over an
  * `array<float>` embedding — Charikar 2002's SimHash for cosine space:
  * bit b is the sign of ⟨v, r_b⟩ for a fixed Rademacher (±1) hyperplane
  * r_b, so P[bits agree] = 1 − θ/π and Hamming distance estimates the
  * angle. The 64 hyperplanes arrive as packed bitmasks (bit d of
  * `planes(b)` set ⇒ r_b[d] = +1, else −1); dimensions beyond 64 wrap
  * (`d mod 64`) so the kernel is total for any input length.
  *
  * Exactness: each coordinate is quantized `floor(double(v)·10⁶)` BEFORE
  * the projection, so every dot product is an exact BIGINT sum — no IEEE
  * summation-order hazard between engines (|q| ≤ 10⁶·|v|, 64 terms ≪ 2⁶³).
  * The DuckDB oracle recomputes the identical quantize→±sum→sign chain
  * from the same plane literals.
  *
  * Value-identical to the Catalyst HOF formulation (transform over 64
  * bits, aggregate over dims), which pays an interpreted lambda and ~2
  * boxes per (bit, dim) step — 4096 per row. This kernel is one unboxed
  * double loop in compiled Scala; the [[WinnowFps]]/[[LumaGrid]]
  * discipline: the O(bits·dims) loop lives in a static method,
  * whole-stage codegen stays intact around the call.
  *
  * Output: `array<long>` of the two POSITIVE 32-bit signature halves
  * `[lo, hi]` — the `simhash_neardup` signed-bit-63 discipline, so band
  * extraction and XOR-Hamming stay positive in BIGINT on both engines.
  */
case class SrpSign64(child: Expression, planes: Seq[Long])
    extends UnaryExpression {

  require(planes.length == 64, s"srp_sign64 needs 64 planes, got ${planes.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_sign64 expects array<float>, got ${t.simpleString}")
  }

  private lazy val planesArr = planes.toArray

  override def nullSafeEval(input: Any): Any =
    SrpSign64.computeArray(input.asInstanceOf[ArrayData], planesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", planesArr, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.SrpSign64.computeArray($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSign64 {

  /** The engine's 64 default Rademacher hyperplanes as packed sign
    * bitmasks (bit d of plane b set ⇒ r_b[d] = +1, else −1): the low bit
    * of md5("srp:b:d")'s first digest byte — a fixed pseudo-random draw
    * both engines consume as LITERALS (the MinhashSeeds discipline: the
    * DuckDB oracle takes the same constants rather than re-deriving the
    * RNG in SQL). */
  val DefaultPlanes: Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(64) { b =>
      var m = 0L
      var d = 0
      while (d < 64) {
        val h = md.digest(s"srp:$b:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((h(0) & 1) == 1) m |= 1L << d
        d += 1
      }
      m
    }
  }

  /** Static entry for generated code: quantize → 64 signed sums → sign
    * bits, packed as two positive 32-bit halves. */
  def computeArray(arr: ArrayData, planes: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val q = new Array[Long](n)
    var d = 0
    while (d < n) {
      q(d) = math.floor(arr.getFloat(d).toDouble * 1e6).toLong
      d += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 64) {
      val p = planes(b)
      var s = 0L
      var i = 0
      while (i < n) {
        s += (if (((p >>> (i & 63)) & 1L) == 1L) q(i) else -q(i))
        i += 1
      }
      if (s > 0) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    new GenericArrayData(Array(lo, hi))
  }
}
