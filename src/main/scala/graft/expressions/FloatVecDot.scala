package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>`/`array<double>` columns
  * (each side independently), in index-order double accumulation:
  * Σ double(aᵢ)·double(bᵢ), i ascending.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)` —
  * same casts, same fold order, so results are bit-for-bit identical and
  * the DuckDB oracle (`list_sum(list_transform(...))`) keeps matching. The
  * difference is cost: HOFs are CodegenFallback and box every element and
  * every accumulator step, and the optimizer freely duplicates the fold
  * into every consumer (13 copies observed in the IVF plan). This is a
  * tight unboxed loop with full codegen — the designed upgrade path
  * (SURVEY §7.3) once the profile showed the fold hot.
  *
  * Double-element support exists for DERIVED vectors — k-means update
  * steps emit exact-double centroids (`SimilarityQueries.kmeansTrain`)
  * that the next assignment round dots against raw float embeddings;
  * float→double widening is exact, so a float side reads identically
  * whether it was widened before or inside the fold.
  *
  * Null semantics: null input array → null (BinaryExpression default);
  * UNEQUAL lengths → null, matching the zip_with formulation (null
  * padding poisons its fold) — a silently truncated partial dot would be
  * a plausible-looking wrong number on schema drift. Element nulls are
  * not expected from the parquet float vectors and read as 0.0f/0.0,
  * matching neither-engine-has-null fixtures.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null is produced for length-mismatched inputs even when both child
  // arrays are non-nullable
  override def nullable: Boolean = true

  private def isVecArray(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // child types are fixed after analysis — resolve the getters once, not
  // per evaluated row in the interpreted path
  private lazy val leftIsDouble = isDoubleArray(left.dataType)
  private lazy val rightIsDouble = isDoubleArray(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVecArray(left.dataType) && isVecArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects each side array<float> or array<double>, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // element getters are resolved at codegen time from the static
      // child types — the fold itself stays a branch-free unboxed loop
      def get(v: String, isDouble: Boolean) =
        if (isDouble) s"$v.getDouble($i)" else s"((double) $v.getFloat($i))"
      val xe = get(x, leftIsDouble)
      val ye = get(y, rightIsDouble)
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $xe * $ye;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
