package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.FloatVecDot
import org.apache.spark.sql.graft.ColumnBridge

/** Vector similarity primitives over `array<float>` embedding columns.
  *
  * All arithmetic is element-order double accumulation: cast each float to
  * double, multiply, fold left-to-right from 0.0. The DuckDB oracle
  * mirrors the exact same order (`list_sum(list_transform(range(...)))`)
  * so cosines agree bitwise.
  *
  * The dot product is a native Catalyst [[FloatVecDot]] expression with
  * codegen — the profile showed the earlier `aggregate(zip_with(...))`
  * higher-order formulation dominating the ANN queries (CodegenFallback,
  * boxed per element, and duplicated into every consumer by the
  * optimizer).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, index order (native codegen'd expression). */
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b))
    )

  /** ‖a‖₂ in double. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity in double: dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))
}
