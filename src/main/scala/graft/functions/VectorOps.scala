package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `array<float>` embedding columns.
  *
  * All arithmetic is element-order double accumulation (`zip_with` + left
  * fold): cast each float to double, multiply, fold left-to-right from 0.0.
  * The DuckDB oracle mirrors the exact same order
  * (`list_sum(list_transform(range(...)))`) so cosines agree bitwise.
  *
  * Higher-order functions are CodegenFallback — fine for the ~10²-10⁵ pair
  * counts these queries produce after pruning; if a profile ever shows the
  * dot product hot, the upgrade path is a native Catalyst `Expression`
  * with `doGenCode` over the unsafe array data, not a UDF.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, index order. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** ‖a‖₂ in double. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity in double: dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))
}
