package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType/DoubleType)` embedding columns,
  * built from codegen'd higher-order functions (zip_with + aggregate) —
  * no UDFs, so the expressions stay inside whole-stage codegen and are
  * engine-portable for oracle checks (left-to-right IEEE double folds,
  * same as DuckDB's list_dot_product).
  */
object VectorFunctions {

  /** Cast to double before any arithmetic: float math would accumulate
    * float error, and float→double widening is exact. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ as a left-to-right double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity dot/sqrt(|a|²·|b|²) — the sqrt-of-product form,
    * matching DuckDB's formulation so oracle values agree bitwise. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / sqrt(norm2(ad) * norm2(bd))
  }
}
