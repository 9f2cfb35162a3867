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

  /** Σ aᵢ·bᵢ via the native fused [[graft.functions.VectorDot]]
    * expression — single codegen'd loop, no per-row intermediate array
    * (the zip_with/aggregate form allocates one per pair). Identical
    * left-to-right fold, so results are bit-equal to [[dotComposed]]. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(VectorDot(
      Bridge.expression(asDouble(a)),
      Bridge.expression(asDouble(b))))
  }

  /** The pure-built-in fold — kept as the reference implementation the
    * native expression is verified against. */
  def dotComposed(a: Column, b: Column): Column =
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
