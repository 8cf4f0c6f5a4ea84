package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns. The dot
  * product is the native codegen'd [[DotProduct]] expression (allocation-free
  * tight loop); everything composes as plain Columns inside
  * WholeStageCodegen, never leaving Tungsten rows.
  *
  * Determinism: summation is left-to-right, the same order DuckDB's
  * `list_sum(list_transform(...))` reduces in, so cosine values agree with the
  * oracle bit-for-bit before rounding (and exactly after `round(_, 6)`).
  */
object Vec {

  /** Cast any numeric array to double before arithmetic so float*float
    * rounding never diverges from the oracle's DOUBLE math. */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential dot product (native Expression — see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** The composable higher-order spelling of [[dot]] — kept as the reference
    * implementation the native expression is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Sequential squared L2 distance (native Expression — see [[SumSqDiff]]);
    * same left-to-right fold order as DuckDB's
    * `list_sum(list_transform(list_zip(a,b), ...))`, so distances agree with
    * the oracle bit-for-bit before rounding. */
  def sumSqDiff(a: Column, b: Column): Column =
    GraftExpressionBridge.column(SumSqDiff(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** The composable higher-order spelling of [[sumSqDiff]] — kept as the
    * reference implementation the native expression is tested against. */
  def sumSqDiffHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms — at scale norms are computed once per
    * side before the pair join, not once per pair. */
  def cosinePrenormed(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)
}
