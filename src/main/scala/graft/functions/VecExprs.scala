package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * allocates a 64-element intermediate array per evaluation; on an all-pairs
  * similarity join that is one allocation per *pair* (2M allocations at
  * sf0.1, measured 15s for embedding_topk_pairs_oracle_baseline). This expression loops over
  * the two ArrayData buffers directly inside generated code: no intermediate,
  * no boxing — the pair join drops to the cost of the multiplies.
  *
  * Accumulation is left-to-right, identical to the higher-order form and to
  * DuckDB's list_sum(list_transform(...)), so oracle hashes are unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static so generated code calls it directly. Sums min(len_a, len_b)
    * terms left-to-right. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Native squared L2 distance over two `array<double>` columns — same
  * rationale and fold order as [[DotProduct]] (the PQ encode step evaluates
  * it once per (vector, subspace, centroid); the higher-order form measured
  * 6.9s for ann_pq_adc at sf0.1, this drops it to the cost of the
  * arithmetic). */
case class SumSqDiff(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SumSqDiff.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SumSqDiff.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SumSqDiff =
    copy(left = newLeft, right = newRight)
}

object SumSqDiff {
  /** Static so generated code calls it directly. Sums min(len_a, len_b)
    * squared differences left-to-right. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
