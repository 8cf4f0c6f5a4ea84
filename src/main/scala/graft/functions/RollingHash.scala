package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points:
  *
  *   h = cp(0); h = (h * 31 + cp(i)) mod 1_000_000_007
  *
  * A native Catalyst `Expression` with `doGenCode` (not a Scala UDF), so it
  * stays inside WholeStageCodegen: the generated code calls the static
  * [[RollingHash.compute]] on the UTF8String directly — no boxing, no
  * serialization, null handled by the standard nullSafeCodeGen plumbing.
  *
  * The arithmetic is pure BIGINT mod-arithmetic so the DuckDB oracle can
  * replicate it exactly with `list_reduce(list_transform(string_split(s,''),
  * c -> ord(c)::BIGINT), (a,b) -> (a*31+b) % 1000000007)`.
  *
  * Document fingerprinting use (SURVEY.md §7.6): cheap order-sensitive content
  * hash for shard-local dedup pre-screens where md5's 128 bits are overkill.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod: Long = 1000000007L
  final val Mult: Long = 31L

  /** Static so generated code can call it without an object ref. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var first = true
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (first) { h = cp.toLong; first = false }
      else h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-level entry point. */
  def rolling_hash(c: Column): Column =
    GraftExpressionBridge.column(RollingHash(GraftExpressionBridge.expression(c)))
}
