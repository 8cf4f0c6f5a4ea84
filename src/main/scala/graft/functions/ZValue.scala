package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) curve key: interleaves the low 16 bits of two dimension
  * values into one 32-bit key whose lexicographic order is the Z-order space
  * filling curve. The storage-layout primitive behind multi-dimensional data
  * skipping: `repartitionByRange(zvalue(a, b))` + per-file min/max stats give
  * a layout where a range predicate on EITHER dimension prunes files — what
  * lakehouse engines call Z-order clustering (the reference's ClickHouse
  * serving table, sql/clickhouse-ddl.sql:33, has no ordering key at all; at
  * 100 TB the layout IS the index).
  *
  * A native Catalyst `BinaryExpression` with `doGenCode` (same discipline as
  * [[RollingHash]]): codegen calls the static [[ZValue.compute]], so the key
  * is computed inside WholeStageCodegen at scan speed. The bit-spreading uses
  * the classic shift-or-mask ladder, which is pure BIGINT `& | <<` arithmetic
  * — the DuckDB oracle replicates it verbatim (see [[ZValue.spreadSql]]).
  */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    ZValue.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZValue.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Spread the low 16 bits of `v` to the even bit positions of a 32-bit
    * value: 0b...dcba -> 0b...0d0c0b0a. Static so generated code can call it
    * without an object ref. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def compute(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Column-level entry point; inputs are masked to 16 bits by [[spread]]. */
  def zvalue(x: Column, y: Column): Column =
    GraftExpressionBridge.column(ZValue(
      GraftExpressionBridge.expression(x), GraftExpressionBridge.expression(y)))

  /** The DuckDB spelling of [[spread]] as one nested BIGINT expression over
    * column/expression `c` — exactly the shift-or-mask ladder above. */
  def spreadSql(c: String): String = {
    val steps = Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL),
      (2, 0x33333333L), (1, 0x55555555L))
    steps.foldLeft(s"($c & 65535)") { case (e, (sh, mask)) =>
      s"(($e | ($e << $sh)) & $mask)"
    }
  }

  /** The DuckDB spelling of [[compute]]. */
  def zvalueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
