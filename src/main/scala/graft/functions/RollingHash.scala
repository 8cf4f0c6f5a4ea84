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
case class RollingHash(child: Expression,
    mult: Long = RollingHash.Mult,
    mod: Long = RollingHash.Mod) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.compute($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod: Long = 1000000007L
  final val Mult: Long = 31L
  /** Second independent (multiplier, prime modulus) pair — combining both
    * hashes yields a 60-bit fingerprint (each value < 2^30), used by
    * [[graft.operators.Dedup.simHash]]. */
  final val Mod2: Long = 998244353L
  final val Mult2: Long = 131L

  /** Static so generated code can call it without an object ref. */
  def compute(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var first = true
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (first) { h = cp.toLong; first = false }
      else h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def compute(s: UTF8String): Long = compute(s, Mult, Mod)

  /** Column-level entry point. */
  def rolling_hash(c: Column): Column =
    GraftExpressionBridge.column(RollingHash(GraftExpressionBridge.expression(c)))

  /** The second hash of the 60-bit pair. */
  def rolling_hash2(c: Column): Column =
    GraftExpressionBridge.column(
      RollingHash(GraftExpressionBridge.expression(c), Mult2, Mod2))

  /** Finalizing affine mix `(h * 1103515245 + 12345) mod p` — a bijection on
    * Z_p that spreads the small hash values of short tokens uniformly over
    * all ~30 bits (a raw polynomial hash of a 4-char word stays below 2^22,
    * which would leave SimHash's high bit votes dead). Plain BIGINT Column
    * arithmetic so the DuckDB oracle replicates it verbatim. */
  def mix(h: Column, mod: Long): Column =
    (h * org.apache.spark.sql.functions.lit(1103515245L) + 12345L) % mod
}
