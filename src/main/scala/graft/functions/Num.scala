package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable decimal rounding.
  *
  * Engines disagree on `round(double, n)` at exact half-way doubles: Spark
  * routes through BigDecimal(HALF_UP on the shortest decimal repr) while
  * DuckDB multiplies/rounds/divides in binary — e.g. 0.42374999999999996
  * rounds to 0.4237 in Spark but 0.4238 in DuckDB (its ×1e4 lands on exactly
  * 4237.5). Every derived double the oracle compares must therefore round via
  * the same IEEE ops on both sides:
  *
  *   pround(x, n) = floor(x * 10^n + 0.5) / 10^n
  *
  * (round-half-toward-+inf; powers of ten up to 1e15 are exact doubles, and
  * mul/add/floor/div are IEEE-defined, so both engines produce the identical
  * bit pattern). The oracle SQL uses the literal same formula — see [[sql]].
  */
object Num {

  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }

  /** The DuckDB-side spelling of [[pround]]. */
  def sql(expr: String, n: Int): String =
    s"floor(($expr) * 1e$n + 0.5) / 1e$n"
}
