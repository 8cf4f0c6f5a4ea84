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

  /** Order-free exact sum of a fixed-point-valued double expression.
    *
    * [[pround]] makes one double deterministic, but `sum(double)` itself is
    * summation-ORDER-dependent — parallel vs sequential accumulation differs
    * by ulps, and the r10 sf1 sweep caught group sums over 10x more rows
    * landing exactly on rounding boundaries (q7 volume, q9 profit,
    * geo_cell_density means flipped their last digit). The repo convention
    * ("integer/decimal until one final division") applies: the per-row
    * product is IEEE-deterministic (same inputs, same result, any engine);
    * casting it to DECIMAL(28, `dscale`) is exact because the data's true
    * value has at most `dscale` decimals (2dp x 2dp -> 4dp money products,
    * 6dp with tax) and the double sits within an ulp of it; the decimal SUM
    * is exact integer arithmetic in any order; then ONE cast back to double
    * and the shared [[pround]]. 28 digits hold 1e24 in micro-units — room
    * for any revenue this engine will sum. */
  def psum(e: Column, dscale: Int, n: Int): Column =
    pround(sum(e.cast(s"decimal(28,$dscale)")).cast("double"), n)

  /** The DuckDB-side spelling of [[psum]]. */
  def sqlSum(expr: String, dscale: Int, n: Int): String =
    sql(s"CAST(sum(CAST(($expr) AS DECIMAL(28,$dscale))) AS DOUBLE)", n)

  /** Exact decimal sum WITHOUT the final rounding — for ratios of sums:
    * cast each side to double, divide once, [[pround] the quotient. */
  def dsum(e: Column, dscale: Int): Column =
    sum(e.cast(s"decimal(28,$dscale)")).cast("double")

  /** The DuckDB-side spelling of [[dsum]]. */
  def sqlDsum(expr: String, dscale: Int): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(28,$dscale))) AS DOUBLE)"

  /** Order-free mean of a fixed-point-valued double expression: exact
    * decimal sum, ONE division by the group count, shared rounding.
    * (`avg(double)` has the same summation-order hazard as `sum`.) */
  def pavg(e: Column, dscale: Int, n: Int): Column =
    pround(dsum(e, dscale) / count(lit(1)), n)

  /** The DuckDB-side spelling of [[pavg]]. */
  def sqlAvg(expr: String, dscale: Int, n: Int): String =
    sql(s"${sqlDsum(expr, dscale)} / count(*)", n)
}
