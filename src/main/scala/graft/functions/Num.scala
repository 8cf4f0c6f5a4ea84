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

  /** Order-free sum of a COMPUTED double (haversine legs, sMAPE terms,
    * gradients — values with no finite decimal representation, where
    * [[psum]]'s direct double→decimal cast would itself be the
    * engine-divergent rounding the header warns about). Each row is first
    * pinned to the 10^-q grid by the shared [[pround]] IEEE formula
    * (`floor(x*10^q + 0.5)` — mul/add/floor are bit-identical in both
    * engines), which makes it an integer-VALUED double; integer-valued
    * doubles cast exactly into DECIMAL(28,0) micro-units, the decimal sum
    * is exact integer arithmetic in any order, and ONE division returns to
    * units. Determinism holds at any magnitude (an integer-valued double
    * is exact even past 2^53 — the grid just coarsens to ulp spacing);
    * pick q so the quantization error n·10^-q/2 stays far inside the final
    * rounding granularity. NOT the rounded result — compose with [[pround]]
    * after any trailing division. */
  def qsum(e: Column, q: Int): Column = {
    val p = math.pow(10, q)
    sum(floor(e * p + 0.5).cast("decimal(28,0)")).cast("double") / p
  }

  /** The DuckDB-side spelling of [[qsum]]. */
  def sqlQsum(expr: String, q: Int): String =
    s"(CAST(sum(CAST(floor(($expr) * 1e$q + 0.5) AS DECIMAL(28,0))) AS DOUBLE) / 1e$q)"

  /** The DuckDB-side spelling of [[pavg]]. */
  def sqlAvg(expr: String, dscale: Int, n: Int): String =
    sql(s"${sqlDsum(expr, dscale)} / count(*)", n)
}
