package graft.operators

import graft.functions.RollingHash
import org.apache.spark.sql.Column

/** Deterministic cross-engine hash STRIPING — the device that turns an
  * output- or compute-quadratic ground-truth query into a bounded
  * differential at big SF (the r11 verdict's ask for the three held-out
  * `_oracle_baseline` rows): restrict BOTH engines to ids whose rolling
  * hash falls in stripe 0 of `k`, so a pair survives only when both
  * endpoints do (1/k² of pairs, 1/k² of all-pairs compute) while the code
  * path under test — the full uncapped pair pipeline — runs unchanged on
  * the surviving subset.
  *
  * The hash is the PRODUCT of the engine's two independent
  * [[graft.functions.RollingHash]]+mix values (pure BIGINT mod-arithmetic,
  * both < 2^30 so the product fits 2^60), NOT xxhash64, precisely so the
  * DuckDB oracle replicates the stripe bit-for-bit ([[sql]] mirrors
  * [[keep]] the way the SimHash/CMS oracles replicate their hashes). Why a
  * hash and why a PRODUCT — both measured, not hypothetical: the corpus
  * generator plants every near-dup pair at ADJACENT ids (j = i+1, checked
  * at sf1), so `id % k` would kill 100% of planted pairs outright; and a
  * SINGLE rolling hash is affine in the id's last digit (consecutive
  * same-length ids differ by exactly 1 pre-mix, a constant post-mix), so
  * its mod-k stripe kept 0 of 2066 sf1 pairs where independence predicts
  * ~21 — linearity is the same trap one step removed. The product form is
  * quadratic in the id ((x+1)(y+1) − xy varies with x), and measures
  * 20/2066 both-endpoint survivors at sf1, right on the 1/k² expectation.
  *
  * k = 10 sizes the sf10 stripe at exactly the full-corpus sf1 volume,
  * which every one of the three baselines has already passed whole
  * (CORRECTNESS_sf1.json) — so feasibility at each decade is inherited
  * from the previous decade's full run. The stripe fraction is a knob:
  * at sf100 the same differential wants k ≈ 30.
  *
  * The id must be non-empty when cast to VARCHAR (DuckDB's list_reduce
  * errors on empty lists); the striped columns are BIGINT keys, never
  * empty. */
object Stripe {

  /** Engine-side predicate: `id` is in stripe 0 of `k`. */
  def keep(id: Column, k: Int): Column = {
    val s = id.cast("string")
    val h1 = RollingHash.mix(RollingHash.rolling_hash(s), RollingHash.Mod)
    val h2 = RollingHash.mix(RollingHash.rolling_hash2(s), RollingHash.Mod2)
    (h1 * h2) % RollingHash.Mod % k === 0
  }

  private def hashSql(expr: String, mult: Long, mod: Long): String =
    s"""(list_reduce(list_transform(string_split(CAST($expr AS VARCHAR), ''),
           c -> ord(c)::BIGINT),
           (a, b) -> (a * $mult + b) % $mod)
         * 1103515245 + 12345) % $mod"""

  /** DuckDB replica of [[keep]] over SQL expression `expr`. */
  def sql(expr: String, k: Int): String =
    s"""((${hashSql(expr, RollingHash.Mult, RollingHash.Mod)}) *
         (${hashSql(expr, RollingHash.Mult2, RollingHash.Mod2)}))
        % ${RollingHash.Mod} % $k = 0"""

  /** The default stripe width of the `_oracle_baseline_stripe` entries. */
  final val K = 10
}
