package graft.operators

import graft.QueryDef
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * A hot grouping key (one key holding a large share of 100 TB) turns a
  * plain groupBy into one straggler task. Salting splits each key into
  * `saltBuckets` sub-keys for the first (heavy) shuffle, then re-aggregates
  * the per-salt partials in a second, tiny shuffle keyed on the real key —
  * the classic mitigation when AQE's skew handling can't apply (aggregations;
  * AQE skew-join only covers joins).
  *
  * The salt must be deterministic-per-row, never random: `pmod(hash(rowid))`
  * keeps retries/speculative tasks consistent (a random salt breaks
  * exactly-once semantics under task retry).
  */
object Skew {

  /** Count + sum per key via salted two-phase aggregation. `partials` maps
    * each wanted output to (partial agg, final re-agg). */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
      value: Column, saltBuckets: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(saltSource), lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("psum"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("vsum"))

  /** Salted aggregate over events: identical result to a plain GROUP BY
    * (the oracle), different shuffle shape. Doubles survive the two-phase
    * re-association because the compare rounds both sides. */
  val saltedQ = QueryDef(
    "skew_salted_agg",
    "two-phase salted aggregation equals plain GROUP BY",
    Some(s"""SELECT event_type, count(*) AS n,
                    ${Num.sql("sum(value)", 2)} AS vsum
             FROM events GROUP BY event_type"""),
    (s, dir) => saltedCountSum(Tables.events(s, dir),
      col("event_type"), col("event_id"), col("value"), saltBuckets = 16)
      .select(col("k").as("event_type"), col("n"),
        Num.pround(col("vsum"), 2).as("vsum")))

  val defs: Seq[QueryDef] = Seq(saltedQ)
}
