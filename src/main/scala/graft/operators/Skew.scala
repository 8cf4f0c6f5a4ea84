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
      .agg(count(lit(1)).as("pn"),
        sum(value.cast("decimal(28,6)")).as("psum"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("vsum"))

  /** Salted aggregate over events: identical result to a plain GROUP BY
    * (the oracle), different shuffle shape. Doubles survive the two-phase
    * re-association because the compare rounds both sides. */
  val saltedQ = QueryDef(
    "skew_salted_agg",
    "two-phase salted aggregation equals plain GROUP BY",
    Some(s"""SELECT event_type, count(*) AS n,
                    ${Num.sqlSum("value", 6, 2)} AS vsum
             FROM events GROUP BY event_type"""),
    (s, dir) => saltedCountSum(Tables.events(s, dir),
      col("event_type"), col("event_id"), col("value"), saltBuckets = 16)
      .select(col("k").as("event_type"), col("n"),
        Num.pround(col("vsum"), 2).as("vsum")))

  /** Skew diagnosis — the report you run BEFORE choosing a mitigation: per
    * grouping key its row count, share of the table, and heaviness rank.
    * One aggregate + one windowed pass over the (small) per-key result. */
  val skewReportQ = QueryDef(
    "skew_report_suppkey",
    "per-key skew report: count, share of total, rank (top 20 suppliers)",
    Some(s"""WITH k AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
             t AS (SELECT sum(n) AS total FROM k)
             SELECT l_suppkey, n,
                    ${Num.sql("100.0 * n / total", 4)} AS pct,
                    rank() OVER (ORDER BY n DESC) AS heaviness
             FROM k, t
             ORDER BY n DESC, l_suppkey LIMIT 20"""),
    (s, dir) => {
      // cached: two consumers (the grand total + the top-20 ranking) —
      // uncached, the corpus-scale key-count aggregation runs twice
      val k = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
        .cache()
      val total = k.agg(sum(col("n")).as("total"))
      // top-20 FIRST (TakeOrdered — per-partition heaps, no global sort or
      // single-partition window over the whole key set), then rank the 20
      // survivors: rank counts strictly-greater n, so excluded ties at the
      // boundary cannot change the survivors' rank values
      k.crossJoin(broadcast(total))
        .select(col("l_suppkey"), col("n"),
          Num.pround(lit(100.0) * col("n") / col("total"), 4).as("pct"))
        .orderBy(col("n").desc, col("l_suppkey"))
        .limit(20)
        .withColumn("heaviness", rank().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n").desc))
          .cast("long"))
    })

  val defs: Seq[QueryDef] = Seq(saltedQ, skewReportQ)
}
