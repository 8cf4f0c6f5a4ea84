package graft.plans

import graft.SparkSpec
import graft.operators.Advanced
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Differential test: the custom AsOfJoinExec must produce exactly the rows
  * of the composed union+window asofJoin, and must plan as a co-partitioned
  * sort-merge (two exchanges, no window). */
class AsOfPlanSpec extends SparkSpec {

  private def sides(dir: String) = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"),
        unix_micros(col("ts")).as("signup_ts_us"))
    (purchases, signups)
  }

  test("custom exec output == composed union+window output") {
    val (purchases, signups) = sides(sf("sf0.001"))
    val composed = Advanced.asofJoin(purchases, signups, "user_id", "ts",
      Seq("signup_event_id", "signup_ts_us"))
      .select(col("event_id"), col("user_id"), col("purchase_ts_us"),
        col("asof_signup_event_id").as("signup_event_id"),
        col("asof_signup_ts_us").as("signup_ts_us"))
    val custom = AsOf.join(purchases, signups, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("purchase_ts_us"),
        col("signup_event_id_r").as("signup_event_id"),
        col("signup_ts_us_r").as("signup_ts_us"))
    assert(custom.count() == purchases.count()) // left-outer: every left row
    assert(custom.exceptAll(composed).isEmpty && composed.exceptAll(custom).isEmpty)
  }

  test("physical plan is the custom sort-merge exec, not a window") {
    val (purchases, signups) = sides(sf("sf0.001"))
    val p = AsOf.join(purchases, signups, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // nodeName strips the Exec suffix
    assert(!p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("left-side filters push through the custom node, below the shuffle") {
    val (purchases, signups) = sides(sf("sf0.001"))
    val filtered = AsOf.join(purchases, signups, "user_id", "ts")
      .filter(col("user_id") === 3)
    // physical proof: the filter runs BELOW the left Exchange (before any
    // bytes shuffle), not above the join — tree text prints children after
    // parents, so the filter's position must follow the first Exchange
    val physical = filtered.queryExecution.executedPlan.toString
    val exchangeIdx = physical.indexOf("Exchange hashpartitioning")
    val filterIdx = """Filter \(isnotnull\(user_id""".r
      .findFirstMatchIn(physical).map(_.start).getOrElse(-1)
    assert(exchangeIdx >= 0 && filterIdx > exchangeIdx, physical)
    assert(!physical.substring(0, exchangeIdx).contains("= 3)"), physical)
    // and results are unchanged by the rewrite
    val expected = AsOf.join(purchases.filter(col("user_id") === 3), signups,
      "user_id", "ts")
    assert(filtered.exceptAll(expected).isEmpty && expected.exceptAll(filtered).isEmpty)
  }

  test("right-side filters are NOT pushed (they would change the match)") {
    val (purchases, signups) = sides(sf("sf0.001"))
    val df = AsOf.join(purchases, signups, "user_id", "ts")
      .filter(col("signup_event_id_r").isNotNull)
    // correctness: equals filtering the JOIN OUTPUT, not the right input
    val viaOutput = AsOf.join(purchases, signups, "user_id", "ts")
      .collect().count(r => !r.isNullAt(r.fieldIndex("signup_event_id_r")))
    assert(df.count() == viaOutput)
  }

  test("string (buffer-backed) join keys match correctly across key changes") {
    // UTF8String keys point into the sorted iterator's reused buffers; the
    // exec must remember the matched key from the COPIED row, or key-change
    // detection corrupts silently. Differential check against the composed
    // window form on string user keys.
    val (purchases, signups) = sides(sf("sf0.001"))
    val pStr = purchases.withColumn("user_key", concat(lit("user_"), col("user_id")))
      .drop("user_id")
    val sStr = signups.withColumn("user_key", concat(lit("user_"), col("user_id")))
      .drop("user_id")
    val composed = Advanced.asofJoin(pStr, sStr, "user_key", "ts",
      Seq("signup_event_id", "signup_ts_us"))
      .select(col("event_id"), col("user_key"),
        col("asof_signup_event_id").as("se"), col("asof_signup_ts_us").as("st"))
    val custom = AsOf.join(pStr, sStr, "user_key", "ts")
      .select(col("event_id"), col("user_key"),
        col("signup_event_id_r").as("se"), col("signup_ts_us_r").as("st"))
    assert(custom.exceptAll(composed).isEmpty && composed.exceptAll(custom).isEmpty)
  }

  test("left rows with no earlier right row carry nulls") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 15L, "x"), (3L, 1L, "y")).toDF("k", "t", "rv")
    val out = AsOf.join(left, right, "k", "t")
      .select(col("lv"), col("rv_r")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("a" -> None, "b" -> Some("x"), "c" -> None))
  }
}
