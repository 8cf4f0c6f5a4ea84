package graft

import org.apache.spark.sql.functions._

/** Pins the salting experiment's core invariant: the salted binned range
  * join is PAIR-IDENTICAL to the unsalted one (each left row carries one
  * deterministic salt; the right side explodes all S, so every qualifying
  * pair meets at exactly the left row's salt — once). If the experiment
  * ever ships as a plan, this is the row-identity proof it rides on. */
class SaltProbeSpec extends SparkSpec {

  test("salted binned range join is pair-identical to the unsalted join " +
      "at sf0.001, for several salt factors") {
    val dir = sf("sf0.001")
    val e = sources.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
    val a = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us"))
    val b = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("ts_us").as("s_ts_us"))
    val W = 3600000000L
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("s_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs(operators.Advanced.rangeJoinBinned(a, b, "ts_us", "s_ts_us", W))
    assert(base.nonEmpty)
    for (s <- Seq(1, 4, 13)) {
      val salted = pairs(SaltProbe.saltedRangeJoinBinned(a, b, "ts_us", "s_ts_us", W, s))
      assert(salted == base, s"salt=$s: ${salted.size} vs ${base.size}")
    }
  }

  test("salted closePairs (geo (hb,cy,cx) key) is pair-identical to the " +
      "blocked join, natural and planted-skew, several salt factors") {
    val dir = sf("sf0.001")
    def positions = sources.Tables.events(spark, dir).select(
      col("user_id").as("ship"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      ((col("event_id") % 1780) / 10.0 - 89.0).as("lat"),
      ((col("event_id") % 3580) / 10.0 - 179.0).as("lon"))
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ship_a"), col("ship_b"), col("ts_a"), col("ts_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    for (p <- Seq(positions, GeoSaltProbe.planted(positions, 0.05))) {
      val base = keyset(operators.Geo.closePairs(p))
      for (s <- Seq(1, 4, 8)) {
        val salted = keyset(GeoSaltProbe.saltedClosePairs(p, s))
        assert(salted == base, s"salt=$s: ${salted.size} vs ${base.size}")
      }
    }
  }
}
