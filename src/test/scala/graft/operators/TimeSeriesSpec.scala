package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Local-reference pins for the time-series family (the DuckDB oracles are
  * the primary gate; these catch semantic drift with an independent scalar
  * implementation). */
class TimeSeriesSpec extends SparkSpec {

  private def dailyCounts(): Map[(String, java.time.LocalDate), Double] =
    Tables.events(spark, sf("sf0.001"))
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getDouble(2))
      .toMap

  private def round4(v: Double): Double = math.floor(v * 1e4 + 0.5) / 1e4

  test("ts_cross_corr matches a local Pearson over collected daily counts, " +
      "and lag 0 is symmetric in the pair") {
    val daily = dailyCounts()
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val got = TimeSeries.crossCorrQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    val want = (for {
      ta <- types; tb <- types if tb > ta
      lagN <- 0 to 3
    } yield {
      // pair set: days where a has a count AND b has one lagN days earlier.
      // .toSeq BEFORE collect: keys is a Set, and collecting value pairs
      // through it would dedupe identical (x, y) pairs and corrupt moments
      val pts = daily.keys.toSeq.collect {
        case (t, d) if t == ta && daily.contains((tb, d.minusDays(lagN))) =>
          (daily((ta, d)), daily((tb, d.minusDays(lagN))))
      }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (ta, tb, lagN) -> round4((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    }).toMap
    assert(got.keySet == want.keySet)
    // moments are exact integer sums, so the only float ops (one sqrt, one
    // divide) run on identical inputs — equality is exact, not approximate
    got.foreach { case (k, r) => assert(r == want(k), s"$k: $r vs ${want(k)}") }
    assert(got.nonEmpty)
  }
}
