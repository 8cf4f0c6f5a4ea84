package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.DataFrame

/** Hot-cell auto-salting in [[BlockHaversineJoins]] (r15): fires only past
  * the measured trigger, stays pair-identical to the naive plan, keeps
  * Semi left-uniqueness — the spatial twin of AutoSaltSpec. */
class SpatialAutoSaltSpec extends SparkSpec {

  /** 40 uniform diagonal cells (25 rows each, >110 km apart — no
    * cross-cell matches at r=30) plus one hot cell at (50, 50) holding
    * 400 rows: same-cell mass share ~0.87 over 41 cells -> fires. */
  private def views(): Unit = {
    import spark.implicits._
    val uniform = (0 until 1000).map { i =>
      val c = i % 40
      (i.toLong, c + 0.5 + (i % 5) * 0.01, c + 0.5 + (i % 7) * 0.01)
    }
    val hot = (0 until 400).map { i =>
      (10000L + i, 50.3 + (i % 20) * 0.02, 50.3 + (i % 25) * 0.02)
    }
    (uniform ++ hot).toDF("id", "lat", "lon")
      .createOrReplaceTempView("gs_skew")
    uniform.toDF("id", "lat", "lon").createOrReplaceTempView("gs_flat")
  }

  private val joinSql =
    """SELECT a.id AS aid, b.id AS bid FROM %s a JOIN %s b
         ON haversine_km(a.lat, a.lon, b.lat, b.lon) <= 30.0"""

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def naive(sql: String): Set[(Long, Long)] = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == BlockHaversineJoins)
    try pairs(spark.sql(sql))
    finally spark.experimental.extraOptimizations = saved
  }

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("planted hot cell: salted plan fires and is pair-identical to the " +
      "naive join (factors 4 and 8)") {
    Graft.init(spark)
    views()
    val sql = joinSql.format("gs_skew", "gs_skew")
    val want = naive(sql)
    assert(want.size > 100000, s"hot cluster should self-match: ${want.size}")
    // broadcast disabled: salting targets the shuffle-join regime
    for (s <- Seq(4, 8)) {
      withConf("spark.graft.spatialJoin.autoSalt.factor" -> s.toString,
          "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val df = spark.sql(sql)
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("__graft_cell_ps"), s"factor=$s should salt:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"), p)
        assert(pairs(df) == want, s"factor=$s pair drift")
      }
    }
  }

  test("uniform cells / conf off / factor 1: blocked but NOT salted") {
    Graft.init(spark)
    views()
    val flatP = spark.sql(joinSql.format("gs_flat", "gs_flat"))
      .queryExecution.executedPlan.toString
    assert(flatP.contains("__graft_cell") && !flatP.contains("__graft_cell_ps"),
      flatP)
    for (kv <- Seq(
        "spark.graft.spatialJoin.autoSalt.factor" -> "1",
        "spark.graft.spatialJoin.autoSalt.enabled" -> "false")) {
      withConf(kv) {
        val p = spark.sql(joinSql.format("gs_skew", "gs_skew"))
          .queryExecution.executedPlan.toString
        assert(p.contains("__graft_cell") && !p.contains("__graft_cell_ps"),
          s"$kv:\n$p")
      }
    }
  }

  test("LeftSemi under salt: left stays physically unique") {
    Graft.init(spark)
    views()
    val semiSql =
      """SELECT id FROM gs_skew a WHERE EXISTS (
           SELECT 1 FROM gs_skew b
           WHERE haversine_km(a.lat, a.lon, b.lat, b.lon) <= 30.0
             AND b.id <> a.id)"""
    var got: Seq[Long] = null
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(semiSql)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__graft_cell_ps"), s"semi should salt:\n$p")
      got = df.collect().map(_.getLong(0)).toSeq
    }
    assert(got.size == got.distinct.size,
      s"semi emitted duplicate left rows: ${got.size} vs ${got.distinct.size}")
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == BlockHaversineJoins)
    val want = try spark.sql(semiSql).collect().map(_.getLong(0)).toSet
    finally spark.experimental.extraOptimizations = saved
    assert(got.toSet == want)
  }
}
