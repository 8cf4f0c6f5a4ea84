package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Geo

/** Convoy-regime probe for `geo_encounter_episodes` (r14 verdict item 3).
  *
  * [[DensityProbe]] measured the density crossover (~1 ping/ship-hour) by
  * remapping ship ids, which raises density but CANNOT manufacture
  * co-travel — so the (pings/ship-hour)² exact-arm blowup the episode cap
  * exists for remained argued, not measured. This probe synthesizes the
  * co-travel directly: `convoys` pairs of ships steam the same lane (time
  * offset 1.5 min, lat offset ~0.5 km — always within 50 km of each other)
  * for `hours` hours at D pings/ship-hour, with a 2-hour radio-silence gap
  * mid-voyage (so the episode arm must emit exactly TWO episodes per pair —
  * sessionization is verified, not just fast).
  *
  * Lanes sit 2 degrees apart (>220 km), so cross-convoy detections are
  * zero and the books balance exactly:
  *   - exact arm output   = sum over pair-hours of (ping pairs with
  *     |dt| <= 1 h) — grows ~2·D² per pair-hour;
  *   - episode arm output = 2 rows per pair, FLAT in D; its join input is
  *     one representative per ship-hour.
  *
  * The probe ladders D = {10, 60, 600} (600 = the real-AIS 2-10 s beacon
  * regime) at fixed ships x hours, timing both arms warm (min-of-2) and
  * printing one JSON line per cell; the adjudication (the quadratic law
  * table) lives in BENCH_NOTES and the SCALE.md geo row.
  */
object ConvoyProbe {

  /** Synthetic co-traveling fleet: 2·convoys ships, `hours` hours, D
    * pings/ship-hour; hours 10-11 silent (the episode gap). */
  private[graft] def convoyPositions(spark: SparkSession, convoys: Int,
      hours: Int, d: Int): DataFrame = {
    val perShip = hours.toLong * d
    val usPerPing = 3600000000L / d
    spark.range(2L * convoys * perShip)
      .select(
        (col("id") / perShip).cast("long").as("ship"),
        (col("id") % perShip).as("k"),
        col("id").as("event_id"))
      .withColumn("convoy", (col("ship") / 2).cast("long"))
      .withColumn("member", (col("ship") % 2).cast("long"))
      // the 2-hour gap: no pings in hours [10, 12)
      .filter(col("k") < lit(10L * d) || col("k") >= lit(12L * d))
      .select(
        col("ship"), col("event_id"),
        (col("k") * usPerPing + col("member") * 90000000L).as("ts_us"),
        (lit(-60.0) + (col("convoy") % 60) * 2.0 +
          col("member") * 0.005).as("lat"),
        (lit(-170.0) + (col("convoy") / 60).cast("long") * 30.0 +
          col("k") / lit(d.toDouble) * 0.1).as("lon"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val convoys = sys.env.getOrElse("SPARK_GRAFT_CONVOYS", "10").toInt
    val hours = sys.env.getOrElse("SPARK_GRAFT_CONVOY_HOURS", "24").toInt
    val densities = sys.env.getOrElse("SPARK_GRAFT_CONVOY_D", "10,60,600")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(df: => DataFrame): (Double, Long) =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    for (d <- densities) {
      val p = convoyPositions(spark, convoys, hours, d).cache()
      val nPos = p.count()
      val (tExact, nPairs) = time(Geo.encounterPairs(p))
      val (tEp, nEps) = time(Geo.encounterEpisodes(p))
      // the sessionization check: exactly two episodes per convoy pair
      val wantEps = 2L * convoys
      println(f"""{"convoy_probe":{"convoys":$convoys,"hours":$hours,"pings_per_ship_hour":$d,"positions":$nPos,"exact_sec":$tExact%.1f,"exact_rows":$nPairs,"episodes_sec":$tEp%.1f,"episode_rows":$nEps,"episode_rows_expected":$wantEps}}""")
      p.unpersist()
    }
    spark.stop()
  }
}
