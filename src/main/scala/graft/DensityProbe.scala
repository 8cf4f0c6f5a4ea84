package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Density-crossover probe for `geo_encounter_episodes` vs `geo_encounters`.
  *
  * The sf30 TimeQ measurement showed the episode twin 10% SLOWER than the
  * exact twin on the generator corpus — honestly expected once measured:
  * the generator scatters events at ~0.55 pings/ship-hour, so the
  * hourly-representative cap removes nothing and the episode query pays
  * the same blocked join plus two windows. The answer-shrinking claim is a
  * DENSITY law, not a constant: exact detections per co-located pair-hour
  * grow with (pings/ship-hour)² while the rep cap holds the episode arm at
  * <= 3. Real AIS beacons every 2-10 s (~600 pings/ship-hour); the
  * generator sits three orders of magnitude below that regime.
  *
  * This probe measures the law directly: same event corpus, ship ids
  * remapped onto K ships (`user_id % K`), which multiplies pings/ship-hour
  * without touching the spatial/temporal distribution. For each K it times
  * both arms warm (min-of-2) and reports input rows, reps after the cap,
  * and output rows. Expected and measured: exact-arm cost is
  * ship-count-independent (detections depend on space-time co-location
  * only), while the episode arm's join input falls ∝ 1/density once
  * pings/ship-hour > 1 — the crossover the catalog entry exists for.
  */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def positions(k: Long) = sources.Tables.events(spark, dir).select(
      (col("user_id") % k).as("ship"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("value").as("speed"),
      ((col("event_id") % 1780) / 10.0 - 89.0).as("lat"),
      ((col("event_id") % 3580) / 10.0 - 179.0).as("lon"))

    def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    val nPos = positions(Long.MaxValue).count()
    val hours = 720.0 // generator window: fixed 30 days
    for (k <- Seq(100000000L, 1500L, 150L)) {
      val p = positions(k)
      val nShips = p.select(countDistinct(col("ship"))).head().getLong(0)
      val nReps = p.filter(abs(col("lat")) <= 70)
        .select(col("ship"), floor(col("ts_us") / operators.Geo.encounterUs))
        .distinct().count()
      val density = nPos / (nShips * hours)
      val (tExact, nPairs) = time(operators.Geo.encounterPairs(p))
      val (tEp, nEps) = time(operators.Geo.encounterEpisodes(p))
      println(f"""{"density_probe":{"ships":$nShips,"pings_per_ship_hour":$density%.2f,"positions":$nPos,"reps":$nReps,"exact_sec":$tExact%.1f,"exact_rows":$nPairs,"episodes_sec":$tEp%.1f,"episode_rows":$nEps}}""")
    }
    spark.stop()
  }
}
