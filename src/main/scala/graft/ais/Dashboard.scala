package graft.ais

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The serving layer (SURVEY.md §2.D): every dashboard query from
  * lib/console.py + sql/clickhouse-dml.sql as a named DataFrame function over
  * the two accumulated tables (position+weather, ship-info). The reference
  * ran D5-D8 client-side in pandas; here they're server-side Catalyst
  * expressions in the same plan.
  */
object Dashboard {

  /** D1 — `select count(distinct mmsi) as ship_count` (console.py:34-37). */
  def shipCount(posWx: DataFrame): DataFrame =
    posWx.agg(countDistinct(col("mmsi")).as("ship_count"))

  /** D2 — same with `where speed > 10` (console.py:39-42). */
  def fastShipCount(posWx: DataFrame, knots: Double = 10): DataFrame =
    posWx.filter(col("speed") > knots)
      .agg(countDistinct(col("mmsi")).as("ship_count"))

  /** D3 — the dashboard join (console.py:45-51; clickhouse-dml.sql:11-14):
    * left-outer on mmsi, drop empty shipnames, 17-column projection. The
    * info side is broadcast (ship-info ≪ positions). CH's '' fill vs Spark's
    * NULL both vanish under the `!= ''` filter (SURVEY.md §7.5). */
  def shipDetails(posWx: DataFrame, info: DataFrame): DataFrame =
    posWx.as("spw")
      .join(broadcast(info.as("sid")), Seq("mmsi"), "left_outer")
      .filter(col("shipname") =!= "")
      .select(col("mmsi"), col("shipname"), col("callsign"), col("shiptype"),
        col("destination"), col("status"), col("heading"), col("speed"),
        col("lat"), col("lon"), col("region"), col("locale"), col("condition"),
        col("temp_f"), col("wind_dir"), col("wind_mph"), col("spw.timestamp"))

  /** D4 — `limit 600` (console.py:50). Nondeterministic in the reference (no
    * ORDER BY); pass an ordering for reproducible results (SURVEY.md §7.5). */
  def limited(details: DataFrame, n: Int = 600,
      order: Seq[Column] = Seq(col("mmsi"), col("timestamp"))): DataFrame =
    details.orderBy(order: _*).limit(n)

  /** D5 — map center: mean lat/lon (console.py:59-60, pandas `.mean()`). */
  def mapCenter(posWx: DataFrame): DataFrame =
    posWx.agg(avg(col("lat")).as("center_lat"), avg(col("lon")).as("center_lon"))

  /** D6 — map bounds: min/max lat/lon (console.py:102-105). */
  def mapBounds(posWx: DataFrame): DataFrame =
    posWx.agg(min(col("lat")).as("min_lat"), max(col("lat")).as("max_lat"),
      min(col("lon")).as("min_lon"), max(col("lon")).as("max_lon"))

  /** D7 — hemisphere suffixes + tooltip/popup interpolation
    * (console.py:86-100), as pure expressions. */
  def annotated(details: DataFrame): DataFrame = {
    val latU = when(col("lat") > 0, "°N").otherwise("°S")
    val lonU = when(col("lon") > 0, "°E").otherwise("°W")
    details
      .withColumn("lat_units", latU)
      .withColumn("lon_units", lonU)
      .withColumn("tooltip", format_string(
        "Name: %s, Callsign: %s, Type: %s, Status: %s",
        col("shipname"), col("callsign"), col("shiptype"), col("status")))
      .withColumn("popup", format_string(
        "Lat: %s%s | Lon: %s%s | Course: %s° at %s knots | Condition: %s | " +
          "Wind: %s mph %s | Temp: %s°F | Location: %s, %s",
        col("lat"), col("lat_units"), col("lon"), col("lon_units"),
        col("heading"), col("speed"), col("condition"), col("wind_mph"),
        col("wind_dir"), col("temp_f"), col("locale"), col("region")))
  }

  /** D8 — the icon-color prefix lookup (console.py:62-80). Exact reproduction
    * of the reference's dict: "Law" appears twice in the literal, so its
    * value is "lightgreen" but it keeps first-insertion position; first
    * matching prefix wins, default lightgray. */
  val iconColorMap: Seq[(String, String)] = Seq(
    "Tanker" -> "red", "Law" -> "lightgreen", "Military" -> "gray",
    "Pilot" -> "lightred", "Medical" -> "darkred", "Cargo" -> "purple",
    "Search" -> "orange", "NonCombat" -> "beige", "Passenger" -> "green",
    "Dredging" -> "darkgreen", "AntiPollution" -> "darkblue",
    "Fishing" -> "lightblue", "Towing" -> "darkpurple", "HSC" -> "pink",
    "OtherType" -> "cadetblue", "Tug" -> "black")

  def iconColor(shiptype: Column): Column =
    iconColorMap.tail.foldLeft(
      when(shiptype.startsWith(iconColorMap.head._1), iconColorMap.head._2)) {
      case (w, (prefix, color)) => w.when(shiptype.startsWith(prefix), color)
    }.otherwise("lightgray")

  /** Idiomatic upgrade (SURVEY.md §7.5): latest info row per mmsi — the
    * explicit form of the compacted info topic's retention intent
    * (README.md:199-200). Parity mode (shipDetails) keeps the append-only
    * many-to-many join; this is the dedup'd variant. */
  def latestInfo(info: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("mmsi"))
      .orderBy(col("timestamp").desc, col("shipname"))
    info.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}
