package graft.operators

import graft.QueryDef
import graft.ais.{AisDecoder, AisIngest, Enrich, FixtureWeatherClient, NmeaEncoder}
import graft.sources.Tables

/** The AIS engine as a benchable query: synthesize a deterministic fleet of
  * NMEA sentences sized by scale factor, run the full decode → filter →
  * enrich pipeline, and return the enriched rows. In BENCH this measures
  * end-to-end decode throughput — the reference's equivalent stage was
  * bounded at ~0.28 events/s by per-record HTTP + per-message flush
  * (README.md:50, utils.py:27-32); this pipeline does the same work in bulk.
  *
  * Oracled end-to-end: the sentence stream is a closed-form function of the
  * row index, so a generated DuckDB query recomputes the expected output of
  * encode → NMEA assembly → bit decode → range filters → cell-granular
  * weather enrichment from `generate_series` — including the AIS wire
  * quantization (speed to 0.1 kn, lat/lon to 1/600000°) and the fixture
  * weather hash. A single bit-layout or rounding regression anywhere in the
  * decode path breaks the hash match.
  */
object AisThroughput {

  /** Sentences per scale: events_rows / 3 (sf0.001→333, sf0.01→3 333,
    * sf0.1→33 333) — derived from a table count so the fixed oracle SQL can
    * compute the same n. */
  private def countFor(s: org.apache.spark.sql.SparkSession, dir: String): Int =
    (Tables.events(s, dir).count() / 3).toInt

  /** DuckDB replica of the whole pipeline. Notes on exactness:
    *   - both engines run the same IEEE-754 double expression trees, so the
    *     quantized values agree bit-for-bit (real values never sit at a
    *     rounding half-way point, where Scala and SQL round would differ);
    *   - the fixture weather hash is 32-bit Int arithmetic in Scala; the SQL
    *     wraps its BIGINT products back to signed 32-bit before the XOR. */
  private val oracle: String = {
    val statusCase = AisDecoder.navStatusNames.zipWithIndex
      .map { case (name, code) => s"WHEN $code THEN '$name'" }
      .mkString(" ")
    def wrap32(x: String): String =
      s"((($x) % 4294967296 + 4294967296 + 2147483648) % 4294967296 - 2147483648)"
    s"""WITH params AS (SELECT count(*) // 3 AS n FROM events),
        g AS (SELECT unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i FROM params),
        raw AS (SELECT i,
                  257000001 + (i % 5000) AS mmsi_n,
                  i % 16 AS status_c,
                  round(((i % 90) / 1.2) * 10) / 10.0 AS speed,
                  CAST(i % 400 AS INTEGER) AS heading,
                  1700000000 + i AS timestamp,
                  round((-89.0 + (i % 1780) * 0.1) * 600000) / 600000.0 AS lat,
                  round((-179.0 + (i % 3580) * 0.1) * 600000) / 600000.0 AS lon
                FROM g),
        f AS (SELECT * FROM raw
              WHERE speed > 2 AND speed < 75 AND lat <= 90 AND lon <= 180
                AND heading < 360),
        c AS (SELECT *, CAST(floor(lat) AS BIGINT) AS cy,
                        CAST(floor(lon) AS BIGINT) AS cx FROM f),
        hh AS (SELECT *,
                 xor(${wrap32("cy * 73856093")}, ${wrap32("cx * 19349663")})
                   & 2147483647 AS h
               FROM c)
        SELECT CAST(mmsi_n AS VARCHAR) AS mmsi,
               CASE status_c $statusCase END AS status,
               speed, heading, timestamp, lat, lon,
               'cell_' || cy || '_' || cx AS locale,
               'region_' || (h % 10) AS region,
               CASE WHEN cy >= 57 AND cy <= 72 AND cx >= 4 AND cx <= 32
                    THEN 'Norway' ELSE 'Sea' END AS country,
               ['Clear', 'Partly cloudy', 'Overcast', 'Light rain', 'Fog',
                'Snow'][(h % 6) + 1] AS condition,
               (h % 600) / 10.0 - 10.0 AS temp_f,
               (h % 400) / 10.0 AS wind_mph,
               ['N', 'NE', 'E', 'SE', 'S', 'SW', 'W', 'NW'][(h % 8) + 1] AS wind_dir
        FROM hh"""
  }

  val pipelineQ = QueryDef(
    "ais_pipeline_decode",
    "full AIS pipeline over synthesized NMEA: decode, filter, enrich (oracled)",
    Some(oracle),
    (s, dir) => graft.plans.Deferred.dataFrame(s,
      org.apache.spark.sql.Encoders.product[graft.ais.PositionWithWeather].schema,
      // countFor is an action (the sizing count over events), so defer the
      // whole build to first execution — registration stays job-free
      () => {
      import s.implicits._
      val n = countFor(s, dir)
      // synthesize ON the executors (spark.range, 32 partitions): the driver
      // ships a closure, not n encoded strings — at scale the feed replay is
      // generated/read where it is decoded
      val lines = s.range(0, n, 1, 32).map { i =>
        val ii = i.toInt
        NmeaEncoder.position(if (ii % 3 == 0) 3 else 1, 257000001L + (ii % 5000),
          status = ii % 16, speedKnots = (ii % 90) / 1.2,
          lon = -179.0 + (ii % 3580) * 0.1, lat = -89.0 + (ii % 1780) * 0.1,
          heading = ii % 400, ts = 1700000000L + ii)
      }
      val decoded = AisIngest.decode(lines)
      Enrich.withWeather(AisIngest.positions(decoded),
        () => new FixtureWeatherClient).toDF()
    }))

  val defs: Seq[QueryDef] = Seq(pipelineQ)
}
