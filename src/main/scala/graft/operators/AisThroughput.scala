package graft.operators

import graft.QueryDef
import graft.ais.{AisIngest, Enrich, FixtureWeatherClient, NmeaEncoder}

/** The AIS engine as a benchable query: synthesize a deterministic fleet of
  * NMEA sentences sized by scale factor, run the full decode → filter →
  * enrich pipeline, and return the enriched rows. No oracle (the pipeline is
  * pinned by its own golden tests); in BENCH this measures end-to-end decode
  * throughput — the reference's equivalent stage was bounded at ~0.28
  * events/s by per-record HTTP + per-message flush (README.md:50,
  * utils.py:27-32); this pipeline does the same work in bulk.
  */
object AisThroughput {

  /** Sentences per scale: sf0.001→10k, sf0.01→20k, sf0.1→50k (generation is
    * driver-side and cheap; decode dominates). */
  private def countFor(dir: String): Int =
    if (dir.endsWith("0.1")) 50000 else if (dir.endsWith("0.01")) 20000 else 10000

  val pipelineQ = QueryDef(
    "ais_pipeline_decode",
    "full AIS pipeline over synthesized NMEA: decode, filter, enrich",
    None,
    (s, dir) => {
      import s.implicits._
      val n = countFor(dir)
      val lines = (0 until n).map { i =>
        NmeaEncoder.position(if (i % 3 == 0) 3 else 1, 257000001L + (i % 5000),
          status = i % 16, speedKnots = (i % 90) / 1.2,
          lon = -179.0 + (i % 3580) * 0.1, lat = -89.0 + (i % 1780) * 0.1,
          heading = i % 400, ts = 1700000000L + i)
      }
      val decoded = AisIngest.decode(s.createDataset(lines).repartition(32))
      Enrich.withWeather(AisIngest.positions(decoded),
        () => new FixtureWeatherClient).toDF()
    })

  val defs: Seq[QueryDef] = Seq(pipelineQ)
}
