package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is declared as `QueryDef`s (implementation + DuckDB
  * oracle side by side) in:
  *   - [[operators.Serving]]       — SURVEY.md §2.D dashboard surface (D1-D9)
  *   - [[operators.Ingest]]        — §2.A/§2.C ingest transforms + latest-per-key
  *   - [[operators.Relational]]    — TPC-H shapes, set ops, windows, rollups
  *   - [[operators.Advanced]]      — session windows, as-of (composed + custom
  *                                   plan), binned range join, grouping sets,
  *                                   pivot, percentiles, typed
  *                                   aggregator/mapGroups, sequence assembly
  *   - [[operators.Skew]]          — salted two-phase aggregation + skew report
  *   - [[operators.AisThroughput]] — the AIS pipeline as an oracled benchable query
  *   - [[operators.Geo]]           — cell density, haversine track analytics
  *   - [[operators.Analytics]]     — funnel, cohort retention, histograms
  *   - [[operators.Dedup]] / [[operators.Similarity]] /
  *     [[operators.TextAnalysis]] / [[multimodal.Media]] — SURVEY.md §7.6
  *     (near-dup pipelines incl. clusters + hamming bands, ANN + k-means,
  *     text/quality/split/mix, multimodal decode/resize/frame-sample)
  * Full inventory: SURVEY.md §8; scale contract: SCALE.md.
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    operators.Serving.defs ++ operators.Ingest.defs ++
      operators.Relational.defs ++ operators.TpchMore.defs ++
      operators.Advanced.defs ++ operators.PrefixAgg.defs ++
      operators.Skew.defs ++ operators.Sketches.defs ++
      operators.AisThroughput.defs ++
      operators.Geo.defs ++ operators.Analytics.defs ++
      operators.Dedup.defs ++ operators.Similarity.defs ++
      operators.TextAnalysis.defs ++ operators.Pipeline.defs ++
      operators.Warehouse.defs ++ operators.Curation.defs ++
      operators.LmData.defs ++ operators.Retrieval.defs ++
      operators.Graph.defs ++ operators.MlPrep.defs ++
      operators.Eval.defs ++ operators.TimeSeries.defs ++
      multimodal.Media.defs

  /** Flagship: the full AIS pipeline end-to-end — synthesized NMEA sentences
    * → decode (types 1/3/18/5, two-fragment assembly) → quality filters →
    * weather enrichment → the dashboard join D3 (console.py:45-51). Driver
    * smoke-checks rows>0. Deterministic: encoder fixtures + fixture weather. */
  def entry(spark: SparkSession): DataFrame = {
    import ais._
    import spark.implicits._
    val lines: Seq[String] = (0 until 10).flatMap { i =>
      val mmsi = 257000001L + i
      val ts = 1700000000L + i * 60
      Seq(
        NmeaEncoder.position(1, mmsi, status = i % 9, speedKnots = 5.0 + i,
          lon = 4.5 + i * 0.1, lat = 58.0 + i * 0.2, heading = (i * 37) % 360, ts = ts),
        NmeaEncoder.positionB(mmsi, 4.0 + i, 4.6 + i * 0.1, 58.1 + i * 0.2,
          (i * 53) % 360, ts + 30)) ++
        NmeaEncoder.staticVoyage(mmsi, s"LA${i}X", s"SHIP$i", 70 + (i % 5),
          "BERGEN", ts + 10)
    }
    val decoded = AisIngest.decode(spark.createDataset(lines).coalesce(1))
    val enriched = Enrich.withWeather(
      AisIngest.positions(decoded), () => new FixtureWeatherClient)
    Dashboard.shipDetails(enriched.toDF(), AisIngest.shipInfo(decoded).toDF())
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
