package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's ingest-stage operators (SURVEY.md §2.A, §2.C), expressed as
  * verifiable batch queries over the generic tables. The same operators run
  * over real decoded AIS records in `graft.ais` (tests drive that path with
  * NMEA fixtures); here each one is pinned to the DuckDB oracle.
  *
  * All of these are stateless narrow transforms (filter/project/case-when):
  * at 100 TB they chain into a single WholeStageCodegen stage over the scan,
  * no shuffle, and the filters push down into the parquet reader.
  */
object Ingest {

  /** A5 — router/multiplex on message type (producer-from-ais-api.py:37-38):
    * position branch (msg types 1|3|18 ~ the high-volume event types). */
  val a5pos = QueryDef(
    "a5_route_position",
    "stream router, position branch: isin filter (producer-from-ais-api.py:37-38)",
    Some("""SELECT event_id, user_id, event_type, value FROM events
            WHERE event_type IN ('click', 'view', 'purchase')"""),
    (s, dir) => Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value")))

  /** A5 — router, static/voyage branch (msg type 5 ~ 'signup'). */
  val a5info = QueryDef(
    "a5_route_info",
    "stream router, info branch: equality filter (producer-from-ais-api.py:78)",
    Some("""SELECT event_id, user_id, event_type FROM events
            WHERE event_type = 'signup'"""),
    (s, dir) => Tables.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("event_type")))

  /** A6 — enum→string with default "NotReported" for unknown values
    * (producer-from-ais-api.py:41-45, 79-83). */
  val a6 = QueryDef(
    "a6_enum_default",
    "enum name extraction with NotReported default (producer-from-ais-api.py:41-45)",
    Some("""SELECT event_id,
                   CASE WHEN event_type IN ('click','view','purchase','signup')
                        THEN event_type ELSE 'NotReported' END AS status
            FROM events"""),
    (s, dir) => Tables.events(s, dir).select(
      col("event_id"),
      when(col("event_type").isin("click", "view", "purchase", "signup"),
        col("event_type")).otherwise("NotReported").as("status")))

  /** A7 — conjunctive data-quality range filter (producer-from-ais-api.py:54-61:
    * `speed > 2 and speed < 75 and lat <= 90 and lon <= 180 and heading < 360`). */
  val a7 = QueryDef(
    "a7_range_filter",
    "conjunctive range filter dropping erroneous rows (producer-from-ais-api.py:54-61)",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
            FROM lineitem
            WHERE l_quantity > 2 AND l_quantity < 75
              AND l_discount <= 0.08 AND l_tax < 0.36"""),
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 2 && col("l_quantity") < 75 &&
        col("l_discount") <= 0.08 && col("l_tax") < 0.36)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax")))

  /** A8 — projection + struct nest (producer-from-ais-api.py:62-69 builds
    * `location:{lat,lon}`), then flattened back for the hash-compare. */
  val a8 = QueryDef(
    "a8_nest_project",
    "struct nest + flatten roundtrip (producer-from-ais-api.py:62-69)",
    Some("SELECT event_id, user_id AS u, value AS v FROM events"),
    (s, dir) => Tables.events(s, dir)
      .select(col("event_id"),
        struct(col("user_id").as("u"), col("value").as("v")).as("m"))
      .select(col("event_id"), col("m.u").as("u"), col("m.v").as("v")))

  /** C2 — ingest-time epoch→timestamp cast (clickhouse-ddl.sql:6-19):
    * epoch seconds out, plus a formatted UTC day — never a raw timestamp, so
    * ns/µs precision can't skew the compare. */
  val c2 = QueryDef(
    "c2_epoch_cast",
    "epoch<->timestamp casts at ingest (clickhouse-ddl.sql:6-19)",
    Some("""SELECT event_id,
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
                   strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
            FROM events"""),
    (s, dir) => Tables.events(s, dir).select(
      col("event_id"),
      unix_timestamp(col("ts")).as("epoch_s"),
      date_format(col("ts"), "yyyy-MM-dd").as("day")))

  /** Latest-per-key — the explicit form of the reference's compacted info
    * topic (`cleanup.policy=compact`, README.md:199-200; SURVEY.md §7.5):
    * row_number over (key, time desc). At scale this is one shuffle on the
    * key + a per-partition sort — the canonical Spark latest-per-key plan.
    * Ties in ts (µs) are broken by event_id so both engines pick one row.
    */
  val latest = QueryDef(
    "latest_per_key",
    "latest record per key, topic-compaction analog (README.md:199-200)",
    Some("""SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS last_ts_us
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          unix_micros(col("ts")).as("last_ts_us"))
    })

  val defs: Seq[QueryDef] = Seq(a5pos, a5info, a6, a7, a8, c2, latest)
}
