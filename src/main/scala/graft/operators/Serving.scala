package graft.operators

import graft.QueryDef
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The reference's serving/dashboard query surface (SURVEY.md §2.D),
  * re-expressed over the driver's generic tables so every operator runs
  * against the DuckDB oracle.
  *
  * Mapping of the AIS domain onto the testdata star schema:
  *   - `events` plays the position/weather MV (`ship_pos_and_wx_mv`):
  *     `user_id` ~ mmsi, `value` ~ speed, `ts` ~ timestamp.
  *   - `orders` LEFT JOIN `customer` plays the D3 position⋈ship-info join
  *     (reference lib/console.py:45-51, sql/clickhouse-dml.sql:11-14).
  *
  * Scale notes (100 TB): D1/D2 are exact distinct counts — Catalyst plans them
  * as two-phase hash aggregates (partial per partition, final after a shuffle
  * on the group key), so they scale linearly with executors. D3 broadcasts the
  * dimension side (ship-info ≪ positions in the reference; customer ≪ orders
  * here), avoiding a shuffle of the fact table entirely.
  */
object Serving {

  /** D1 — exact count-distinct (console.py:34-37). */
  val d1 = QueryDef(
    "d1_distinct_ships",
    "select count(distinct mmsi) over the position stream (console.py:34-37)",
    Some("SELECT count(DISTINCT user_id) AS ship_count FROM events"),
    (s, dir) => Tables.events(s, dir).agg(countDistinct(col("user_id")).as("ship_count")))

  /** D2 — filtered count-distinct (console.py:39-42, `where speed > 10`). */
  val d2 = QueryDef(
    "d2_distinct_fast_ships",
    "filtered count(distinct mmsi) where speed > 10 (console.py:39-42)",
    Some("SELECT count(DISTINCT user_id) AS ship_count FROM events WHERE value > 10"),
    (s, dir) => Tables.events(s, dir)
      .filter(col("value") > 10)
      .agg(countDistinct(col("user_id")).as("ship_count")))

  /** D3 — left-outer equi-join + non-empty-name post-filter + projection
    * (console.py:45-51). CH fills unmatched strings with '' then `!= ''`
    * drops them; Spark yields NULL and `NULL != ''` filters — the same
    * observable inner-join-excluding-empty-names (SURVEY.md §7.5). The
    * dimension side is broadcast: no shuffle of the fact side.
    */
  val d3 = QueryDef(
    "d3_join_info",
    "left join fact->dim, filter dim name non-empty, project (console.py:45-51)",
    Some("""SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
            FROM orders o LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_name <> ''"""),
    (s, dir) => Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .filter(col("c_name") =!= "")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice")))

  /** D4 — LIMIT 600 (console.py:44-50). The reference's limit has no ORDER BY
    * and is nondeterministic (SURVEY.md §7.5); the judged variant totally
    * orders by the key first. Spark plans orderBy+limit as TakeOrderedAndProject
    * — a per-partition top-K plus a single-reduce merge, no global sort.
    */
  val d4 = QueryDef(
    "d4_join_limit",
    "D3 plus deterministic ORDER BY + LIMIT 600 (console.py:44-50)",
    Some("""SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
            FROM orders o LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_name <> '' ORDER BY o.o_orderkey LIMIT 600"""),
    (s, dir) => Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .filter(col("c_name") =!= "")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(600))

  /** D5 — mean over coordinates for the map center (console.py:59-60),
    * server-side instead of client-side pandas. */
  val d5 = QueryDef(
    "d5_center",
    "avg over the stream's numeric coords, map-center analog (console.py:59-60)",
    Some(s"""SELECT ${Num.sqlAvg("value", 6, 4)} AS avg_value,
                    ${Num.sql("avg(CAST(user_id AS DOUBLE))", 4)} AS avg_user
             FROM events"""),
    (s, dir) => Tables.events(s, dir).agg(
      Num.pavg(col("value"), 6, 4).as("avg_value"),
      Num.pround(avg(col("user_id").cast("double")), 4).as("avg_user")))

  /** D6 — min/max bounds for map fit_bounds (console.py:102-105). */
  val d6 = QueryDef(
    "d6_bounds",
    "min/max aggregates, map-bounds analog (console.py:102-105)",
    Some("""SELECT min(value) AS min_value, max(value) AS max_value,
                   CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))) AS BIGINT) AS min_ts,
                   CAST(floor(epoch(CAST(max(ts) AS TIMESTAMP))) AS BIGINT) AS max_ts
            FROM events"""),
    (s, dir) => Tables.events(s, dir).agg(
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"),
      unix_timestamp(min(col("ts"))).as("min_ts"),
      unix_timestamp(max(col("ts"))).as("max_ts")))

  /** D7 — row-wise scalar transforms: hemisphere suffix + tooltip string
    * interpolation (console.py:86-100), as pure Catalyst expressions. */
  val d7 = QueryDef(
    "d7_format_position",
    "per-row CASE + format_string tooltip interpolation (console.py:86-100)",
    Some("""SELECT event_id,
                   printf('%s@%.2f%s', event_type, value,
                          CASE WHEN value >= 100 THEN 'N' ELSE 'S' END) AS label
            FROM events"""),
    (s, dir) => Tables.events(s, dir).select(
      col("event_id"),
      format_string("%s@%.2f%s", col("event_type"), col("value"),
        when(col("value") >= 100, "N").otherwise("S")).as("label")))

  /** D8 — prefix-match dictionary lookup (console.py:62-98's icon_color_map):
    * first matching prefix wins, else default — a folded when-chain, fully
    * codegen'd, no UDF. */
  val d8 = QueryDef(
    "d8_type_color",
    "first-matching-prefix lookup with default (console.py:62-98)",
    Some("""SELECT p_partkey,
                   CASE WHEN p_type LIKE 'ECONOMY%' THEN 'green'
                        WHEN p_type LIKE 'LARGE%' THEN 'red'
                        WHEN p_type LIKE 'MEDIUM%' THEN 'orange'
                        WHEN p_type LIKE 'PROMO%' THEN 'blue'
                        WHEN p_type LIKE 'SMALL%' THEN 'purple'
                        ELSE 'lightgray' END AS color
            FROM part"""),
    (s, dir) => {
      // first-match-wins when-chain folded from the lookup map, in order
      val colorMap = Seq("ECONOMY" -> "green", "LARGE" -> "red",
        "MEDIUM" -> "orange", "PROMO" -> "blue", "SMALL" -> "purple")
      val colored = colorMap.tail.foldLeft(
        when(col("p_type").startsWith(colorMap.head._1), colorMap.head._2)) {
        case (w, (prefix, c)) => w.when(col("p_type").startsWith(prefix), c)
      }.otherwise("lightgray")
      Tables.part(s, dir).select(col("p_partkey"), colored.as("color"))
    })

  /** D9 — scalar extraction of a single aggregate for a metric tile
    * (console.py:107-112); D10's empty-guard is `df.isEmpty` on the same plan. */
  val d9 = QueryDef(
    "d9_scalar_count",
    "single-value aggregate for metric tiles (console.py:107-112)",
    Some("SELECT count(*) AS n FROM events"),
    (s, dir) => Tables.events(s, dir).agg(count(lit(1)).as("n")))

  val defs: Seq[QueryDef] = Seq(d1, d2, d3, d4, d5, d6, d7, d8, d9)
}
