package graft.operators

import graft.QueryDef
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The generic relational operator surface: aggregation pipelines, multi-way
  * joins, semi/anti joins, set operations, rollup/cube, window functions, and
  * event-time windows. SURVEY.md §2.E records that the reference itself has no
  * instances of these; they are part of the engine's query surface so a user
  * gets them "for free" from Catalyst — and they are the operators that matter
  * at 100 TB, so each one is written in its scale-correct form:
  *
  *   - dimension tables are `broadcast()` so fact tables never shuffle for
  *     the join (plan: BroadcastHashJoin, no Exchange on the big side);
  *   - aggregations are plain groupBy → two-phase hash agg with map-side
  *     partials; ORDER BY + LIMIT plans as TakeOrderedAndProject (per-
  *     partition top-K, single merge — no global sort);
  *   - window functions shuffle once on the partition key and sort within
  *     partitions only.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: the canonical scan→filter→wide-agg
    * pipeline. All derived doubles rounded on both sides (QueryDef rules). */
  val q1 = QueryDef(
    "q1_pricing_summary",
    "TPC-H Q1: filtered scan + grouped multi-aggregate",
    Some(s"""SELECT l_returnflag, l_linestatus,
                   ${Num.sqlSum("l_quantity", 6, 2)} AS sum_qty,
                   ${Num.sqlSum("l_extendedprice", 6, 2)} AS sum_base_price,
                   ${Num.sqlSum("l_extendedprice * (1 - l_discount)", 6, 2)} AS sum_disc_price,
                   ${Num.sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6, 2)} AS sum_charge,
                   ${Num.sqlAvg("l_quantity", 6, 4)} AS avg_qty,
                   ${Num.sqlAvg("l_extendedprice", 6, 4)} AS avg_price,
                   ${Num.sqlAvg("l_discount", 6, 4)} AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus"""),
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.psum(col("l_quantity"), 6, 2).as("sum_qty"),
        Num.psum(col("l_extendedprice"), 6, 2).as("sum_base_price"),
        Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2).as("sum_disc_price"),
        Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6, 2).as("sum_charge"),
        Num.pavg(col("l_quantity"), 6, 4).as("avg_qty"),
        Num.pavg(col("l_extendedprice"), 6, 4).as("avg_price"),
        Num.pavg(col("l_discount"), 6, 4).as("avg_disc"),
        count(lit(1)).as("count_order")))

  /** TPC-H Q3-shaped: selective 3-way join + grouped revenue + ordered top-K.
    * Ranking is on the *rounded* revenue with the key as tiebreak so both
    * engines order identically. */
  val q3 = QueryDef(
    "q3_top_revenue",
    "TPC-H Q3: 3-way join, group, deterministic top-10",
    Some(s"""SELECT o.o_orderkey,
                   ${Num.sqlSum("l.l_extendedprice * (1 - l.l_discount)", 6, 2)} AS revenue,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
    (s, dir) => Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1996-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10))

  /** TPC-H Q5-shaped: 6-way join. Only the FIXED-size dimensions (region,
    * nation) carry broadcast hints; supplier/customer/orders scale with the
    * data and a forced broadcast would OOM at 100 TB — AQE still picks
    * broadcast for them at small scale from runtime sizes. */
  val q5 = QueryDef(
    "q5_region_revenue",
    "TPC-H Q5: multi-way join, broadcast dims, revenue per nation",
    Some(s"""SELECT n.n_name,
                   ${Num.sqlSum("l.l_extendedprice * (1 - l.l_discount)", 6, 2)} AS revenue
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN supplier s ON s.s_nationkey = n.n_nationkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n.n_name
            ORDER BY revenue DESC, n_name"""),
    (s, dir) => {
      val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, dir)
      val supplier = Tables.supplier(s, dir)
      val customer = Tables.customer(s, dir)
      val orders = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val lineitem = Tables.lineitem(s, dir)
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey"))
        .join(customer,
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })

  /** Semi join — customers with at least one order (EXISTS). No payload from
    * the right side ever crosses the shuffle: left_semi. */
  val semi = QueryDef(
    "semi_join_customers",
    "left-semi join (EXISTS)",
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""),
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name")))

  /** Anti join — customers with no orders (NOT EXISTS). */
  val anti = QueryDef(
    "anti_join_customers",
    "left-anti join (NOT EXISTS)",
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""),
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name")))

  /** EXCEPT — customers who placed open but never finished orders. */
  val except = QueryDef(
    "setop_except",
    "EXCEPT (distinct) set difference",
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    })

  /** INTERSECT — customers with both open and finished orders. */
  val intersect = QueryDef(
    "setop_intersect",
    "INTERSECT (distinct) set intersection",
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    })

  /** ROLLUP — hierarchical subtotals region → nation → grand total. */
  val rollup_ = QueryDef(
    "rollup_region_acctbal",
    "GROUP BY ROLLUP(region, nation) over supplier balances",
    Some(s"""SELECT r.r_name, n.n_name, count(*) AS n_sup,
                   ${Num.sqlSum("s.s_acctbal", 6, 2)} AS acctbal
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP(r.r_name, n.n_name)"""),
    (s, dir) => Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_sup"), Num.psum(col("s_acctbal"), 6, 2).as("acctbal")))

  /** CUBE — all grouping combinations of status × priority. */
  val cube_ = QueryDef(
    "cube_status_priority",
    "GROUP BY CUBE(status, priority) over orders",
    Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   ${Num.sqlSum("o_totalprice", 6, 2)} AS total
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""),
    (s, dir) => Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Num.psum(col("o_totalprice"), 6, 2).as("total")))

  /** Running window aggregate — per-supplier running quantity in fully
    * deterministic frame order (shipdate, orderkey, linenumber). One shuffle
    * on l_suppkey, in-partition sort, no global sort. */
  val running = QueryDef(
    "window_running_sum",
    "running sum over a deterministic per-key frame",
    Some(s"""SELECT l_suppkey, l_orderkey, l_linenumber,
                   ${Num.sql("""sum(l_quantity) OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""", 2)} AS running_qty
            FROM lineitem"""),
    (s, dir) => {
      // (orderkey, linenumber) is NOT unique in this synthetic lineitem:
      // l_quantity joins the sort key so the order is total over the summed
      // value and the running sum is engine- and run-deterministic
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        Num.pround(sum(col("l_quantity")).over(w), 2).as("running_qty"))
    })

  /** Ranked top-N per group — top-3 parts by price per brand, tiebroken. */
  val rankTopN = QueryDef(
    "window_rank_topn",
    "row_number top-N per group",
    Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rn
              FROM part) WHERE rn <= 3"""),
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, dir)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    })

  /** Tumbling event-time window — the batch shape of the streaming hourly
    * aggregate (graft.streaming runs the same plan incrementally with a
    * watermark). Window start is emitted as epoch seconds. */
  val tumbling = QueryDef(
    "tumbling_hourly",
    "1-hour tumbling event-time window aggregate",
    Some(s"""SELECT CAST(floor(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS window_start,
                   event_type, count(*) AS n, ${Num.sqlSum("value", 6, 4)} AS sum_value
            FROM events GROUP BY 1, 2"""),
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.psum(col("value"), 6, 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value")))

  /** Sliding event-time window — 1 hour wide, 30-minute slide: every event
    * lands in exactly two windows. The oracle materializes the same two
    * window starts per row via unnest. */
  val sliding = QueryDef(
    "sliding_hourly",
    "1-hour sliding (30-min hop) event-time window aggregate",
    Some(s"""WITH e AS (
              SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800 AS b,
                     event_type, value
              FROM events)
            SELECT ws AS window_start, event_type, count(*) AS n,
                   ${Num.sqlSum("value", 6, 4)} AS sum_value
            FROM (SELECT unnest([b, b - 1800]) AS ws, event_type, value FROM e)
            GROUP BY ws, event_type"""),
    (s, dir) => Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.psum(col("value"), 6, 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value")))

  /** JSON extraction — parse the props payload (B3's transient-JSON analog,
    * consumer-...-weather.py:39-50) and aggregate on the extracted key. */
  val json = QueryDef(
    "json_props_agg",
    "JSON field extraction + aggregate (weather-parse analog, consumer:39-50)",
    Some("""SELECT CAST(json_extract_string(props, 'k') AS BIGINT) AS k,
                   count(*) AS n FROM events GROUP BY 1"""),
    (s, dir) => Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n")))

  /** Approximate distinct — HLL++ fast path for D1-style tiles. The raw HLL
    * estimate is engine-specific, so the oracled contract is the useful
    * invariant instead: the exact cardinality plus proof the estimate landed
    * within 2× the configured rsd (5% → 10% band; HLL++ at default precision
    * is typically ~1-2% off). DuckDB verifies the exact count and the bound
    * flag hash-exactly. */
  val approx = QueryDef(
    "approx_distinct_users",
    "approx_count_distinct (HLL++) fast-path variant of d1, error-bounded",
    Some("""SELECT count(DISTINCT user_id) AS exact_users,
                   true AS within_2rsd FROM events"""),
    (s, dir) => Tables.events(s, dir)
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.05).as("approx_users"))
      .select(col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.10).as("within_2rsd")))

  /** TPC-H Q4-shaped: EXISTS-driven semi join feeding an aggregate. */
  val q4 = QueryDef(
    "q4_order_priority",
    "TPC-H Q4: semi join (EXISTS with predicate) + grouped count",
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    })

  /** TPC-H Q6-shaped: the pure filter-aggregate revenue scan — the query
    * whose whole cost is how much of the scan the pushed filters skip. */
  val q6 = QueryDef(
    "q6_forecast_revenue",
    "TPC-H Q6: selective filter + single aggregate",
    Some(s"""SELECT ${Num.sqlSum("l_extendedprice * l_discount", 6, 2)} AS revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
               AND l_discount BETWEEN 0.03 AND 0.07
               AND l_quantity < 24"""),
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(Num.psum(col("l_extendedprice") * col("l_discount"), 6, 2).as("revenue")))

  /** TPC-H Q14-shaped: conditional aggregation ratio (promo revenue share). */
  val q14 = QueryDef(
    "q14_promo_share",
    "TPC-H Q14: conditional-aggregate ratio over a join",
    Some(s"""SELECT ${Num.sql(
               """100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount))""", 4)} AS promo_share
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"""),
    (s, dir) => {
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(Num.pround(
          lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(0))
            / sum(rev), 4).as("promo_share"))
    })

  /** UNPIVOT/melt — wide measures to long (measure, value) rows. */
  val unpivot_ = QueryDef(
    "unpivot_measures",
    "unpivot lineitem measures into long form",
    Some("""SELECT l_orderkey, l_linenumber, measure, value FROM (
              SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
                     l_quantity AS value FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)"""),
    (s, dir) => Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .withColumn("measure",
        expr("substring(measure, 3)"))) // strip the l_ prefix to match oracle names

  /** TPC-H Q19-shaped: disjunctive (OR-of-ANDs) join predicate — Catalyst
    * extracts the common `l_partkey = p_partkey` equi-condition so the join
    * still hashes, with the disjunction as a post-join filter; the common
    * conjuncts inside each branch (quantity bounds, brand prefixes) are
    * CNF-converted and pushed to the scans. */
  val q19 = QueryDef(
    "q19_disjunctive_join",
    "TPC-H Q19: OR-of-ANDs join predicate, revenue sum",
    Some(s"""SELECT ${Num.sqlSum("l_extendedprice * (1 - l_discount)", 6, 2)} AS revenue
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                    AND l.l_quantity >= 1 AND l.l_quantity <= 20)
                OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
                    AND l.l_quantity >= 10 AND l.l_quantity <= 40)"""),
    (s, dir) => {
      val cond1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity") >= 1 && col("l_quantity") <= 20
      val cond2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 30) &&
        col("l_quantity") >= 10 && col("l_quantity") <= 40
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .filter(cond1 || cond2)
        .agg(Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2)
          .as("revenue"))
    })

  /** TPC-H Q7-shaped: bidirectional nation-pair volume. The two nation joins
    * broadcast; the disjunctive pair filter runs after both bind. */
  val q7 = QueryDef(
    "q7_nation_volume",
    "TPC-H Q7: supplier/customer nation pair volume by year",
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    year(l.l_shipdate) AS l_year,
                    ${Num.sqlSum("l.l_extendedprice * (1 - l.l_discount)", 6, 2)} AS volume
             FROM supplier s
             JOIN lineitem l ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
                OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
             GROUP BY 1, 2, 3"""),
    (s, dir) => {
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("nk1"),
        col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("nk2"),
        col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("nk1"))
        .join(broadcast(n2), col("c_nationkey") === col("nk2"))
        .filter(col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19" ||
          col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18")
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2)
          .as("volume"))
    })

  /** TPC-H Q10-shaped: returned-item revenue per customer, ordered top-20. */
  val q10 = QueryDef(
    "q10_returned_items",
    "TPC-H Q10: 4-way join on returned items, grouped revenue, top-20",
    Some(s"""SELECT c.c_custkey, c.c_name, n.n_name,
                    ${Num.sqlSum("l.l_extendedprice * (1 - l.l_discount)", 6, 2)} AS revenue
             FROM customer c
             JOIN orders o ON c.c_custkey = o.o_custkey
             JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             JOIN nation n ON c.c_nationkey = n.n_nationkey
             WHERE l.l_returnflag = 'R'
               AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             GROUP BY 1, 2, 3
             ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    (s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Num.psum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20))

  /** TPC-H Q18-shaped: large orders found by an aggregate-driven semi join —
    * the HAVING subquery becomes a grouped filter joined back to the facts. */
  val q18 = QueryDef(
    "q18_large_orders",
    "TPC-H Q18: HAVING-subquery semi join, per-order quantity totals",
    Some(s"""SELECT c.c_name, o.o_orderkey,
                    ${Num.sql("o.o_totalprice", 2)} AS totalprice,
                    ${Num.sqlSum("l.l_quantity", 6, 2)} AS total_qty
             FROM customer c
             JOIN orders o ON c.c_custkey = o.o_custkey
             JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                                    GROUP BY l_orderkey
                                    HAVING sum(l_quantity) > 250)
             GROUP BY 1, 2, 3
             ORDER BY totalprice DESC, o_orderkey LIMIT 100"""),
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val big = l.groupBy(col("l_orderkey").as("big_orderkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 250)
        .select(col("big_orderkey"))
      l.join(big, col("l_orderkey") === col("big_orderkey"), "left_semi")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("o_orderkey"),
          Num.pround(col("o_totalprice"), 2).as("totalprice"))
        .agg(Num.psum(col("l_quantity"), 6, 2).as("total_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(100)
    })

  /** TPC-H Q17-shaped: correlated per-group average subquery, decorrelated
    * into an aggregate join (the rewrite Catalyst applies to the SQL form;
    * here declared directly). Safe for exact comparison: quantities are
    * small integers, so per-part sums are exact doubles and the 0.5*avg
    * threshold is bit-identical in both engines regardless of sum order. */
  val q17 = QueryDef(
    "q17_small_quantity",
    "TPC-H Q17: correlated avg-quantity subquery via aggregate join",
    Some(s"""SELECT ${Num.sql(s"${Num.sqlDsum("l.l_extendedprice", 6)} / 7.0", 2)} AS avg_yearly
             FROM lineitem l
             JOIN part p ON p.p_partkey = l.l_partkey
             JOIN (SELECT l_partkey AS a_partkey, 0.5 * avg(l_quantity) AS half_avg
                   FROM lineitem GROUP BY 1) a ON a.a_partkey = l.l_partkey
             WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.half_avg"""),
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val halfAvg = l.groupBy(col("l_partkey").as("a_partkey"))
        .agg((lit(0.5) * avg(col("l_quantity"))).as("half_avg"))
      l.join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#1")
          .select(col("p_partkey"))),
          col("p_partkey") === col("l_partkey"))
        .join(halfAvg, col("a_partkey") === col("l_partkey"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg(Num.pround(Num.dsum(col("l_extendedprice"), 6) / 7.0, 2).as("avg_yearly"))
    })

  /** Approximate percentile with the same oracled contract as
    * approx_distinct_users: the exact median plus proof the sketch landed
    * inside the exact p45-p55 rank band (approx_percentile's guarantee is a
    * rank bound, so the band is the honest assertion). */
  val approxPct = QueryDef(
    "approx_percentile_value",
    "approx_percentile of event value, rank-band-bounded against exact",
    Some(s"""SELECT ${Num.sql("quantile_cont(value, 0.5)", 4)} AS exact_median,
                    true AS within_rank_band
             FROM events"""),
    (s, dir) => Tables.events(s, dir)
      .agg(
        Num.pround(expr("percentile(value, 0.5)"), 4).as("exact_median"),
        expr("approx_percentile(value, 0.5, 10000)").as("ap"),
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"))
      .select(col("exact_median"),
        (col("ap") >= col("p45") && col("ap") <= col("p55"))
          .as("within_rank_band")))

  /** FULL OUTER join — the one join type the surface lacked: daily purchase
    * activity against daily error activity per user. Day granularity keeps
    * the key sparse so genuine left-only and right-only rows exist; keys
    * coalesce across sides. */
  val fullOuter = QueryDef(
    "full_outer_activity",
    "full outer join of per-user-day purchase and error counts",
    Some("""WITH p AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                              count(*) AS n_purchases
                       FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
                 e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                              count(*) AS n_errors
                       FROM events WHERE event_type = 'error' GROUP BY 1, 2)
            SELECT COALESCE(p.user_id, e.user_id) AS user_id,
                   COALESCE(p.day, e.day) AS day,
                   COALESCE(p.n_purchases, 0) AS n_purchases,
                   COALESCE(e.n_errors, 0) AS n_errors
            FROM p FULL OUTER JOIN e
              ON p.user_id = e.user_id AND p.day = e.day"""),
    (s, dir) => {
      def daily(tpe: String, out: String) = Tables.events(s, dir)
        .filter(col("event_type") === tpe)
        .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as(out))
      daily("purchase", "n_purchases").as("p")
        .join(daily("error", "n_errors").as("e"),
          col("p.user_id") === col("e.user_id") && col("p.day") === col("e.day"),
          "full_outer")
        .select(
          coalesce(col("p.user_id"), col("e.user_id")).as("user_id"),
          coalesce(col("p.day"), col("e.day")).as("day"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"))
    })

  /** RANGE window frame: trailing-hour sum per user — the frame bound is a
    * value offset (epoch micros), not a row count, so peers at equal
    * timestamps aggregate identically under any partitioning. */
  val rangeFrame = QueryDef(
    "window_range_frame",
    "trailing-1-hour RANGE-frame sum of value per user",
    Some(s"""SELECT event_id,
                    ${Num.sql("""sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""", 4)} AS trailing_1h
             FROM events"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"),
          Num.pround(sum(col("value")).over(w), 4).as("trailing_1h"))
    })

  /** lag/lead deltas — the per-key sequential derivative, one shuffle. */
  val lagLead = QueryDef(
    "window_lag_lead",
    "per-user lag/lead value deltas over event time",
    Some(s"""SELECT event_id,
                    ${Num.sql("value - lag(value) OVER w", 4)} AS delta_prev,
                    ${Num.sql("lead(value) OVER w - value", 4)} AS delta_next
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      Tables.events(s, dir).select(col("event_id"),
        Num.pround(col("value") - lag(col("value"), 1).over(w), 4).as("delta_prev"),
        Num.pround(lead(col("value"), 1).over(w) - col("value"), 4).as("delta_next"))
    })

  /** ntile + first/last_value — distribution bucketing and per-key bounds in
    * one windowed pass. */
  val ntileBounds = QueryDef(
    "window_ntile_bounds",
    "value deciles per event type + first/last value per user",
    Some(s"""SELECT event_id,
                    ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile,
                    ${Num.sql("""first_value(value) OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""", 4)} AS first_v,
                    ${Num.sql("""last_value(value) OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""", 4)} AS last_v
             FROM events"""),
    (s, dir) => {
      val wt = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir).select(col("event_id"),
        ntile(10).over(wt).cast("long").as("decile"),
        Num.pround(first(col("value")).over(wu), 4).as("first_v"),
        Num.pround(last(col("value")).over(wu), 4).as("last_v"))
    })

  /** percent_rank + cume_dist — relative-position window functions; the
    * ORDER BY is total (balance, custkey) so both are engine-deterministic
    * exact integer ratios. */
  val pctRank = QueryDef(
    "window_percent_rank",
    "percent_rank + cume_dist of account balance within nation",
    Some(s"""SELECT c_custkey,
                    ${Num.sql("percent_rank() OVER w", 6)} AS pct_rank,
                    ${Num.sql("cume_dist() OVER w", 6)} AS cdist
             FROM customer
             WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)"""),
    (s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir).select(col("c_custkey"),
        Num.pround(percent_rank().over(w), 6).as("pct_rank"),
        Num.pround(cume_dist().over(w), 6).as("cdist"))
    })

  /** Running DISTINCT-user count per event type — a windowed countDistinct,
    * which Spark's window functions don't support natively. The standard
    * rewrite: mark each (type, user)'s FIRST occurrence with a per-pair
    * row_number, then a running sum of markers over the type's timeline.
    * Two window passes; the second reuses the first's type partitioning
    * (one exchange on event_type after the (type, user) pass). */
  val runningDistinct = QueryDef(
    "window_distinct_running",
    "running distinct-user count per event type (first-occurrence markers)",
    Some("""WITH m AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                              event_id,
                              CASE WHEN row_number() OVER (
                                  PARTITION BY event_type, user_id
                                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) = 1
                                THEN 1 ELSE 0 END AS first_seen
                       FROM events)
            SELECT event_type, ts_us, event_id,
                   CAST(sum(first_seen) OVER (PARTITION BY event_type
                     ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS distinct_users_so_far
            FROM m"""),
    (s, dir) => {
      val perPair = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val timeline = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("user_id"))
        .withColumn("first_seen",
          when(row_number().over(perPair) === 1, 1).otherwise(0))
        .select(col("event_type"), col("ts_us"), col("event_id"),
          sum(col("first_seen")).over(timeline).as("distinct_users_so_far"))
    })

  /** Moving median — a 7-row trailing exact-percentile window per type, the
    * robust time-series smoother (median, not mean, so single spikes don't
    * drag the trend). Both engines share the interpolated-percentile
    * definition; the frame order is total (ts, event_id), so the window
    * content — and therefore the exact median — is engine-identical. One
    * shuffle on event_type, in-partition sort, frame of constant size. */
  val movingMedian = QueryDef(
    "window_moving_median",
    "7-row trailing moving median of value per event type",
    Some(s"""SELECT event_id,
                    ${Num.sql("""quantile_cont(value, 0.5) OVER (
                      PARTITION BY event_type
                      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""", 4)} AS med7
             FROM events"""),
    (s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .select(col("event_id"),
          Num.pround(expr("percentile(value, 0.5)")
            .over(w), 4).as("med7"))
    })

  val defs: Seq[QueryDef] = Seq(q1, q3, q4, q5, q6, q7, q10, q14, q17, q18,
    q19, semi, anti, fullOuter, except, intersect, rollup_, cube_, running,
    rankTopN, tumbling, sliding, json, approx, approxPct, unpivot_, rangeFrame,
    lagLead, ntileBounds, pctRank, runningDistinct, movingMedian)
}
