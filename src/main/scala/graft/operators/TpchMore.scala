package graft.operators

import graft.QueryDef
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The second tranche of TPC-H-shaped pipelines (Q2, Q8, Q9, Q11, Q12, Q13,
  * Q15, Q16, Q20, Q21, Q22), completing all 22 classic decision-support
  * operator shapes: min-cost-supplier correlated subquery, market-share
  * ratios, profit expressions over many-way joins, scalar-subquery
  * thresholds, conditional counts, left-outer distribution histograms,
  * view + max selection, distinct-count grouping with anti-join exclusion,
  * nested dominant-share semi joins, sole-late-supplier decorrelation, and
  * anti-join prospect detection.
  *
  * The driver's synthetic schema has no partsupp, l_commitdate/receiptdate,
  * l_shipmode, o_comment, or c_phone, so queries referencing those are
  * re-expressed over available columns keeping the operator SHAPE (the thing
  * being tested) intact; each doc notes the substitution.
  *
  * Scale notes (100 TB): only fixed-cardinality dims (nation, region) and
  * hard-filtered part subsets carry broadcast hints; supplier/customer/orders
  * key sets stay unhinted so AQE decides from runtime sizes. Correlated
  * EXISTS/NOT-EXISTS shapes are decorrelated into one extra aggregation over
  * the fact table — a single shuffle instead of a per-row probe.
  */
object TpchMore {

  private def ts(s: String) = lit(s).cast("timestamp")
  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Q2: cheapest European supplier per small ECONOMY part. partsupp is
    * emulated as min(l_extendedprice / l_quantity) per (part, supplier) from
    * lineitem (this schema has no partsupp table); Q2's correlated min-cost
    * subquery is decorrelated into a window min over the part key — one pass
    * over the already-joined rows instead of a per-row probe. The cost
    * equality filter compares RAW doubles (min is a comparison, not
    * arithmetic, so both engines pick the identical IEEE value); rounding
    * happens only at output. */
  val q2 = QueryDef(
    "q2_min_cost_supplier",
    "TPC-H Q2: cheapest EUROPE supplier per small ECONOMY part",
    Some(s"""WITH ps AS (SELECT l_partkey, l_suppkey,
                    min(l_extendedprice / l_quantity) AS cost
                  FROM lineitem GROUP BY 1, 2),
             eu AS (SELECT ps.l_partkey, ps.cost, s.s_name, s.s_acctbal,
                           n.n_name, p.p_partkey, p.p_type
                    FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey
                    JOIN nation n ON n.n_nationkey = s.s_nationkey
                    JOIN region r ON r.r_regionkey = n.n_regionkey
                    JOIN part p ON p.p_partkey = ps.l_partkey
                    WHERE r.r_name = 'EUROPE'
                      AND p.p_type = 'ECONOMY' AND p.p_size <= 10),
             m AS (SELECT *, min(cost) OVER (PARTITION BY l_partkey) AS min_cost
                   FROM eu)
             SELECT p_partkey, p_type, s_name, n_name,
                    ${Num.sql("s_acctbal", 2)} AS s_acctbal,
                    ${Num.sql("cost", 2)} AS ps_supplycost
             FROM m WHERE cost = min_cost"""),
    (s, dir) => {
      val ps = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val eu = ps
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_type") === "ECONOMY" && col("p_size") <= 10)),
          col("l_partkey") === col("p_partkey"))
      eu.withColumn("min_cost",
          min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("cost") === col("min_cost"))
        .select(col("p_partkey"), col("p_type"), col("s_name"), col("n_name"),
          Num.pround(col("s_acctbal"), 2).as("s_acctbal"),
          Num.pround(col("cost"), 2).as("ps_supplycost"))
    })

  /** Q8: a nation's share of a region's market for one part type, by order
    * year. The share is a conditional-sum ratio (q14's pattern) over a 7-way
    * join. */
  val q8 = QueryDef(
    "q8_market_share",
    "TPC-H Q8: NATION_18 share of ASIA ECONOMY-part volume by year",
    Some(s"""SELECT year(o.o_orderdate) AS o_year,
                    ${Num.sql(s"""${Num.sqlDsum("""CASE WHEN n2.n_name = 'NATION_18'
                        THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END""", 6)}
                      / ${Num.sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 6)}""", 4)} AS mkt_share
             FROM part p
             JOIN lineitem l ON p.p_partkey = l.l_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
             JOIN region r ON n1.n_regionkey = r.r_regionkey
             JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
             WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
             GROUP BY 1"""),
    (s, dir) => {
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("nk1"),
        col("n_regionkey"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("nk2"),
        col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("nk1"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("nk2"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(Num.pround(
          sum(when(col("supp_nation") === "NATION_18", revenue).otherwise(0))
            / sum(revenue), 4).as("mkt_share"))
    })

  /** Q9: per-nation, per-year product profit. The schema has no partsupp, so
    * unit cost is proxied by 0.6 * p_retailprice — the expression shape
    * (revenue minus quantity-scaled cost summed over a 5-way join) is Q9's. */
  val q9 = QueryDef(
    "q9_product_profit",
    "TPC-H Q9: widget-part profit by supplier nation and year (retailprice cost proxy)",
    Some(s"""SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
                    ${Num.sqlSum("""l.l_extendedprice * (1 - l.l_discount)
                       - 0.6 * p.p_retailprice * l.l_quantity""", 6, 2)} AS profit
             FROM lineitem l
             JOIN part p ON p.p_partkey = l.l_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN nation n ON s.s_nationkey = n.n_nationkey
             WHERE p.p_name LIKE '%widget%'
             GROUP BY 1, 2"""),
    (s, dir) => Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(Num.psum(
        revenue - lit(0.6) * col("p_retailprice") * col("l_quantity"), 6, 2)
        .as("profit")))

  /** Q11: "important" parts — per-part shipped value above a scalar-subquery
    * threshold (1.2 x the average per-part value; the original's fixed
    * fraction of the grand total doesn't scale across SFs). */
  val q11 = QueryDef(
    "q11_important_parts",
    "TPC-H Q11: parts whose shipped value exceeds 1.2x the per-part average",
    Some(s"""WITH pv AS (SELECT l_partkey, ${Num.sqlDsum("l_extendedprice", 6)} AS v
                         FROM lineitem GROUP BY 1)
             SELECT l_partkey, ${Num.sql("v", 2)} AS value FROM pv
             WHERE v > (SELECT 1.2 * (${Num.sqlDsum("v", 2)} / count(*)) FROM pv)"""),
    (s, dir) => {
      // cached: two consumers (threshold scalar + the filtered output) —
      // uncached, the per-part decimal aggregation over lineitem runs twice
      // (r10 idle bench caught the 2x after the decimal-sum conversion)
      val pv = Tables.lineitem(s, dir).groupBy(col("l_partkey"))
        .agg(Num.dsum(col("l_extendedprice"), 6).as("v"))
        .cache()
      pv.join(broadcast(pv.agg((lit(1.2) *
          (Num.dsum(col("v"), 2) / count(lit(1)))).as("thresh"))))
        .filter(col("v") > col("thresh"))
        .select(col("l_partkey"), Num.pround(col("v"), 2).as("value"))
    })

  /** Q12: late-shipment counts split by order priority. No l_shipmode /
    * commit/receipt dates here: "late" is shipdate > orderdate + 90 days and
    * the grouping key is l_linestatus — the conditional two-count shape is
    * Q12's. */
  val q12 = QueryDef(
    "q12_late_lines",
    "TPC-H Q12: high/low-priority late-line counts by line status",
    Some("""SELECT l.l_linestatus,
                   count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 END) AS high_line_count,
                   count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                              THEN 1 END) AS low_line_count
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            GROUP BY 1"""),
    (s, dir) => {
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(count(when(isHigh, 1)).as("high_line_count"),
          count(when(!isHigh, 1)).as("low_line_count"))
    })

  /** Q13: customer order-count distribution INCLUDING zero-order customers —
    * the left-outer-join-with-filtered-right + double-aggregation shape (the
    * o_comment exclusion becomes a priority exclusion). */
  val q13 = QueryDef(
    "q13_custdist",
    "TPC-H Q13: distribution of per-customer order counts (left outer)",
    Some("""SELECT c_count, count(*) AS custdist FROM (
              SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o
                ON c.c_custkey = o.o_custkey
                AND o.o_orderpriority <> '1-URGENT'
              GROUP BY 1)
            GROUP BY 1"""),
    (s, dir) => Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist")))

  /** Q15: top supplier by quarterly revenue — the revenue "view" + scalar max
    * selection. Both engines compare on the ROUNDED revenue so max ties are
    * engine-stable. */
  val q15 = QueryDef(
    "q15_top_supplier",
    "TPC-H Q15: supplier(s) with maximum quarterly revenue (view + scalar max)",
    Some(s"""WITH rev AS (
               SELECT l_suppkey AS supplier_no,
                      ${Num.sqlSum("l_extendedprice * (1 - l_discount)", 6, 2)} AS total_revenue
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
               GROUP BY 1)
             SELECT s.s_suppkey, s.s_name, r.total_revenue
             FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
             WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)"""),
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1996-04-01 00:00:00"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(Num.psum(revenue, 6, 2).as("total_revenue"))
      rev.join(broadcast(rev.agg(max(col("total_revenue")).as("max_rev"))))
        .filter(col("total_revenue") === col("max_rev"))
        .join(Tables.supplier(s, dir), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    })

  /** Q16: distinct supplier count per part attribute group, with an
    * anti-join supplier exclusion (negative balance standing in for the
    * original's complaint-comment filter) — lineitem is the part-supplier
    * relation in this schema. The oracle is spelled NOT EXISTS so both sides
    * share left_anti's null semantics by construction (NOT IN would empty
    * the result on a single NULL s_suppkey). */
  val q16 = QueryDef(
    "q16_supplier_cnt",
    "TPC-H Q16: supplier count by part brand/type/size with anti-join exclusion",
    Some("""SELECT p.p_brand, p.p_type, p.p_size,
                   count(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand <> 'Brand#1'
              AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
              AND NOT EXISTS
                (SELECT 1 FROM supplier s WHERE s.s_acctbal < 0
                   AND s.s_suppkey = l.l_suppkey)
            GROUP BY 1, 2, 3"""),
    (s, dir) => Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")))

  /** Q20: suppliers dominating supply of a part-name class — shipped share
    * replaces partsupp availability; quantities are integral so both share
    * sides are exact and the 0.15 threshold compares identically in both
    * engines. */
  val q20 = QueryDef(
    "q20_dominant_suppliers",
    "TPC-H Q20: suppliers shipping >15% of any small-part total (nested semi join)",
    Some("""WITH pq AS (SELECT l_partkey, sum(l_quantity) AS tot
                        FROM lineitem GROUP BY 1),
                 sp AS (SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS sq
                        FROM lineitem l JOIN part p
                          ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'small%'
                        GROUP BY 1, 2)
            SELECT s.s_suppkey, s.s_name FROM supplier s
            WHERE s.s_suppkey IN (SELECT sp.l_suppkey FROM sp
                                  JOIN pq ON pq.l_partkey = sp.l_partkey
                                  WHERE sp.sq > 0.15 * pq.tot)"""),
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val pq = l.groupBy(col("l_partkey").as("pq_partkey"))
        .agg(sum(col("l_quantity")).as("tot"))
      val sp = l.join(broadcast(Tables.part(s, dir)
          .filter(col("p_name").startsWith("small")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("sq"))
      val dominant = sp.join(pq, col("l_partkey") === col("pq_partkey"))
        .filter(col("sq") > lit(0.15) * col("tot"))
        .select(col("l_suppkey"))
      Tables.supplier(s, dir)
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    })

  /** Q21: suppliers who were the SOLE late supplier on a multi-supplier
    * finished order. The original's correlated EXISTS / NOT-EXISTS pair is
    * decorrelated into one per-order aggregate (distinct suppliers, distinct
    * late suppliers) joined back — one extra shuffle instead of two per-row
    * probes; "late" is shipdate > orderdate + 60 days. */
  val q21 = QueryDef(
    "q21_sole_late_supplier",
    "TPC-H Q21: per-supplier count of orders it alone delayed",
    Some("""WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END AS late
                 FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
                 WHERE o.o_orderstatus = 'F'),
                 st AS (SELECT l_orderkey,
                               count(DISTINCT l_suppkey) AS ns,
                               count(DISTINCT CASE WHEN late = 1
                                 THEN l_suppkey END) AS nl
                        FROM lo GROUP BY 1)
            SELECT s.s_name, count(*) AS numwait
            FROM lo JOIN st ON st.l_orderkey = lo.l_orderkey
            JOIN supplier s ON s.s_suppkey = lo.l_suppkey
            WHERE lo.late = 1 AND st.ns > 1 AND st.nl = 1
            GROUP BY 1"""),
    (s, dir) => {
      // single-pass shape: pre-aggregate to (order, supplier) grain — the
      // countDistinct pair becomes count/sum over that grain computed by a
      // window sharing one orderkey partitioning, so the fact join is
      // scanned ONCE and no EXPAND doubles the shuffle (the naive
      // two-countDistinct form re-joined lineitem x orders per branch)
      val lo = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
            .otherwise(0).as("late"))
      val sup = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("any_late"),
          sum(col("late")).cast("long").as("n_late_lines"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
      sup
        .withColumn("ns", count(lit(1)).over(w))
        .withColumn("nl", sum(col("any_late")).over(w))
        .filter(col("any_late") === 1 && col("ns") > 1 && col("nl") === 1)
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late_lines")).as("numwait"))
    })

  /** Q22: dormant high-balance customers by country — the phone-prefix
    * country code becomes c_nationkey, and "never ordered" becomes "no order
    * since 1999" (this synthetic data has no order-less customers). Scalar
    * subquery average + anti join + grouped balance total, Q22's shape. */
  val q22 = QueryDef(
    "q22_idle_customers",
    "TPC-H Q22: high-balance customers idle since 1999, by nation",
    Some(s"""SELECT c.c_nationkey AS cntry, count(*) AS numcust,
                    ${Num.sqlSum("c.c_acctbal", 6, 2)} AS totacctbal
             FROM customer c
             WHERE c.c_acctbal > (SELECT ${Num.sqlDsum("c_acctbal", 2)} / count(*) FROM customer
                                  WHERE c_acctbal > 0)
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
             GROUP BY 1"""),
    (s, dir) => {
      val c = Tables.customer(s, dir)
      c.join(broadcast(c.filter(col("c_acctbal") > 0)
          .agg((Num.dsum(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          Num.psum(col("c_acctbal"), 6, 2).as("totacctbal"))
    })

  val defs: Seq[QueryDef] =
    Seq(q2, q8, q9, q11, q12, q13, q15, q16, q20, q21, q22)
}
