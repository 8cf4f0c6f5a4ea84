package graft.operators

import graft.QueryDef
import graft.functions.{Num, ZValue}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: the table-evolution shapes a serving
  * store needs once it outgrows the reference's append-only `ENGINE = Memory`
  * materialized views (sql/clickhouse-ddl.sql:33,62 — unbounded append, no
  * dedup, no ordering key). Each is the standard incremental-maintenance
  * pattern expressed as one declarative Spark plan:
  *
  *   - SCD type-2 history: compress an append-only event log into
  *     validity intervals (change-data-capture of `status` per key);
  *   - MERGE / upsert: latest-wins reconciliation of an update batch into a
  *     base snapshot (what a compacted Kafka topic, README.md:199-200, does
  *     implicitly — here as an auditable batch operator);
  *   - Markov transition matrix: next-event behavior model over per-key
  *     ordered sequences (training-data feature + product analytics);
  *   - Z-order layout key: multi-dimensional clustering via the native
  *     [[graft.functions.ZValue]] Morton expression, the data-skipping
  *     layout primitive for 100 TB serving tables.
  *
  * Shuffle profile: every operator here is one hash shuffle by the entity key
  * (user_id) followed by window passes that REUSE that partitioning — Catalyst
  * plans a single Exchange; the transition matrix adds one tiny groupBy whose
  * output is 5x5 rows.
  */
object Warehouse {

  /** Events of one user ordered by time; event_id breaks timestamp ties so
    * every window below is a total order (the (ts, event_id) pair is unique). */
  private def byTime = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** SCD type-2: per-user `event_type` history compressed to change intervals
    * [valid_from, valid_to); open intervals carry NULL valid_to. Two window
    * passes over ONE partitioning: lag() marks change rows, lead() over the
    * surviving rows closes each interval. */
  val scd2 = QueryDef(
    "scd2_status_intervals",
    "SCD type-2 validity intervals from the event log (CDC history table)",
    Some("""WITH e AS (SELECT user_id, event_type,
                              epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
                       FROM events),
             c AS (SELECT *, lag(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
                   FROM e),
             ch AS (SELECT user_id, event_type, ts_us, event_id FROM c
                    WHERE prev IS NULL OR prev <> event_type)
             SELECT user_id, event_type AS status, ts_us AS valid_from_us,
                    lead(ts_us) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id) AS valid_to_us
             FROM ch"""),
    (s, dir) => {
      val changed = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changed.select(col("user_id"), col("event_type").as("status"),
        col("ts_us").as("valid_from_us"),
        lead(col("ts_us"), 1).over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))).as("valid_to_us"))
    })

  /** MERGE (upsert): reconcile an update batch into a base snapshot,
    * latest-wins. The batches are deterministic slices of the log (update
    * batch = event_id divisible by 3), each compacted to its own
    * latest-per-key state; a full-outer join then implements the three MERGE
    * arms — matched (update wins), not-matched-by-target (insert), and
    * not-matched-by-source (keep). At scale both compactions and the join
    * share one hash partitioning on the key. */
  val merge = QueryDef(
    "merge_upsert_state",
    "latest-wins MERGE of an update batch into a base snapshot (3 arms)",
    Some("""WITH e AS (SELECT user_id, value, event_id,
                              epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
                       FROM events),
             base AS (SELECT user_id, value FROM
                        (SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY ts_us DESC, event_id DESC) AS rn
                         FROM e WHERE event_id % 3 <> 0) WHERE rn = 1),
             upd AS (SELECT user_id, value FROM
                       (SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY ts_us DESC, event_id DESC) AS rn
                        FROM e WHERE event_id % 3 = 0) WHERE rn = 1)
             SELECT coalesce(b.user_id, u.user_id) AS user_id,
                    coalesce(u.value, b.value) AS value,
                    CASE WHEN b.user_id IS NULL THEN 'insert'
                         WHEN u.user_id IS NULL THEN 'keep'
                         ELSE 'update' END AS action
             FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id"""),
    (s, dir) => {
      def latest(df: DataFrame) = df
        .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("value"))
      val e = Tables.events(s, dir)
      val base = latest(e.filter(col("event_id") % 3 =!= 0))
        .withColumnRenamed("user_id", "b_user").withColumnRenamed("value", "b_value")
      val upd = latest(e.filter(col("event_id") % 3 === 0))
        .withColumnRenamed("user_id", "u_user").withColumnRenamed("value", "u_value")
      base.join(upd, col("b_user") === col("u_user"), "full_outer")
        .select(coalesce(col("b_user"), col("u_user")).as("user_id"),
          coalesce(col("u_value"), col("b_value")).as("value"),
          when(col("b_user").isNull, "insert")
            .when(col("u_user").isNull, "keep")
            .otherwise("update").as("action"))
    })

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current) with counts. lead() pairs consecutive
    * events on the per-user time order; the 5x5 transition table aggregates
    * map-side. Integer count over integer total is ONE IEEE division, so the
    * probability is engine-exact before the display rounding. */
  val markov = QueryDef(
    "markov_transitions",
    "next-event Markov transition matrix P(next | current) over user sequences",
    Some(s"""WITH e AS (SELECT user_id, event_type,
                               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
                        FROM events),
              pairs AS (SELECT event_type AS cur,
                               lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS nxt
                        FROM e),
              t AS (SELECT cur, nxt, count(*) AS n FROM pairs
                    WHERE nxt IS NOT NULL GROUP BY 1, 2)
              SELECT cur, nxt, n,
                     ${Num.sql("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur)", 4)} AS p
              FROM t"""),
    (s, dir) => {
      val t = Tables.events(s, dir)
        .select(col("event_type").as("cur"),
          lead(col("event_type"), 1).over(byTime).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      t.select(col("cur"), col("nxt"), col("n"),
        Num.pround(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("cur"))), 4).as("p"))
    })

  /** Z-order clustering key over (user_id, value-in-cents): the layout column
    * a 100 TB serving table range-partitions by so min/max file stats prune
    * on either dimension. The key itself is the native codegen'd
    * [[graft.functions.ZValue]]; cents = floor(value*100) is the same IEEE
    * multiply+floor in both engines. */
  val zorder = QueryDef(
    "zorder_key_events",
    "Morton Z-order clustering key over (user_id, value cents) via native expr",
    Some(s"""SELECT event_id, (user_id & 65535) AS x,
                    (CAST(floor(value * 100) AS BIGINT) & 65535) AS y,
                    ${ZValue.zvalueSql("user_id", "CAST(floor(value * 100) AS BIGINT)")} AS z
             FROM events"""),
    (s, dir) => {
      val y = floor(col("value") * 100).cast("long")
      Tables.events(s, dir)
        .select(col("event_id"),
          col("user_id").bitwiseAND(65535).as("x"),
          y.bitwiseAND(65535).as("y"),
          ZValue.zvalue(col("user_id"), y).as("z"))
    })

  /** ANALYZE-style column statistics — the CBO/data-skipping inputs a
    * warehouse collects per column: row count, null count, exact NDV, min,
    * max. One aggregation pass PER COLUMN, each scanning only that column
    * (parquet column pruning makes the per-column pass the cheap, restartable
    * unit — the alternative, several countDistincts in one aggregate, plans
    * an Expand that multiplies the scanned rows by the column count). Exact
    * NDV here; the approximate path at 100 TB is `approx_distinct_users`'s
    * HLL sketch, one pass for all columns. */
  val tableStats = QueryDef(
    "table_stats",
    "per-column ANALYZE stats (count, nulls, ndv, min, max) for lineitem measures",
    Some(Seq("l_quantity", "l_extendedprice", "l_discount").map(c =>
      s"""SELECT '$c' AS column_name, count($c) AS n,
                 count(*) - count($c) AS n_null,
                 count(DISTINCT $c) AS ndv,
                 ${Num.sql(s"min($c)", 4)} AS min_v,
                 ${Num.sql(s"max($c)", 4)} AS max_v
          FROM lineitem""").mkString(" UNION ALL ")),
    (s, dir) => {
      val ls = Tables.lineitem(s, dir)
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        ls.select(col(c)).agg(
          count(col(c)).as("n"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("ndv"),
          Num.pround(min(col(c)), 4).as("min_v"),
          Num.pround(max(col(c)), 4).as("max_v"))
          .select(lit(c).as("column_name"), col("n"), col("n_null"),
            col("ndv"), col("min_v"), col("max_v"))
      }.reduce(_ unionAll _)
    })

  /** OPTIMIZE-style small-file compaction plan: given a file listing
    * (file_id, bytes) in layout order, assign files to target-sized output
    * bins by prefix-sum bin-packing — the plan a table maintenance job hands
    * to its rewrite stage. Reuses [[Pipeline.packSequences]]'s two-level
    * scan, so the global prefix sum never funnels through one partition:
    * at 100 TB of file metadata the wide table shuffles once by chunk and
    * only per-chunk totals see a global window. The simulated listing maps
    * o_orderkey → file_id and floor(o_totalprice) → bytes. */
  private val compactTarget = 32000000L

  def compactionPlan(files: DataFrame, target: Long): DataFrame =
    Pipeline.packSequences(files, "file_id", "bytes", target)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"))

  val compaction = QueryDef(
    "compaction_plan",
    "bin-pack a small-file listing into 32 MB output bins by global prefix sum",
    Some(s"""WITH f AS (SELECT o_orderkey AS file_id,
                               CAST(floor(o_totalprice) AS BIGINT) AS bytes
                        FROM orders),
             c AS (SELECT file_id, bytes,
                     CAST(coalesce(sum(bytes) OVER (ORDER BY file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS cum_before
                   FROM f)
             SELECT cum_before // $compactTarget AS bin,
                    count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS total_bytes
             FROM c GROUP BY 1"""),
    (s, dir) => compactionPlan(
      Tables.orders(s, dir).select(col("o_orderkey").as("file_id"),
        floor(col("o_totalprice")).cast("long").as("bytes")),
      compactTarget))

  /** Data-quality expectation report: one row per declared check with its
    * violation count — the CI gate a 100 TB ingest runs before publishing a
    * partition. Single-table checks share ONE conditional-count scan per
    * table (no per-check passes); referential checks are anti joins that AQE
    * sizes (the dim side broadcasts when small). Range thresholds come from
    * the generator contract (FIXTURES.md §B); the distribution guards are
    * deliberately tight enough to fire, so the report proves it counts. */
  val dqReport = QueryDef(
    "dq_report",
    "data-quality expectations: violation counts per declared check",
    Some("""SELECT 'lineitem_qty_out_of_range' AS check_name,
                   count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS n_violations
            FROM lineitem
            UNION ALL
            SELECT 'lineitem_price_nonpositive',
                   count(CASE WHEN l_extendedprice <= 0 THEN 1 END) FROM lineitem
            UNION ALL
            SELECT 'lineitem_discount_gt_5pct',
                   count(CASE WHEN l_discount > 0.05 THEN 1 END) FROM lineitem
            UNION ALL
            SELECT 'orders_date_out_of_range',
                   count(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' OR
                                   o_orderdate > TIMESTAMP '2001-12-31' THEN 1 END)
            FROM orders
            UNION ALL
            SELECT 'orders_price_gt_400k',
                   count(CASE WHEN o_totalprice > 400000 THEN 1 END) FROM orders
            UNION ALL
            SELECT 'orders_orphan_custkey', count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'lineitem_orphan_orderkey', count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)"""),
    (s, dir) => {
      def checks(df: DataFrame, cs: (String, org.apache.spark.sql.Column)*) = {
        val aggs = cs.zipWithIndex.map { case ((_, c), i) =>
          count(when(c, 1)).as(s"v$i")
        }
        val stack = cs.zipWithIndex
          .map { case ((nm, _), i) => s"'$nm', v$i" }.mkString(", ")
        df.agg(aggs.head, aggs.tail: _*)
          .select(expr(
            s"stack(${cs.size}, $stack) AS (check_name, n_violations)"))
      }
      def orphans(nm: String, fact: DataFrame, fk: String, dim: DataFrame,
          pk: String) =
        fact.join(dim, col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(nm).as("check_name"), col("n_violations"))
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      checks(li,
        "lineitem_qty_out_of_range" ->
          (col("l_quantity") < 1 || col("l_quantity") > 50),
        "lineitem_price_nonpositive" -> (col("l_extendedprice") <= 0),
        "lineitem_discount_gt_5pct" -> (col("l_discount") > 0.05))
        .unionAll(checks(o,
          "orders_date_out_of_range" ->
            (col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
              col("o_orderdate") > lit("2001-12-31").cast("timestamp")),
          "orders_price_gt_400k" -> (col("o_totalprice") > 400000)))
        .unionAll(orphans("orders_orphan_custkey", o, "o_custkey",
          Tables.customer(s, dir).select(col("c_custkey")), "c_custkey"))
        .unionAll(orphans("lineitem_orphan_orderkey",
          li.select(col("l_orderkey")), "l_orderkey",
          o.select(col("o_orderkey")), "o_orderkey"))
    })

  /** [[dqReport]]'s single-table checks as FREE-RIDER metrics on an existing
    * pass (`Dataset.observe` + [[org.apache.spark.sql.Observation]]): the
    * conditional counts piggyback on whatever job next executes the returned
    * frame, so at 100 TB the quality gate costs ZERO extra scans — the
    * mechanism behind production ingest metrics, vs dqReport's standalone
    * audit pass. The caller runs any action on the returned DataFrame and
    * then reads the metric row from the Observation. */
  def observedLineitemChecks(li: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("dq_lineitem")
    val observed = li.observe(obs,
      count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
        .as("qty_out_of_range"),
      count(when(col("l_extendedprice") <= 0, 1)).as("price_nonpositive"),
      count(when(col("l_discount") > 0.05, 1)).as("discount_gt_5pct"),
      count(lit(1)).as("n_rows"))
    (observed, obs)
  }

  /** CDC snapshot diff: the per-key change report between the state as of a
    * cutoff and the current state (latest event_type per user on both sides,
    * deterministic (ts, event_id) ordering). Both latest-per-key passes and
    * the reconciling join share the user_id partitioning — at 100 TB this is
    * two WindowGroupLimit passes (top-1 per key pushes into the shuffle) and
    * one co-partitioned join; no state is ever collected. `added` = key with
    * no pre-cutoff events; append-only input means `removed` cannot occur. */
  private val diffCutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z

  val snapshotDiff = QueryDef(
    "snapshot_diff",
    "CDC diff of latest-status state: as-of cutoff vs now, per user",
    Some(s"""WITH e AS (SELECT user_id, event_type,
                               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
                        FROM events),
             old AS (SELECT user_id, event_type AS old_status FROM (
                       SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY ts_us DESC, event_id DESC) AS rn
                       FROM e WHERE ts_us < $diffCutoffUs) WHERE rn = 1),
             new AS (SELECT user_id, event_type AS new_status FROM (
                       SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY ts_us DESC, event_id DESC) AS rn
                       FROM e) WHERE rn = 1)
             SELECT n.user_id, o.old_status, n.new_status,
                    CASE WHEN o.user_id IS NULL THEN 'added'
                         WHEN o.old_status <> n.new_status THEN 'changed'
                         ELSE 'unchanged' END AS change
             FROM new n LEFT JOIN old o ON n.user_id = o.user_id"""),
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      def latest(df: DataFrame, as: String) = df
        .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as(as))
      val old = latest(e.filter(col("ts_us") < diffCutoffUs), "old_status")
        .withColumnRenamed("user_id", "o_user")
      latest(e, "new_status")
        .join(old, col("user_id") === col("o_user"), "left_outer")
        .select(col("user_id"), col("old_status"), col("new_status"),
          when(col("o_user").isNull, "added")
            .when(col("old_status") =!= col("new_status"), "changed")
            .otherwise("unchanged").as("change"))
    })

  /** k-anonymity audit over quasi-identifier columns: how close the table is
    * to releasable under k=5 (smallest equivalence class, classes and rows
    * below k). One aggregation over the quasi-id grouping — the governance
    * gate's cost is a groupBy, independent of the column count audited. */
  val kAnonymity = QueryDef(
    "k_anonymity_report",
    "k-anonymity (k=5) audit of customer quasi-identifiers",
    Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
                       FROM customer GROUP BY 1, 2)
            SELECT count(*) AS n_classes, min(n) AS min_class,
                   count(CASE WHEN n < 5 THEN 1 END) AS classes_below_k,
                   CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                     AS n_rows_below_k
            FROM g"""),
    (s, dir) => Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_classes"), min(col("n")).as("min_class"),
        count(when(col("n") < 5, 1)).as("classes_below_k"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("n_rows_below_k")))

  /** Year-over-year revenue growth by calendar month — the time-intelligence
    * report shape (period-over-period comparison via a self-join on the
    * shifted period key). The monthly aggregate is |years| x 12 rows, so the
    * self-join is trivially broadcast at any fact-table size; growth is
    * computed on the ROUNDED monthly revenues, so both engines divide
    * identical doubles. First-year months have no prior and report NULL. */
  val yoyGrowth = QueryDef(
    "yoy_revenue_growth",
    "monthly revenue with year-over-year growth (period-shifted self-join)",
    Some(s"""WITH m AS (SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
                               CAST(strftime(o_orderdate, '%m') AS BIGINT) AS mon,
                               ${Num.sqlSum("o_totalprice", 6, 2)} AS revenue
                        FROM orders GROUP BY 1, 2)
             SELECT a.yr, a.mon, a.revenue, b.revenue AS prev_revenue,
                    ${Num.sql("(a.revenue - b.revenue) / b.revenue", 4)} AS yoy_growth
             FROM m a LEFT JOIN m b ON b.yr = a.yr - 1 AND b.mon = a.mon"""),
    (s, dir) => {
      val m = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(Num.psum(col("o_totalprice"), 6, 2).as("revenue"))
      val prev = m.select((col("yr") + 1).as("p_yr"), col("mon").as("p_mon"),
        col("revenue").as("prev_revenue"))
      m.join(broadcast(prev),
          col("yr") === col("p_yr") && col("mon") === col("p_mon"),
          "left_outer")
        .select(col("yr"), col("mon"), col("revenue"), col("prev_revenue"),
          Num.pround((col("revenue") - col("prev_revenue")) /
            col("prev_revenue"), 4).as("yoy_growth"))
    })

  /** l-diversity audit (distinct-l, l=3) — the governance companion to
    * [[kAnonymity]]: k-anonymity bounds re-identification of a ROW, but a
    * quasi-identifier class whose rows all share one sensitive value still
    * leaks the attribute; l-diversity requires ≥ l distinct sensitive
    * values per class. Sensitive attribute here: the order priorities a
    * customer's orders carry, over the same (nationkey, mktsegment)
    * quasi-identifier classes the k-audit uses. Cost at 100 TB: one
    * fact-dim equi-join on the customer key, then a two-level aggregation —
    * the distinct count runs as a (class, priority) pre-aggregation, so no
    * per-class distinct set ever materializes. */
  val lDiversity = QueryDef(
    "l_diversity_report",
    "l-diversity (l=3) audit of order priority over customer quasi-id classes",
    Some("""WITH j AS (SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
                       FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
            g AS (SELECT c_nationkey, c_mktsegment,
                         count(DISTINCT o_orderpriority) AS l_div,
                         count(*) AS n_rows
                  FROM j GROUP BY 1, 2)
            SELECT count(*) AS n_classes, min(l_div) AS min_l,
                   count(CASE WHEN l_div < 3 THEN 1 END) AS classes_below_l,
                   CAST(sum(CASE WHEN l_div < 3 THEN n_rows ELSE 0 END)
                     AS BIGINT) AS n_rows_below_l
            FROM g"""),
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      val j = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderpriority"))
        .join(c, col("o_custkey") === col("c_custkey"))
      j.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(countDistinct(col("o_orderpriority")).as("l_div"),
          count(lit(1)).as("n_rows"))
        .agg(count(lit(1)).as("n_classes"), min(col("l_div")).as("min_l"),
          count(when(col("l_div") < 3, 1)).as("classes_below_l"),
          sum(when(col("l_div") < 3, col("n_rows")).otherwise(0L))
            .as("n_rows_below_l"))
    })

  /** t-closeness audit (t = 0.2, total-variation distance) — the third rung
    * of the governance ladder after [[kAnonymity]] and [[lDiversity]]:
    * l-diversity counts distinct sensitive values per quasi-identifier class,
    * but a class can hold l distinct values in wildly skewed proportions and
    * still reveal the attribute with high confidence; t-closeness bounds the
    * DISTANCE between each class's sensitive-value distribution and the
    * global one. For a nominal attribute the earth-mover distance reduces to
    * total variation: TVD_c = ½·Σ_v |n_cv/n_c − n_v/N|.
    *
    * Determinism: the TVD numerator is kept exact — Σ_v |n_cv·N − n_v·n_c|
    * accumulates as DECIMAL(18,0) products of counts (order-independent,
    * exact for tables below 1e18 rows: the 36-digit product plus the
    * subtraction's carry digit stays inside DuckDB's width-38 decimal cap,
    * whereas DECIMAL(19,0) products would overflow it — ADVICE r9 flagged
    * the earlier DECIMAL(15,0) cast as overflowing AT the documented 1e15
    * bound), and only the final per-class division runs in
    * doubles via the shared IEEE rounding formula ([[Num.pround]]), so both
    * engines compare identical bit patterns against the t = 0.2 gate.
    *
    * Cost at 100 TB: the same fact-dim equi-join + (class, value) aggregation
    * l-diversity pays; everything after the first groupBy operates on the
    * |classes|·|values| table (≤ a few hundred rows), so the class×value
    * grid, the marginals, and the report are driver-trivial broadcast work. */
  val tCloseness = QueryDef(
    "t_closeness_report",
    "t-closeness (t=0.2, total variation) audit of order priority over customer quasi-id classes",
    Some(s"""WITH j AS (SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
                        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
             cv AS (SELECT c_nationkey, c_mktsegment, o_orderpriority,
                           count(*) AS n_cv
                    FROM j GROUP BY 1, 2, 3),
             cls AS (SELECT c_nationkey, c_mktsegment,
                            CAST(sum(n_cv) AS BIGINT) AS n_c
                     FROM cv GROUP BY 1, 2),
             vals AS (SELECT o_orderpriority, CAST(sum(n_cv) AS BIGINT) AS n_v
                      FROM cv GROUP BY 1),
             tot AS (SELECT CAST(sum(n_cv) AS BIGINT) AS n FROM cv),
             tvd AS (SELECT cls.c_nationkey, cls.c_mktsegment,
                            max(cls.n_c) AS n_c, max(tot.n) AS n,
                            sum(abs(CAST(COALESCE(g.n_cv, 0) AS DECIMAL(18,0))
                                      * CAST(tot.n AS DECIMAL(18,0))
                                  - CAST(vals.n_v AS DECIMAL(18,0))
                                      * CAST(cls.n_c AS DECIMAL(18,0)))) AS num
                     FROM cls CROSS JOIN vals CROSS JOIN tot
                     LEFT JOIN cv g ON g.c_nationkey = cls.c_nationkey
                                   AND g.c_mktsegment = cls.c_mktsegment
                                   AND g.o_orderpriority = vals.o_orderpriority
                     GROUP BY 1, 2),
             r AS (SELECT n_c,
                          ${Num.sql("CAST(num AS DOUBLE) / (2.0 * n_c * n)", 4)}
                            AS tvd
                   FROM tvd)
             SELECT count(*) AS n_classes, max(tvd) AS max_tvd,
                    count(CASE WHEN tvd > 0.2 THEN 1 END) AS classes_above_t,
                    CAST(sum(CASE WHEN tvd > 0.2 THEN n_c ELSE 0 END) AS BIGINT)
                      AS n_rows_above_t
             FROM r"""),
    (s, dir) => {
      val d = "decimal(18,0)"
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      // cached: four consumers (class totals, value marginals, grand total,
      // and the grid join) would otherwise each re-run the fact-dim join
      val cv = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderpriority"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n_cv"))
        .cache()
      val cls = cv.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(sum(col("n_cv")).as("n_c"))
      val vals = cv.groupBy(col("o_orderpriority"))
        .agg(sum(col("n_cv")).as("n_v"))
      val tot = cv.agg(sum(col("n_cv")).as("n"))
      val tvd = cls.crossJoin(broadcast(vals)).crossJoin(broadcast(tot))
        .join(cv.select(col("c_nationkey").as("g_nat"),
            col("c_mktsegment").as("g_seg"),
            col("o_orderpriority").as("g_pri"), col("n_cv")),
          col("c_nationkey") === col("g_nat") &&
            col("c_mktsegment") === col("g_seg") &&
            col("o_orderpriority") === col("g_pri"), "left_outer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(max(col("n_c")).as("n_c"), max(col("n")).as("n"),
          sum(abs(coalesce(col("n_cv"), lit(0L)).cast(d) * col("n").cast(d) -
            col("n_v").cast(d) * col("n_c").cast(d))).as("num"))
      tvd.select(col("n_c"),
          Num.pround(col("num").cast("double") /
            (lit(2.0) * col("n_c") * col("n")), 4).as("tvd"))
        .agg(count(lit(1)).as("n_classes"), max(col("tvd")).as("max_tvd"),
          count(when(col("tvd") > 0.2, 1)).as("classes_above_t"),
          sum(when(col("tvd") > 0.2, col("n_c")).otherwise(0L))
            .as("n_rows_above_t"))
    })

  /** Two-sided-geometric (discrete Laplace, ε = 1) noise ladder: cumulative
    * millionth-thresholds → noise value, for noise in [−8, 8] (the tail mass
    * beyond ±8 is < 3e-4 and folds into the extremes). Computed ONCE here
    * and inlined as the SAME literals into both the Column chain and the
    * oracle SQL — the engines never evaluate exp(), so the usual
    * transcendental cross-engine drift cannot exist. */
  private val DpNoise: Seq[(Long, Int)] = {
    val alpha = math.exp(-1.0)
    val c = (1 - alpha) / (1 + alpha)
    val ks = (-8 to 8).toSeq
    val cums = ks.map(k => c * math.pow(alpha, math.abs(k)))
      .scanLeft(0.0)(_ + _).tail
    val ts = cums.init.map(x => math.round(x * 1e6)) :+ 1000000L
    ts.zip(ks)
  }

  /** Differentially-private release of the quasi-identifier class-size
    * histogram — what a governance pipeline actually PUBLISHES after the
    * [[kAnonymity]]/[[lDiversity]]/[[tCloseness]] audits gate the raw table:
    * each class count + discrete-Laplace noise (two-sided geometric, ε = 1,
    * the integer-valued mechanism of Ghosh-Roughgarden-Sundararajan), then
    * clamped at 0. Sensitivity of a class-size histogram is 1 (one person
    * moves one class), so ε = 1 per release.
    *
    * Deterministic by design: the noise draw is a fixed-seed LCG over the
    * class key (reproducible-release variant — a production deployment
    * rotates the seed per release epoch and pays ε from its budget each
    * time; the MECHANISM is what this operator pins, and a seeded draw is
    * how a release is made re-runnable/auditable). The uniform variate is
    * taken by SCALING the LCG state (floor(x·10⁶ / 2³¹) — exact: the
    * product stays under 2⁵³ and the divisor is a power of two), not by a
    * modulus, so no low-bit cycling or wrap bias enters the ladder.
    *
    * Cost at 100 TB: the k-anonymity groupBy plus per-class literal
    * arithmetic — noise is applied to the |classes| table, never to rows. */
  val dpRelease = QueryDef(
    "dp_release_class_sizes",
    "DP (discrete-Laplace, eps=1) release of customer quasi-id class sizes",
    Some {
      val ladder = DpNoise.init
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("\n                   ")
      s"""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
                     FROM customer GROUP BY 1, 2),
          h AS (SELECT c_nationkey, c_mktsegment, n,
                  ((CAST(c_nationkey AS BIGINT) * 1000003
                    + CAST(ascii(substr(c_mktsegment, 1, 1)) AS BIGINT)
                      * 486187739
                    + CAST(ascii(substr(c_mktsegment, 2, 1)) AS BIGINT)
                      * 2654435
                    + ascii(substr(c_mktsegment, 3, 1)) * 8191
                    + length(c_mktsegment) * 127 + 12345)
                   % 2147483647) AS x0
                FROM g),
          m AS (SELECT c_nationkey, c_mktsegment, n,
                  CAST(floor(((((x0 * 1103515245 + 12345) % 2147483648)
                                * 1103515245 + 12345) % 2147483648)
                             * 1000000 / 2147483648) AS BIGINT) AS u
                FROM h)
          SELECT c_nationkey, c_mktsegment,
                 greatest(n + CASE $ladder
                   ELSE ${DpNoise.last._2} END, 0) AS n_released
          FROM m"""
    },
    (s, dir) => {
      val g = Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      // the seed mixes nation, the first THREE segment characters, and the
      // length — one character alone would hand identical (correlated) noise
      // to any two segments sharing an initial; segments identical in all
      // four components would still share a draw (swap in a full-string hash
      // once both engines agree on one)
      val x0 = (col("c_nationkey").cast("long") * lit(1000003L) +
        ascii(substring(col("c_mktsegment"), 1, 1)) * lit(486187739L) +
        ascii(substring(col("c_mktsegment"), 2, 1)) * lit(2654435L) +
        ascii(substring(col("c_mktsegment"), 3, 1)) * lit(8191L) +
        length(col("c_mktsegment")) * lit(127L) +
        lit(12345L)) % lit(2147483647L)
      val x2 = ((x0 * lit(1103515245L) + lit(12345L)) % lit(2147483648L) *
        lit(1103515245L) + lit(12345L)) % lit(2147483648L)
      val u = floor(x2 * lit(1000000L) / lit(2147483648L)).cast("long")
      val noise = DpNoise.init.tail.foldLeft(
        when(u < DpNoise.head._1, lit(DpNoise.head._2))) {
        case (acc, (t, k)) => acc.when(u < t, lit(k))
      }.otherwise(lit(DpNoise.last._2))
      g.select(col("c_nationkey"), col("c_mktsegment"),
        greatest(col("n") + noise, lit(0L)).as("n_released"))
    })

  val defs: Seq[QueryDef] =
    Seq(scd2, merge, markov, zorder, tableStats, compaction, dqReport,
      snapshotDiff, kAnonymity, lDiversity, tCloseness, dpRelease, yoyGrowth)
}
