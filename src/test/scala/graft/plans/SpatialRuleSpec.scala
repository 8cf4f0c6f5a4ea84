package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

/** The haversine-join rewrite: plain SQL with a radius predicate must plan
  * as a hash join on derived cell keys (no nested loop over the product)
  * and return EXACTLY the rows the naive plan returns. */
class SpatialRuleSpec extends SparkSpec {

  private def setup(): Unit = {
    Graft.init(spark)
    Graft.registerTables(spark, sf("sf0.001"))
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW sr_pos AS
         SELECT user_id AS ship, event_id,
                (event_id % 1780) / 10.0 - 89.0 AS lat,
                (event_id % 3580) / 10.0 - 179.0 AS lon
         FROM events""")
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW sr_ports AS
         SELECT CAST(n_nationkey AS BIGINT) AS port_id,
                (n_nationkey * 7 % 120) - 60 + 0.5 AS plat,
                (n_nationkey * 37 % 340) - 170 + 0.5 AS plon
         FROM nation""")
  }

  private val radiusSql =
    """SELECT port_id, ship, event_id
       FROM sr_ports q JOIN sr_pos p
         ON haversine_km(q.plat, q.plon, p.lat, p.lon) <= 800.0"""

  test("radius-predicate SQL join plans as a cell hash join, not a nested loop") {
    setup()
    val df = spark.sql(radiusSql)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("__graft_cell"), p)
    assert(df.count() > 0)
  }

  test("rewrite returns exactly the nested-loop result") {
    setup()
    val withRule = spark.sql(radiusSql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // drop the rule, replan the same SQL: Catalyst falls back to BNLJ
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == BlockHaversineJoins)
    try {
      val naiveDf = spark.sql(radiusSql)
      val np = naiveDf.queryExecution.executedPlan.toString
      assert(np.contains("BroadcastNestedLoopJoin") ||
        np.contains("CartesianProduct"), np)
      val naive = naiveDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(withRule == naive,
        s"rule=${withRule.size} naive=${naive.size} " +
          s"missing=${(naive -- withRule).take(5)} extra=${(withRule -- naive).take(5)}")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("WHERE-clause form rewrites too (predicate pushed into the join first)") {
    setup()
    val df = spark.sql(
      """SELECT port_id, ship FROM sr_ports q, sr_pos p
         WHERE haversine_km(q.plat, q.plon, p.lat, p.lon) <= 800.0""")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(df.count() > 0)
  }

  test("EXISTS / NOT EXISTS radius subqueries (semi/anti joins) rewrite " +
    "and agree with the nested-loop plans") {
    setup()
    val semiSql =
      """SELECT ship, event_id FROM sr_pos p
         WHERE EXISTS (SELECT 1 FROM sr_ports q
                       WHERE haversine_km(q.plat, q.plon, p.lat, p.lon) <= 800.0)"""
    val antiSql =
      """SELECT ship, event_id FROM sr_pos p
         WHERE NOT EXISTS (SELECT 1 FROM sr_ports q
                           WHERE haversine_km(q.plat, q.plon, p.lat, p.lon) <= 800.0)"""
    val total = spark.table("sr_pos").count()
    for (sql <- Seq(semiSql, antiSql)) {
      val df = spark.sql(sql)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
      assert(p.contains("__graft_cell"), p)
    }
    val saved = spark.experimental.extraOptimizations
    def rows(sql: String): Set[(Long, Long)] = spark.sql(sql).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val (semiOn, antiOn) = (rows(semiSql), rows(antiSql))
    // semi + anti partition the table
    assert(semiOn.size + antiOn.size == total && (semiOn & antiOn).isEmpty)
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == BlockHaversineJoins)
    try {
      assert(rows(semiSql) == semiOn)
      assert(rows(antiSql) == antiOn)
      assert(semiOn.nonEmpty && antiOn.nonEmpty)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("the rewrite composes with extra predicates and reversed sides") {
    setup()
    val q =
      """SELECT port_id, ship
         FROM sr_pos p JOIN sr_ports q
           ON p.ship % 2 = 0 AND haversine_km(q.plat, q.plon, p.lat, p.lon) <= 800.0"""
    val df = spark.sql(q)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == BlockHaversineJoins)
    try {
      val naive = spark.sql(q).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == naive)
      assert(got.nonEmpty)
    } finally spark.experimental.extraOptimizations = saved
  }
}
