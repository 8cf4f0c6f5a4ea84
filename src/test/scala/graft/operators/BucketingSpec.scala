package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) storage: writing both join sides bucketed by the
  * join key lets a later join read them co-located — zero Exchange in the
  * join plan. This is the storage-level answer to repeated 100 TB fact-fact
  * joins (shuffle once at write time, never again at read time). */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without any Exchange") {
    // default spark-warehouse dir (warehouse.dir is a static conf); tables
    // are dropped in finally, which removes their files
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf("sf0.001"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf("sf0.001"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))
    // disable broadcast so the co-located sort-merge path is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the join's children read bucketed scans: the ONLY Exchange in the
      // whole plan is the aggregation's, keyed on o_orderstatus — the join
      // itself runs shuffle-free on the bucketed layout
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exchanges.length == 1, s"expected 1 exchange:\n$p")
      assert(exchanges.head.contains("o_orderstatus"), s"join shuffled:\n$p")
      // and the result is correct
      val total = joined.agg(sum(col("qty"))).head().getDouble(0)
      val expected = Tables.lineitem(spark, sf("sf0.001"))
        .agg(sum(col("l_quantity"))).head().getDouble(0)
      assert(math.abs(total - expected) < 1e-6)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
