package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MlPrepSpec extends SparkSpec {

  test("negative samples never collide with the positive set and are deterministic") {
    val dir = sf("sf0.001")
    val neg = MlPrep.negativeSamplesQ.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    val pos = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg.nonEmpty)
    neg.foreach { case (c, _, p) =>
      assert(!pos.contains((c, p)), s"negative ($c, $p) is a positive")
    }
    // per-customer: ranks are 1..n with n <= 3, ids within the part key space
    val nParts = Tables.part(spark, dir).count()
    neg.groupBy(_._1).foreach { case (c, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq, s"$c")
      assert(rows.length <= 3)
      rows.foreach { case (_, _, p) => assert(p >= 0 && p < nParts) }
    }
    // every customer is served (5 draws always leave >= 1 non-positive here)
    assert(neg.map(_._1).distinct.length ==
      Tables.customer(spark, dir).count())
    // deterministic: a second run returns the identical set
    val again = MlPrep.negativeSamplesQ.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    assert(neg.toSet == again.toSet)
  }

  test("hash cross buckets are stable, bounded, and functionally determined") {
    val rows = MlPrep.hashCrossQ.run(spark, sf("sf0.001"))
      .join(Tables.customer(spark, sf("sf0.001")), "c_custkey")
      .select(col("c_nationkey"), col("c_mktsegment"), col("cross_bucket"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
    rows.foreach { case (_, b) => assert(b >= 0 && b < 64) }
    // same (nation, segment) always lands in the same bucket
    rows.groupBy(_._1).foreach { case (k, vs) =>
      assert(vs.map(_._2).distinct.length == 1, s"$k maps to multiple buckets")
    }
  }
}
