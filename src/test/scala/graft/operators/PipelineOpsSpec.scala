package graft.operators

import graft.SparkSpec
import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-assembly operators: the scalable forms must equal their naive
  * single-node definitions, and Bloom pruning must never drop a true match. */
class PipelineOpsSpec extends SparkSpec {

  test("packSequences two-level scan == naive global-window prefix sum") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    val packed = Pipeline.packSequences(docs, "doc_id", "n_tokens", 4096L)
      .orderBy("doc_id").collect()
    // naive: one global window (what the scalable form must reproduce)
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_before div 4096").as("bin"),
        (col("cum_before") % 4096).as("bin_offset"))
      .orderBy("doc_id").collect()
    assert(packed.toSeq == naive.toSeq)
    // packing invariants: bins start at 0, advance monotonically, offsets
    // stay inside capacity
    val bins = packed.map(_.getAs[Long]("bin"))
    assert(bins.head == 0L && bins.sliding(2).forall(p => p(0) <= p(1)))
    assert(packed.forall(r => (0L until 4096L).contains(r.getAs[Long]("bin_offset"))))
  }

  test("bloomPrune keeps every true key and prunes most others") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val lineitem = Tables.lineitem(spark, sf("sf0.001"))
    val hi = orders.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
    val pruned = Pipeline.bloomPrune(lineitem, "l_orderkey", hi, "o_orderkey")
    val exact = lineitem
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
    // no false negatives: the exact matches survive pruning untouched
    assert(exact.join(pruned.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Seq("l_orderkey", "l_linenumber", "l_quantity"), "left_anti").isEmpty)
    // and the filter actually prunes (fpp 1% leaves ~non-matching*0.01)
    val (total, kept, truth) = (lineitem.count(), pruned.count(), exact.count())
    assert(kept < total && kept >= truth,
      s"expected truth <= kept < total, got truth=$truth kept=$kept total=$total")
  }
}
