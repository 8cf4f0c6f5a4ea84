package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print exchange/broadcast counts and plan red flags
  * (CartesianProduct / Expand / SortAggregate / BNLJ) for a set of catalog
  * queries — the quick way to check a new operator's physical shape without
  * spelunking full explain output. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("dedup_paragraphs", "semdedup_verdicts", "dsir_weights",
        "simhash_hamming_pairs_wide", "ann_recall_report",
        "dedup_ngram_jaccard", "bm25_topk", "dedup_containment",
        "basket_lift", "ts_gapfill", "compaction_plan", "dq_report")) {
      val df = SparkEntry.queries(n)(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      println(s"=== $n")
      println("  exchanges: " + s.linesIterator.count(_.contains("Exchange")))
      println("  broadcasts: " + s.linesIterator.count(_.contains("BroadcastExchange")))
      Seq("CartesianProduct", "Expand", "BroadcastNestedLoop", "SortAggregate")
        .foreach(k => if (s.contains(k)) println(s"  HAS $k"))
    }
    spark.stop()
  }
}
