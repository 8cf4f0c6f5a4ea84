package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_clusters stage costs (dev-only). */
object ProfClusters {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("d9_scalar_count")(spark, dir).count()
    val docs = graft.sources.Tables.documents(spark, dir)
    t("docs.count")(docs.count())
    val sh = t("shingle build")(graft.operators.Dedup
      .shingleIndexHashed(docs, "doc_id", "text", 3).cache())
    t("shingle count")(sh.count())
    val sig = graft.operators.Dedup.minHashSignatures(sh, 32)
    t("signatures count")(sig.count())
    val cands = graft.operators.Dedup.lshCandidates(sig, 8, 4)
    t("candidates count")(cands.count())
    spark.catalog.clearCache()
    val pairs = t("minHashDedup full cold") {
      val p = graft.operators.Dedup.minHashDedup(docs, "doc_id", "text", 3, 32, 8, 0.8)
      p.count(); p
    }
    t("pairs recount warm")(pairs.count())
    spark.catalog.clearCache()
    t("connectedComponents cold") {
      val p = graft.operators.Dedup.minHashDedup(docs, "doc_id", "text", 3, 32, 8, 0.8)
      graft.operators.Dedup.connectedComponents(p).count()
    }
    spark.catalog.clearCache()
    t("full query via SparkEntry")(SparkEntry.queries("dedup_clusters")(spark, dir).count())
    spark.stop()
  }
}
