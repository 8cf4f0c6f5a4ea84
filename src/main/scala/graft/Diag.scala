package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-sf1"
    val docs = Tables.documents(spark, dir)
    val sh = Dedup.shingleIndexHashed(docs, "doc_id", "text", 3).cache()
    for ((nh, nb) <- Seq((32, 8), (48, 12), (64, 16))) {
      val t0 = System.nanoTime()
      val sig = Dedup.minHashSignatures(sh, nh)
      val cands = Dedup.lshCandidates(sig, nb, nh / nb).count()
      val pairs = Dedup.minHashDedupFromIndex(sh, nh, nb, 0.8).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DIAG nh=$nh bands=$nb candidates=$cands verified_pairs=$pairs sec=$sec%.1f")
    }
    spark.stop()
  }
}
