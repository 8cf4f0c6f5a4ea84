package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual catalog queries warm (3 runs each) at a given
  * scale dir — `runMain graft.TimeQ <sfDir> <query> [<query> ...]`. The
  * per-query numbers in Bench are a full-catalog sweep; this isolates one
  * query for optimization work without the 2-minute sweep. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("d9_scalar_count")(spark, dir).count() // warm session
    for (n <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n%-28s ${times.min}%6.3f min  ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
