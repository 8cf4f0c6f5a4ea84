package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output for named catalog queries
  * to files — `runMain graft.ExplainDump <sfDir> <outDir> <query> [...]`
  * (or `--all` for the whole catalog). Produces the `plans/r16/<q>_<tag>.txt`
  * evidence files: the judge checks plan claims (Exchange counts, join
  * strategy, PushedFilters) against these instead of running Spark. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val rest = args.drop(2).toSeq
    val tag = rest.collectFirst { case s if s.startsWith("--tag=") =>
      s.stripPrefix("--tag=") }.getOrElse("plan")
    val names: Seq[String] =
      if (rest.contains("--all")) SparkEntry.catalog.map(_.name)
      else rest.filterNot(_.startsWith("--"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // --exec: run the query through the noop sink first (guide §1.4), so the
    // dumped plan is the FINAL adaptive plan (isFinalPlan=true) with runtime
    // join strategies, AQEShuffleReads and ReusedExchanges visible — the
    // pre-execution explain hides all three under AdaptiveSparkPlan.
    val exec = rest.contains("--exec")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      if (exec) df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      spark.catalog.clearCache()
      println(s"wrote $outDir/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
