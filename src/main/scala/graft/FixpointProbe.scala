package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): drive Dedup.connectedComponents' DISTRIBUTED fixpoint
  * (threshold 0 forces it past the driver union-find gate) on a synthetic
  * shallow-cluster graph and report wall + total shuffle bytes. Shuffle
  * bytes are host-load-independent, so old-vs-new classes can be compared
  * across JVM runs even on this drifting co-tenant host.
  * `runMain graft.FixpointProbe [nClusters] [fanout]` */
object FixpointProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toLong).getOrElse(500000L)
    val fanout = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // same dev-conf passthrough as TimeQ/Bench — how the r17 fixpoint plan
    // dumps (spark.graft.debug.fixpointPlanDir) are produced
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    // star clusters: center c*1e6 joined to `fanout` leaves — diameter 2,
    // so the fixpoint converges in the same round count at any size
    val pairs = spark.range(nClusters * fanout)
      .select(((col("id") / fanout).cast("long") * 1000000L).as("i"),
        ((col("id") / fanout).cast("long") * 1000000L + pmod(col("id"), lit(fanout)) + 1L).as("j"))
    pairs.count() // materialize the range outside the timed region
    val times = (1 to 3).map { _ =>
      shufWrite.set(0)
      val t0 = System.nanoTime()
      val n = operators.Dedup.connectedComponents(pairs, broadcastThreshold = 0L).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"FIXPOINT n=$n%d wall=$dt%.3f s shufMB=${shufWrite.get / 1048576}%d")
      spark.catalog.clearCache()
      dt
    }
    println(f"FIXPOINT min=${times.min}%.3f")
    spark.stop()
  }
}
