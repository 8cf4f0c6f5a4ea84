package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bin-SALTING experiment for the semantic-bin joins (SCALE.md next-decade
  * obligation for `range_join_binned` / `geo_encounters`): their bins are
  * semantic (the range constant, the radius cell), so the
  * session_overlap-style width-shrink lever does not apply; if traffic
  * concentrates in one bin, that bin's candidate product lands in ONE task
  * and the stage time becomes the hot task. The salting lever: the probe
  * side keeps one deterministic salt per row (pmod(xxhash64(<all row
  * columns>), S) — the Skew.saltedCountSum discipline, retry-stable and
  * row-unique up to exact duplicates), the build side explodes
  * ALL S salts, and the join adds the salt to the bin key — the hot bin's
  * work splits S ways at the cost of an S× build-side shuffle duplication.
  *
  * Two measured questions, answered by `main`:
  *  1. NATURAL data (sf30): is there a hot bin at all, and what does the
  *     flat S× duplication cost on balanced bins? (The events generator
  *     hashes timestamps uniformly, so the expected answer is "no hot bin;
  *     salting only pays" — measured, not assumed.)
  *  2. PLANTED skew (sf1, a fraction of both sides remapped into one hour):
  *     does the salted plan actually cut the stage's hot task S× where the
  *     unsalted plan serializes it? This is the regime the obligation is
  *     about — real AIS traffic concentrates in ports, unlike the
  *     generator's uniform hash.
  *
  * Per-variant stats: wall-clock plus max/p50 task duration of the heaviest
  * stage (task-skew ratio IS the phenomenon; wall-clock alone can hide it
  * under AQE coalescing). Emits one JSON line per measurement; the
  * adjudication lives in BENCH_NOTES.
  */
object SaltProbe {

  /** The salted twin of [[operators.Advanced.rangeJoinBinned]]. */
  def saltedRangeJoinBinned(left: DataFrame, right: DataFrame,
      lTimeUs: String, rTimeUs: String, windowUs: Long, s: Int): DataFrame = {
    val lBin = expr(s"$lTimeUs div ${windowUs}L")
    // salt on the WHOLE row (all probe-side columns), not the time column:
    // a bin that is hot because many rows share one literal timestamp (port
    // arrivals stamped on the hour) would map to ONE salt under a
    // time-derived hash and never split — the exact regime the lever is for
    val l = left
      .withColumn("probe_bin", explode(array(lBin, lBin - 1)))
      .withColumn("__lsalt",
        pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(s.toLong))
          .cast("int"))
    val r = right
      .withColumn("r_bin", expr(s"$rTimeUs div ${windowUs}L"))
      .withColumn("__rsalt", explode(sequence(lit(0), lit(s - 1))))
    l.join(r, col("probe_bin") === col("r_bin") &&
        col("__lsalt") === col("__rsalt") &&
        col(rTimeUs) >= col(lTimeUs) - windowUs &&
        col(rTimeUs) <= col(lTimeUs))
      .drop("probe_bin", "r_bin", "__lsalt", "__rsalt")
  }

  /** Shared with [[GeoSaltProbe]]: per-stage task-duration capture. */
  private[graft] final class TaskStats extends SparkListener {
    val byStage = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuffer[Long]]
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      if (e.taskInfo != null)
        byStage.getOrElseUpdate(e.stageId,
          scala.collection.mutable.ArrayBuffer.empty) += e.taskInfo.duration
    }
    /** (max, p50) task duration of the stage with the largest total time. */
    def heaviest(): (Long, Long) = synchronized {
      if (byStage.isEmpty) (0L, 0L)
      else {
        val ts = byStage.values.maxBy(_.sum).sorted
        (ts.last, ts(ts.length / 2))
      }
    }
    def clear(): Unit = synchronized { byStage.clear() }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val saltS = sys.env.getOrElse("SPARK_GRAFT_SALT", "8").toInt
    val natDir = args.headOption.getOrElse("/tmp/graft-sf30")
    val skewDir = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val skewFrac = sys.env.getOrElse("SPARK_GRAFT_SKEW_FRAC", "0.02").toDouble
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    val W = 3600000000L

    def sides(dir: String, plantSkew: Boolean): (DataFrame, DataFrame) = {
      val e0 = sources.Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"))
      // plant: remap `skewFrac` of rows (both sides, deterministic by id)
      // into one fixed hour — the port-concentration regime
      val e = if (!plantSkew) e0 else e0.withColumn("ts_us",
        when(pmod(xxhash64(col("event_id"), lit("skew")), lit(10000))
            < lit((skewFrac * 10000).toLong),
          lit(1704067200000000L) + pmod(xxhash64(col("event_id")), lit(W)))
          .otherwise(col("ts_us")))
      (e.filter(col("event_type") === "purchase").select(col("event_id"), col("ts_us")),
        e.filter(col("event_type") === "signup")
          .select(col("event_id").as("s_id"), col("ts_us").as("s_ts_us")))
    }

    def binShare(dir: String, plantSkew: Boolean): (Long, Double, Double) = {
      val (a, b) = sides(dir, plantSkew)
      val ab = a.groupBy(expr(s"ts_us div ${W}L").as("bin"))
        .agg(count(lit(1)).as("na"))
      val bb = b.groupBy(expr(s"s_ts_us div ${W}L").as("bin"))
        .agg(count(lit(1)).as("nb"))
      // candidate mass per probe bin: na(bin) * (nb(bin) + nb(bin-1))
      val cand = ab.join(bb, Seq("bin"), "left")
        .join(bb.select((col("bin") + 1).as("bin"), col("nb").as("nb_prev")),
          Seq("bin"), "left")
        .select(col("bin"), (col("na") *
          (coalesce(col("nb"), lit(0L)) + coalesce(col("nb_prev"), lit(0L))))
          .as("cand"))
      val agg = cand.agg(sum(col("cand")).as("total"), max(col("cand")).as("mx"),
        count(lit(1)).as("nbins")).collect()(0)
      val total = agg.getLong(0); val mx = agg.getLong(1); val nb2 = agg.getLong(2)
      (total, mx.toDouble / total, 1.0 / nb2)
    }

    def time(label: String, df: => DataFrame): (Double, Long, Long, Long) = {
      val runs = (1 to 2).map { _ =>
        stats.clear()
        val t0 = System.nanoTime()
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val (mx, p50) = stats.heaviest()
        (dt, n, mx, p50)
      }
      val best = runs.minBy(_._1)
      println(f"""{"salt_probe":"$label","sec":${best._1}%.1f,"rows":${best._2},"task_max_ms":${best._3},"task_p50_ms":${best._4}}""")
      best
    }

    // MODE=auto (r15): the item-1 closing measurement — the SAME planted
    // skew, but through PLAIN SQL with the optimizer rule deciding: the
    // auto-salted plan (default confs; the trigger must fire by itself)
    // vs the rule with autoSalt disabled (the old unsalted binned plan).
    // This is the user-visible endpoint: no probe object, no hand-built
    // bins — just the naive trailing-window join spelling.
    if (sys.env.get("SPARK_GRAFT_SALT_MODE").contains("auto")) {
      val (tot3, maxShare3, uniform3) = binShare(skewDir, plantSkew = true)
      println(f"""{"salt_probe":"auto_skew_profile","dir":"$skewDir","frac":$skewFrac,"cand_total":$tot3,"max_bin_share":$maxShare3%.6f,"uniform_share":$uniform3%.6f}""")
      val (pa, pb) = sides(skewDir, plantSkew = true)
      pa.createOrReplaceTempView("sp_purch")
      pb.createOrReplaceTempView("sp_sign")
      graft.plans.RangeJoin.register(spark)
      val sql =
        """SELECT p.event_id, s.s_id FROM sp_purch p JOIN sp_sign s
             ON s.s_ts_us >= p.ts_us - 3600000000 AND s.s_ts_us <= p.ts_us"""
      spark.conf.set("spark.graft.rangeJoin.autoSalt.factor", saltS)
      val planAuto = spark.sql(sql).queryExecution.executedPlan.toString
      println(s"""{"salt_probe":"auto_plan","salted":${planAuto.contains("__graft_rbin_ps")}}""")
      time("auto_sql_salted", spark.sql(sql))
      spark.conf.set("spark.graft.rangeJoin.autoSalt.enabled", "false")
      time("auto_sql_unsalted", spark.sql(sql))
      spark.conf.unset("spark.graft.rangeJoin.autoSalt.enabled")
      spark.stop()
      return
    }

    // MODE=aqe (r16 verdict item 6): does AQE's OptimizeSkewedJoin already
    // cover the hot-bin regime the auto-salt rules exist for? Three arms on
    // the SAME planted corpus, plain SQL throughout: (1) autoSalt off with
    // AQE skew handling at stock defaults (what a vanilla Spark user gets —
    // note r15's unsalted arm ALREADY ran with adaptive.enabled=true);
    // (2) autoSalt off with AQE skew tuned aggressive (low threshold,
    // force-apply); (3) the rule deciding by itself. AQE splits a skewed
    // reducer PARTITION by map-output ranges and duplicates the other
    // side's partition, so in principle it can split one hot KEY too —
    // whether it does, and how it compares, is a measurement.
    if (sys.env.get("SPARK_GRAFT_SALT_MODE").contains("aqe")) {
      val (tot3, maxShare3, uniform3) = binShare(skewDir, plantSkew = true)
      println(f"""{"salt_probe":"aqe_skew_profile","dir":"$skewDir","frac":$skewFrac,"cand_total":$tot3,"max_bin_share":$maxShare3%.6f,"uniform_share":$uniform3%.6f}""")
      val (pa, pb) = sides(skewDir, plantSkew = true)
      pa.createOrReplaceTempView("sp_purch")
      pb.createOrReplaceTempView("sp_sign")
      graft.plans.RangeJoin.register(spark)
      val sql =
        """SELECT p.event_id, s.s_id FROM sp_purch p JOIN sp_sign s
             ON s.s_ts_us >= p.ts_us - 3600000000 AND s.s_ts_us <= p.ts_us"""
      spark.conf.set("spark.graft.rangeJoin.autoSalt.enabled", "false")
      time("aqe_stock_unsalted", spark.sql(sql))
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      time("aqe_aggressive_unsalted", spark.sql(sql))
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
      spark.conf.unset("spark.graft.rangeJoin.autoSalt.enabled")
      val planAuto = spark.sql(sql).queryExecution.executedPlan.toString
      println(s"""{"salt_probe":"aqe_auto_plan","salted":${planAuto.contains("__graft_rbin_ps")}}""")
      time("aqe_autosalt", spark.sql(sql))
      spark.stop()
      return
    }

    // MODE=adaptive (r16 verdict item 8): fixed S=8 (the r14 knee) vs the
    // share-derived factor (ProbeUtil.adaptiveFactor: clamp(share x
    // parallelism x 2, 2, 64)) on the same planted corpus — run at two
    // SPARK_GRAFT_SKEW_FRAC values to cover a moderate and a dominant hot
    // bin. Keep 8 if the adaptive form doesn't win.
    if (sys.env.get("SPARK_GRAFT_SALT_MODE").contains("adaptive")) {
      val (tot3, maxShare3, uniform3) = binShare(skewDir, plantSkew = true)
      println(f"""{"salt_probe":"adaptive_skew_profile","dir":"$skewDir","frac":$skewFrac,"cand_total":$tot3,"max_bin_share":$maxShare3%.6f,"uniform_share":$uniform3%.6f,"expected_auto_s":${graft.plans.ProbeUtil.adaptiveFactor(maxShare3)}}""")
      val (pa, pb) = sides(skewDir, plantSkew = true)
      pa.createOrReplaceTempView("sp_purch")
      pb.createOrReplaceTempView("sp_sign")
      graft.plans.RangeJoin.register(spark)
      val sql =
        """SELECT p.event_id, s.s_id FROM sp_purch p JOIN sp_sign s
             ON s.s_ts_us >= p.ts_us - 3600000000 AND s.s_ts_us <= p.ts_us"""
      spark.conf.set("spark.graft.rangeJoin.autoSalt.factor", "8")
      val planF = spark.sql(sql).queryExecution.executedPlan.toString
      println(s"""{"salt_probe":"adaptive_fixed8_plan","salted":${planF.contains("__graft_rbin_ps")}}""")
      time("adaptive_fixed8", spark.sql(sql))
      spark.conf.set("spark.graft.rangeJoin.autoSalt.factorAuto", "true")
      val planA = spark.sql(sql).queryExecution.executedPlan.toString
      println(s"""{"salt_probe":"adaptive_auto_plan","salted":${planA.contains("__graft_rbin_ps")}}""")
      time("adaptive_auto", spark.sql(sql))
      spark.conf.unset("spark.graft.rangeJoin.autoSalt.factorAuto")
      spark.stop()
      return
    }

    // 1. natural sf30: hot-bin profile + binned vs salted wall-clock
    val (tot, maxShare, uniform) = binShare(natDir, plantSkew = false)
    println(f"""{"salt_probe":"natural_profile","dir":"$natDir","cand_total":$tot,"max_bin_share":$maxShare%.6f,"uniform_share":$uniform%.6f}""")
    val (na, nb) = sides(natDir, plantSkew = false)
    time("natural_binned",
      operators.Advanced.rangeJoinBinned(na, nb, "ts_us", "s_ts_us", W))
    time(s"natural_salted_$saltS",
      saltedRangeJoinBinned(na, nb, "ts_us", "s_ts_us", W, saltS))

    // 2. planted skew at the smaller dir: profile + binned vs salted
    val (tot2, maxShare2, uniform2) = binShare(skewDir, plantSkew = true)
    println(f"""{"salt_probe":"skew_profile","dir":"$skewDir","frac":$skewFrac,"cand_total":$tot2,"max_bin_share":$maxShare2%.6f,"uniform_share":$uniform2%.6f}""")
    val (sa, sb) = sides(skewDir, plantSkew = true)
    time("skew_binned",
      operators.Advanced.rangeJoinBinned(sa, sb, "ts_us", "s_ts_us", W))
    time(s"skew_salted_$saltS",
      saltedRangeJoinBinned(sa, sb, "ts_us", "s_ts_us", W, saltS))
    spark.stop()
  }
}
