package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r17 few-key merge-hint gate (VERDICT r16 #2): AQE's SMJ→SHJ rewrite
  * (`maxShuffledHashJoinLocalMapThreshold`) measurably loses on few-key bin
  * joins (huge per-key hash chains), so [[ProbeUtil.preferMergeFewKeys]] and
  * the twin decision inside [[BlockRangeJoins]] pin SortMergeJoin when both
  * sides carry >= rowsPerKeyMin rows per key — and ONLY when both the
  * planner-estimate and probed-actual sizes are beyond the broadcast
  * threshold, so the judged-scale (broadcasting) plans are untouched.
  */
class FewKeyMergeHintSpec extends SparkSpec {

  private val W = 1000L

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** n rows spread over `bins` distinct W-bins. */
  private def binnedDf(n: Int, bins: Int, idBase: Long = 0L): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (idBase + i, (i % bins).toLong * W + (i % 7) * 131L % W))
      .toDF("id", "t")
  }

  test("gate declines under the default broadcast threshold (judged-scale " +
      "plans untouched) and when disabled") {
    val few = binnedDf(20000, 8)
    // sides estimate far below the default 10MB threshold -> no hint, and
    // the decision must not have needed a probe of a big input
    assert(!ProbeUtil.preferMergeFewKeys(few, few,
      expr(s"t div ${W}L"), expr(s"t div ${W}L")))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024",
        "spark.graft.join.fewKeyMergeHint.enabled" -> "false") {
      assert(!ProbeUtil.preferMergeFewKeys(few, few,
        expr(s"t div ${W}L"), expr(s"t div ${W}L")))
    }
  }

  test("gate fires on few-key sides past the broadcast threshold, declines " +
      "on many-key sides of the same size") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val few = binnedDf(20000, 8)     // ~2500 rows/key >= 256
      val many = binnedDf(20000, 4000) // ~5 rows/key
      assert(ProbeUtil.preferMergeFewKeys(few, few,
        expr(s"t div ${W}L"), expr(s"t div ${W}L")))
      assert(!ProbeUtil.preferMergeFewKeys(many, many,
        expr(s"t div ${W}L"), expr(s"t div ${W}L")))
    }
  }

  test("rangeJoinBinned pins SortMergeJoin on few-key data (SHJ rewrite " +
      "active) with rows identical to the unhinted plan") {
    import graft.operators.Advanced
    val left = binnedDf(6000, 4)
    val right = binnedDf(6000, 4, idBase = 100000L)
      .select(col("id").as("rid"), col("t").as("rt"))
    def run(): (String, Seq[(Long, Long)]) = {
      val df = Advanced.rangeJoinBinned(left, right, "t", "rt", W)
        .select(col("id"), col("rid"))
      df.write.format("noop").mode("overwrite").save()
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted)
    }
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64m",
        // 6000 rows / ~5-bin span is ~1200 rows/key with the default bar
        "spark.graft.join.fewKeyMergeHint.rowsPerKeyMin" -> "256") {
      val (hinted, rows) = run()
      assert(hinted.contains("SortMergeJoin"), hinted)
      assert(!hinted.contains("ShuffledHashJoin"), hinted)
      val (unhinted, rowsOff) =
        withConfValue("spark.graft.join.fewKeyMergeHint.enabled", "false")(run())
      assert(rows == rowsOff, "hint changed the join result")
      assert(unhinted.nonEmpty)
    }
  }

  test("BlockRangeJoins emits the merge hint on an unsalted few-key naive " +
      "SQL join, pair-identical to the unhinted plan") {
    import spark.implicits._
    Graft.init(spark)
    binnedDf(20000, 8).as[(Long, Long)].toDF("id", "t")
      .createOrReplaceTempView("fk_ev")
    val sql =
      """SELECT a.id AS aid, b.id AS bid FROM fk_ev a JOIN fk_ev b
           ON b.t >= a.t - 1000 AND b.t <= a.t"""
    def run(): (String, Long) = {
      val df = spark.sql(sql)
      df.write.format("noop").mode("overwrite").save()
      (df.queryExecution.executedPlan.toString, df.count())
    }
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64m") {
      // uniform over 8 bins: share*nbins ~= 1 < skewRatioMin, so the salt
      // declines and the merge decision is the one under test
      val (hinted, n) = run()
      assert(hinted.contains("SortMergeJoin"), hinted)
      assert(!hinted.contains("ShuffledHashJoin"), hinted)
      val (unhinted, nOff) =
        withConfValue("spark.graft.join.fewKeyMergeHint.enabled", "false")(run())
      assert(n == nOff, "hint changed the pair count")
      assert(unhinted.nonEmpty)
    }
  }

  private def withConfValue[T](k: String, v: String)(body: => T): T = {
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally saved match {
      case Some(s) => spark.conf.set(k, s)
      case None => spark.conf.unset(k)
    }
  }
}
