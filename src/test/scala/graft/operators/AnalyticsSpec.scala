package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("basket lift matches a hand-computed contingency table") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // 4 baskets: {a,b} {a,b} {a} {b}  →  n_ab=2, n_a=3, n_b=3, N=4
    val events = Seq(
      (1L, ts(1), "a"), (1L, ts(1), "b"),
      (2L, ts(1), "a"), (2L, ts(1), "b"),
      (1L, ts(2), "a"), (2L, ts(2), "b"))
      .toDF("user_id", "ts", "event_type")
    // run the same plan the QueryDef builds, against the local frame
    val b = events.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type")).distinct()
    val nb = b.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("nb"))
    val sup = b.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = b.as("a")
      .join(b.as("b2"), col("a.user_id") === col("b2.user_id") &&
        col("a.day") === col("b2.day") &&
        col("a.event_type") < col("b2.event_type"))
      .groupBy(col("a.event_type").as("x"), col("b2.event_type").as("y"))
      .agg(count(lit(1)).as("n_xy"))
      .crossJoin(nb)
      .join(sup.withColumnRenamed("event_type", "sx").withColumnRenamed("n", "n_x"),
        col("sx") === col("x"))
      .join(sup.withColumnRenamed("event_type", "sy").withColumnRenamed("n", "n_y"),
        col("sy") === col("y"))
      .select(col("x"), col("y"), col("n_xy"),
        (col("n_xy").cast("double") * col("nb") /
          (col("n_x") * col("n_y"))).as("lift"))
      .collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("a", "b", 2L))
    assert(r.getDouble(3) == 2.0 * 4 / (3 * 3))
  }

  test("basket lift over the fixtures emits every unordered type pair once") {
    val rows = Analytics.basketQ.run(spark, sf("sf0.001")).collect()
    val types = Tables.events(spark, sf("sf0.001"))
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2)
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    assert(rows.forall(_.getDouble(3) > 0.0))
  }

  test("session overlap join equals the quadratic theta join (exactly-once emission)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val sess = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("brk", when(lag(col("ts_us"), 1).over(w).isNull ||
        col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("s0"), max(col("ts_us")).as("s1"))
    // quadratic reference: every session pair checked directly
    val brute = sess.as("a").join(sess.as("b"),
        col("a.user_id") =!= col("b.user_id") &&
          col("a.s0") <= col("b.s1") && col("b.s0") <= col("a.s1"))
      .groupBy(col("a.user_id").as("u"), col("a.s0").as("t0"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Analytics.sessionOverlapQ.run(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("bucketize: deciles are balanced and monotone in value") {
    val rows = Analytics.bucketizeQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vals = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // monotone: a higher value never lands in a lower bucket
    val byBucket = vals.groupBy { case (id, _) => rows(id) }
    for (b <- 0 to 8 if byBucket.contains(b) && byBucket.contains(b + 1))
      assert(byBucket(b).map(_._2).max <=
        byBucket(b + 1).map(_._2).min + 1e-4, s"bucket $b overlaps ${b + 1}")
    // balanced: each decile holds ~10% of rows
    val n = vals.length
    (0 to 9).foreach { b =>
      val c = byBucket.get(b).map(_.length).getOrElse(0)
      assert(math.abs(c - n / 10.0) <= n * 0.02, s"bucket $b holds $c of $n")
    }
  }

  test("inverted postings: df/cf consistent with the raw token stream") {
    val posts = Retrieval.postingsQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sf("sf0.001"))
    val nDocs = docs.count()
    posts.foreach { case (t, (df, cf, maxTf)) =>
      assert(df >= 1 && df <= nDocs, s"$t df")
      assert(cf >= df && maxTf >= 1 && cf >= maxTf, s"$t cf/max_tf")
    }
    // total collection frequency == total token count
    val totalToks = docs.select(
      sum(size(graft.functions.Text.tokens(col("text"))))).head().getLong(0)
    assert(posts.values.map(_._2).sum == totalToks)
  }

  test("running distinct count: monotone per type, ends at the exact distinct total") {
    val rows = Relational.runningDistinct.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = Tables.events(spark, sf("sf0.001"))
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (tpe, series) =>
      val ordered = series.sortBy(t => (t._2, t._3)).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => b >= a },
        s"$tpe not monotone")
      assert(ordered.head == 1 && ordered.last == want(tpe), tpe)
    }
  }

  test("gini: zero for perfect equality, approaches 1 for full concentration") {
    import spark.implicits._
    import graft.functions.Num
    def gini(counts: Seq[Long]): Double = {
      val df = counts.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("user_id", "n")
      LmData.globalRowNumber(df, "n", "user_id", 16L)
        .agg(count(lit(1)).as("nu"), sum(col("n")).as("tot"),
          sum(col("pos") * col("n")).as("ws"))
        .select(Num.pround((lit(2.0) * col("ws") -
          (col("nu") + lit(1.0)) * col("tot")) /
          (col("nu") * col("tot").cast("double")), 6))
        .head().getDouble(0)
    }
    assert(gini(Seq.fill(50)(7L)) == 0.0)
    assert(gini(Seq.fill(49)(0L) :+ 1000L) > 0.9)
    // fixture sanity: bounded and matching the catalog query
    val r = Analytics.giniQ.run(spark, sf("sf0.001")).head()
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("churn: final week churns nobody; churned users verifiably absent next week") {
    val rows = Analytics.churnQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lastWk = rows.map(_._1).max
    rows.filter(_._1 == lastWk).foreach { case (_, t, _, churned) =>
      assert(churned == 0, s"final week must not churn ($t)")
    }
    assert(rows.exists(r => r._1 < lastWk && r._4 > 0), "no churn observed")
    rows.foreach { case (_, _, active, churned) => assert(churned <= active) }
    // cross-check one cell against a direct computation
    val a = Tables.events(spark, sf("sf0.001"))
      .select(expr("unix_micros(ts) div 604800000000").as("wk"),
        col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val (wk, tpe, _, want) = rows.filter(r => r._1 < lastWk).maxBy(_._4)
    val got = a.count { case (w, t, u) =>
      w == wk && t == tpe && !a.contains((wk + 1, tpe, u))
    }
    assert(got.toLong == want, s"cell ($wk, $tpe)")
  }

  test("correlation is bounded and matches Spark's built-in corr closely") {
    val rows = Analytics.corrQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.values.foreach(r => assert(r >= -1.0 && r <= 1.0))
    val builtin = Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("value").as("x"),
        ((unix_micros(col("ts")) % 86400000000L).cast("double") /
          3600000000L).as("y"))
      .groupBy("event_type").agg(corr(col("x"), col("y")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rows carry the 4-decimal oracle rounding; builtin is unrounded
    rows.foreach { case (t, r) =>
      assert(math.abs(r - builtin(t)) <= 5.001e-5, s"$t: $r vs ${builtin(t)}")
    }
  }

  test("pareto shares are monotone and end at exactly 1") {
    val rows = Analytics.paretoQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._3)
    assert(rows.map(_._3).zip(rows.map(_._3).tail)
      .forall { case (a, b) => b > a }, "cumulative share must increase")
    assert(rows.last._3 == 1.0, s"final share ${rows.last._3}")
    assert(rows.forall(_._2 > 0))
  }

  test("conversion latency: ordered percentiles over verifiably-positive gaps") {
    val r = Analytics.convLatencyQ.run(spark, sf("sf0.001")).head()
    val (n, med, p90) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0 && med > 0 && p90 >= med)
    val viewers = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(n <= viewers, "cannot convert more users than viewed")
  }

  test("gap fill: complete hourly grid, zeros on gaps, forward fill carries") {
    val rows = Analytics.gapfillQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    val types = rows.map(_._1).distinct
    val hours = rows.map(_._2).distinct.sorted
    assert(rows.length == types.length * hours.length, "full grid")
    assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600 },
      "contiguous hourly grid")
    val gaps = rows.filter(_._3 == 0)
    assert(gaps.nonEmpty, "fixtures contain hour gaps at sf0.001")
    // forward fill: a zero-count row after any observation carries a value
    types.foreach { t =>
      val series = rows.filter(_._1 == t).sortBy(_._2)
      var seen = false
      var carried: Option[Double] = None
      series.foreach { case (_, _, n, v) =>
        if (n > 0) { seen = true; carried = v }
        else if (seen) assert(v == carried, s"$t carries the last mean")
        else assert(v.isEmpty, s"$t has no value before first observation")
      }
    }
  }
}
