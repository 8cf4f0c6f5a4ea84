package graft.operators

import graft.SparkSpec
import graft.functions.{HeavyHittersAgg, SpaceSavingAggregator}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("space-saving in the approximate regime honors its guarantees on a " +
      "skewed stream, under any partitioning") {
    import spark.implicits._
    // zipf-ish: key k appears ~ 6000/k times, 200 distinct keys, capacity 32
    val stream = (1 to 200).flatMap(k => Seq.fill(6000 / k)(k.toLong))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val capacity = 32
    for (parts <- Seq(1, 4, 13)) {
      val hh = stream.toDF("k").repartition(parts)
        .agg(HeavyHittersAgg.heavy_hitters(col("k"), capacity).as("hh"))
        .select(explode(col("hh")).as(Seq("k", "est")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hh.size <= capacity)
      val eps = n.toDouble / capacity
      // every true heavy hitter above N/capacity survives
      truth.filter(_._2 > eps).keys.foreach { k =>
        assert(hh.contains(k), s"lost heavy hitter $k at parts=$parts")
      }
      // sequential SS strictly over-counts; the truncating merge of
      // partials can also drop a key's minority-partition mass, so the
      // merged bound is symmetric: |est - true| <= eps per layer
      hh.foreach { case (k, est) =>
        val t = truth.getOrElse(k, 0L)
        if (parts == 1) assert(est >= t, s"under-count for $k sequentially")
        assert(math.abs(est - t) <= eps * parts,
          s"estimate $est vs true $t for $k at parts=$parts")
      }
    }
  }

  test("space-saving aggregates incrementally over a stream (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = input.toDS().toDF("k")
      .agg(HeavyHittersAgg.heavy_hitters(col("k"), 8).as("hh"))
      .select(explode(col("hh")).as(Seq("k", "est")))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ss_stream_t").start()
    try {
      input.addData(1L, 1L, 2L)
      q.processAllAvailable()
      input.addData(1L, 3L, 3L, 3L)
      q.processAllAvailable()
      val out = spark.table("ss_stream_t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // exact regime across batches: state carries the earlier counts
      assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 3L), out.toString)
    } finally q.stop()
  }

  test("HLL sketches merge: per-day partials union to the same estimate as " +
      "one pass, within the configured error") {
    import graft.sources.Tables
    val ev = Tables.events(spark, sf("sf0.001"))
    // partial sketches per day, then union — the reaggregation shape exact
    // distinct cannot do (you cannot merge exact distinct counts)
    val merged = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val onePass = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .head().getLong(0)
    val exact = ev.select("user_id").distinct().count()
    assert(merged == onePass, "sketch union must equal the one-pass sketch")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("space-saving exact regime: capacity >= distinct keys reproduces counts") {
    val agg = SpaceSavingAggregator(16)
    val stream = Seq(1L, 2L, 1L, 3L, 1L, 2L)
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // merge of disjoint exact partials is lossless
    val b2 = Seq(4L, 4L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(buf, b2)) ==
      Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("space-saving eviction picks the LARGEST key among minimum counts " +
      "and the newcomer inherits min + 1") {
    val agg = SpaceSavingAggregator(2)
    // [1,2,3]: at capacity {1:1, 2:1}; 3 evicts key 2 (tie on count 1 ->
    // largest key), inheriting 1+1
    val buf = Seq(1L, 2L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Map(1L -> 1L, 3L -> 2L))
    // the bucket index stays consistent across subsequent evictions:
    // 4 evicts key 1 (the sole count-1 minimum) and inherits 1+1
    val buf2 = agg.reduce(buf, 4L)
    assert(agg.finish(buf2) == Map(3L -> 2L, 4L -> 2L))
  }

  test("heavy_hitters_eps report: all five guarantees pass on a skewed " +
      "synthetic corpus under ANY forced partitioning — the invariance the " +
      "oracle gate relies on") {
    import spark.implicits._
    // the catalog entry's derived-skew shape in miniature: two heavy keys
    // at 25% of N each (users 0 and 21 — residues 0 and 1 mod 20, far
    // above the 2N/m = 500 hitter threshold at m=16), and a per-event
    // unique tail (users ≡ 7 mod 20) of 2000 distinct keys that forces
    // eviction on nearly every arrival
    val rows = (0 until 4000).map { i =>
      val user = if (i % 4 == 0) 0L else if (i % 4 == 1) 21L else 20L * i + 7
      (i.toLong /* event_id */, user /* user_id */)
    }
    val all = Set("hitters_all_present", "hitters_never_undercounted",
      "overcount_le_n_over_m", "regime_overcapacity", "size_le_capacity")
    for (parts <- Seq(1, 5, 17)) {
      val ev = rows.toDF("event_id", "user_id").repartition(parts)
      val got = Sketches.heavyHittersEpsReport(ev, m = 16)
        .collect().map(_.getString(0)).toSet
      assert(got == all, s"guarantees violated at parts=$parts: " +
        s"missing ${all -- got}")
    }
  }

  test("heavy_hitters_user bridges regimes: exact top-10 below the clamp, " +
      "the ε-guarantee report above it — one entry, no raise (r12 item 3)") {
    import spark.implicits._
    // exact branch: 30 distinct users under a clamp of 4096
    val small = (0 until 600).map(i => (i.toLong, (i % 30).toLong))
      .toDF("event_id", "user_id")
    val exact = Sketches.heavyHittersUserReport(spark, small, clamp = 4096)
      .collect()
    assert(exact.length == 10)
    assert(exact.forall(r => r.getString(0) == "exact" && r.isNullAt(3)))
    assert(exact.forall(_.getLong(2) == 20L)) // 600 events / 30 users
    // ε branch: 2000 distinct users forced past a clamp of 16 — the SAME
    // catalog entry degrades to the guarantee report instead of raising
    val big = (0 until 4000).map(i => (i.toLong, (i % 2000).toLong))
      .toDF("event_id", "user_id")
    val eps = Sketches.heavyHittersUserReport(spark, big, clamp = 16)
      .collect()
    assert(eps.map(_.getString(3)).toSet == Set("hitters_all_present",
      "hitters_never_undercounted", "overcount_le_n_over_m",
      "regime_overcapacity", "size_le_capacity"), eps.mkString(","))
    assert(eps.forall(r => r.getString(0) == "eps" && r.isNullAt(1) &&
      r.isNullAt(2)))
  }

  test("heavy_hitters_eps report can FAIL: an exact-regime run drops the " +
      "regime_overcapacity row (the gate detects a vacuous demonstration)") {
    import spark.implicits._
    // 30 distinct derived keys with capacity 4096 -> no eviction ever; the
    // four bound checks hold trivially but the regime row must vanish,
    // proving a violated guarantee surfaces as a missing row (the oracle's
    // hash mismatch), not as a silent pass
    val ev = (0 until 600).map(i => (i.toLong, (i % 30).toLong))
      .toDF("event_id", "user_id")
    val got = Sketches.heavyHittersEpsReport(ev, m = 4096)
      .collect().map(_.getString(0)).toSet
    assert(!got.contains("regime_overcapacity"), got)
    assert(got.contains("hitters_all_present") &&
      got.contains("overcount_le_n_over_m"), got)
  }
}
