package graft.operators

import graft.SparkSpec
import graft.functions.ZValue
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("ZValue.compute matches a bit-by-bit reference interleave") {
    def reference(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (0xABCDL, 0x1234L), (70000L, 3L)) // >16 bits masks
    cases.foreach { case (x, y) =>
      assert(ZValue.compute(x, y) == reference(x, y), s"($x, $y)")
    }
    // Z-order locality: adjacent cells in either dimension stay within the
    // enclosing quad (the property file-level min/max pruning relies on)
    assert(ZValue.compute(2L, 3L) == 14L && ZValue.compute(3L, 3L) == 15L)
  }

  test("zvalue expression evaluates inside codegen and matches compute") {
    // a parquet-backed plan (not a local relation, which the optimizer would
    // constant-fold at plan time): the expression must run INSIDE codegen
    val df = Warehouse.zorder.run(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Project [... zvalue(...)]": the starred stage IS WholeStageCodegen
    assert(plan.contains("*(1) Project") && plan.contains("zvalue("), plan)
    df.collect().foreach { r =>
      assert(r.getLong(3) == ZValue.compute(r.getLong(1), r.getLong(2)))
    }
  }

  test("repartitionByRange on the z key yields a range-partitioned layout") {
    val df = Warehouse.zorder.run(spark, sf("sf0.001"))
      .repartitionByRange(4, col("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(z"), plan)
    // each output file would carry a tight z min/max: partitions are sorted
    // and non-overlapping in z
    val ranges = df.select(spark_partition_id().as("p"), col("z"))
      .groupBy(col("p")).agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy(col("lo")).collect()
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"overlapping z ranges: $a $b")
      case _ =>
    }
  }

  test("scd2 intervals tile each user's timeline without gaps or overlaps") {
    val rows = Warehouse.scd2.run(spark, sf("sf0.001"))
      .orderBy(col("user_id"), col("valid_from_us")).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, ivs) =>
      ivs.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3), "only the last interval may be open")
          assert(a.getLong(3) == b.getLong(2), s"gap/overlap: $a -> $b")
        case _ =>
      }
      assert(ivs.last.isNullAt(3), "last interval must be open-ended")
      // consecutive intervals always change status (else not compressed)
      ivs.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ =>
      }
    }
  }

  test("merge arms partition the key space: insert/keep/update are disjoint and exhaustive") {
    val out = Warehouse.merge.run(spark, sf("sf0.001")).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length, "one row per key")
    val events = graft.sources.Tables.events(spark, sf("sf0.001"))
    val allUsers = events.select("user_id").distinct().count()
    assert(out.length == allUsers, "every user present in the merged state")
    assert(out.forall(r => Set("insert", "keep", "update")(r.getString(2))))
  }

  test("markov rows are per-cur probability distributions summing to ~1") {
    val rows = Warehouse.markov.run(spark, sf("sf0.001")).collect()
    rows.groupBy(_.getString(0)).foreach { case (cur, ts) =>
      val total = ts.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-2, s"$cur sums to $total")
    }
  }

  test("compaction plan: bins cover every file, in order, near the target size") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val files = (1L to 5000L).map(i => (i, 1000L + rng.nextInt(200000)))
    val target = 10000000L
    val bins = Warehouse.compactionPlan(
        files.toDF("file_id", "bytes"), target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(bins.map(_._2).sum == files.length, "every file assigned")
    assert(bins.map(_._1).toSeq == bins.indices.map(_.toLong), "dense bin ids")
    val maxFile = files.map(_._2).max
    // a file opens in the bin where its first byte lands, so a bin overshoots
    // by at most one file and undershoots only if the next file opened late
    bins.dropRight(1).foreach { case (b, _, total) =>
      assert(total < target + maxFile, s"bin $b overshoots: $total")
      assert(total > target - maxFile, s"bin $b undershoots: $total")
    }
    assert(bins.map(_._3).sum == files.map(_._2).sum, "bytes conserved")
  }

  test("snapshot diff arms are disjoint, exhaustive, and honest about 'added'") {
    val rows = Warehouse.snapshotDiff.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2), r.getString(3)))
    val users = graft.sources.Tables.events(spark, sf("sf0.001"))
      .select("user_id").distinct().count()
    assert(rows.length == users, "one diff row per current user")
    rows.foreach { case (u, old, nw, change) =>
      change match {
        case "added" => assert(old.isEmpty, s"user $u")
        case "changed" => assert(old.isDefined && old.get != nw, s"user $u")
        case "unchanged" => assert(old.contains(nw), s"user $u")
        case other => fail(s"unknown arm $other")
      }
    }
    assert(rows.count(_._4 == "changed") > 0)
  }

  test("snapshot diff emits 'added' for keys born after the cutoff") {
    // synthetic check of the arm the fixtures don't exercise: run the same
    // SQL shape over a frame where user 2 only appears post-cutoff
    import spark.implicits._
    val e = Seq((1L, "x", 1L, 1L), (1L, "y", 9L, 2L), (2L, "z", 9L, 3L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    def latest(df: org.apache.spark.sql.DataFrame, as: String) =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as(as))
    val old = latest(e.filter(col("ts_us") < 5L), "old_status")
      .withColumnRenamed("user_id", "o_user")
    val got = latest(e, "new_status")
      .join(old, col("user_id") === col("o_user"), "left_outer")
      .select(col("user_id"),
        when(col("o_user").isNull, "added")
          .when(col("old_status") =!= col("new_status"), "changed")
          .otherwise("unchanged").as("change"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "added"))
  }

  test("k-anonymity report agrees with a direct class-size computation") {
    val r = Warehouse.kAnonymity.run(spark, sf("sf0.001")).head()
    val sizes = graft.sources.Tables.customer(spark, sf("sf0.001"))
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .collect().map(_.getLong(2))
    assert(r.getLong(0) == sizes.length)
    assert(r.getLong(1) == sizes.min)
    assert(r.getLong(2) == sizes.count(_ < 5))
    assert(r.getLong(3) == sizes.filter(_ < 5).sum)
  }

  test("l-diversity report agrees with a direct distinct-sensitive count") {
    val r = Warehouse.lDiversity.run(spark, sf("sf0.001")).head()
    val c = graft.sources.Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val cls = graft.sources.Tables.orders(spark, sf("sf0.001"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("o_orderpriority"))
      .collect()
      .groupBy(row => (row.getInt(0), row.getString(1)))
      .toSeq // BEFORE map: mapping a Map to (l_div, n) pairs would dedupe
      .map { case (_, rows) =>
        (rows.map(_.getString(2)).distinct.length.toLong, rows.length.toLong)
      }
    assert(r.getLong(0) == cls.length)
    assert(r.getLong(1) == cls.map(_._1).min)
    assert(r.getLong(2) == cls.count(_._1 < 3))
    assert(r.getLong(3) == cls.filter(_._1 < 3).map(_._2).sum)
  }

  test("t-closeness report agrees with a direct TVD computation") {
    val r = Warehouse.tCloseness.run(spark, sf("sf0.001")).head()
    val c = graft.sources.Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val rows = graft.sources.Tables.orders(spark, sf("sf0.001"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("o_orderpriority"))
      .collect()
      .map(row => ((row.getInt(0), row.getString(1)), row.getString(2)))
    val n = rows.length.toLong
    val nV = rows.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val perClass = rows.groupBy(_._1).toSeq.map { case (_, g) =>
      val nC = g.length.toLong
      val nCv = g.groupBy(_._2).map { case (v, h) => v -> h.length.toLong }
      // exact numerator Σ_v |n_cv·N − n_v·n_c|, then the one pinned division
      val num = nV.map { case (v, nv) =>
        math.abs(nCv.getOrElse(v, 0L) * n - nv * nC).toDouble
      }.sum
      val tvd = math.floor(num / (2.0 * nC * n) * 1e4 + 0.5) / 1e4
      (tvd, nC)
    }
    assert(r.getLong(0) == perClass.length)
    assert(r.getDouble(1) == perClass.map(_._1).max)
    assert(r.getLong(2) == perClass.count(_._1 > 0.2))
    assert(r.getLong(3) == perClass.filter(_._1 > 0.2).map(_._2).sum)
    // TVD is a distance: every class lands in [0, 1], and the audited table
    // is not degenerate (some class differs from the global distribution)
    assert(perClass.forall(p => p._1 >= 0.0 && p._1 <= 1.0))
    assert(r.getDouble(1) > 0.0)
  }

  test("observed DQ metrics ride an unrelated action and equal dq_report's " +
      "standalone counts") {
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
    val (observed, obs) = Warehouse.observedLineitemChecks(li)
    // the action is a DIFFERENT aggregation — the metrics are free riders
    val revenue = observed.agg(sum(col("l_extendedprice"))).head().getDouble(0)
    assert(revenue > 0)
    val m = obs.get
    assert(m("n_rows") == li.count())
    assert(m("qty_out_of_range") ==
      li.filter(col("l_quantity") < 1 || col("l_quantity") > 50).count())
    assert(m("price_nonpositive") == 0L)
    assert(m("discount_gt_5pct") ==
      li.filter(col("l_discount") > 0.05).count())
    // agrees with the standalone dq_report audit rows
    val dq = Warehouse.dqReport.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("qty_out_of_range") == dq("lineitem_qty_out_of_range"))
    assert(m("discount_gt_5pct") == dq("lineitem_discount_gt_5pct"))
  }

  test("dp release: noise bounded by the ladder, nonzero somewhere, " +
      "clamped at zero, and rerun-identical") {
    val key = (r: org.apache.spark.sql.Row) => (r.getInt(0), r.getString(1))
    val got = Warehouse.dpRelease.run(spark, sf("sf0.001")).collect()
      .map(r => key(r) -> r.getLong(2)).toMap
    val truth = graft.sources.Tables.customer(spark, sf("sf0.001"))
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .collect().map(r => key(r) -> r.getLong(2)).toMap
    assert(got.keySet == truth.keySet)
    // discrete-Laplace ladder folds its tail into ±8; released counts are
    // post-processed to >= 0
    got.foreach { case (k, rel) =>
      assert(rel >= 0L && math.abs(rel - truth(k)) <= 8L, s"$k: $rel")
    }
    // the mechanism actually perturbs: ~54% of classes get nonzero noise
    assert(got.exists { case (k, rel) => rel != truth(k) })
    val again = Warehouse.dpRelease.run(spark, sf("sf0.001")).collect()
      .map(r => key(r) -> r.getLong(2)).toMap
    assert(again == got)
  }

  test("dq_report counts agree with directly-filtered counts") {
    val got = Warehouse.dqReport.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
    val o = graft.sources.Tables.orders(spark, sf("sf0.001"))
    assert(got("lineitem_qty_out_of_range") ==
      li.filter(col("l_quantity") < 1 || col("l_quantity") > 50).count())
    assert(got("lineitem_discount_gt_5pct") ==
      li.filter(col("l_discount") > 0.05).count())
    assert(got("orders_price_gt_400k") ==
      o.filter(col("o_totalprice") > 400000).count())
    // the generator's referential integrity holds — the checks prove it
    assert(got("orders_orphan_custkey") == 0L)
    assert(got("lineitem_orphan_orderkey") == 0L)
    // at least one distribution guard actually fires (the report counts)
    assert(got("lineitem_discount_gt_5pct") > 0L)
    assert(got.size == 7)
  }
}
