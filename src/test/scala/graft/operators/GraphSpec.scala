package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pagerank step matches a hand-computed 3-node graph") {
    // a->b (w2), a->c (w1), b->c (w1): wout(a)=3, wout(b)=1; c dangling
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pagerankStep(edges, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val n = 3.0
    def pr(cs: Double) = math.floor((0.15 / n + 0.85 * cs / n) * 1e6 + 0.5) / 1e6
    assert(got("a") == pr(0.0))            // no in-edges
    assert(got("b") == pr(2.0 / 3.0))      // from a: 2/3
    assert(got("c") == pr(1.0 / 3.0 + 1.0)) // from a: 1/3, from b: 1
  }

  test("pagerank mass: step conserves all non-dangling mass") {
    val rows = Graph.pagerankQ.run(spark, sf("sf0.001")).collect()
    val total = rows.map(_.getDouble(1)).sum
    // total = 0.15 + 0.85 * (non-dangling fraction); every corpus token
    // also occurs as a bigram source here, so mass is fully conserved
    assert(math.abs(total - 1.0) < 1e-3, s"total mass $total")
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("10-step chained plan matches an in-memory power iteration") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("text")).as[String].collect()
    val edges = docs.flatMap(_.trim.toLowerCase.split("\\s+").sliding(2)
      .collect { case Array(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nodes = edges.keysIterator.flatMap { case (a, b) => Iterator(a, b) }.toSet
    val n = nodes.size
    val wout = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def rnd(x: Double, p: Int) = { val f = math.pow(10, p); math.floor(x * f + 0.5) / f }
    var pr: Map[String, Double] = nodes.iterator.map(_ -> 1.0 / n).toMap
    for (k <- 1 to 10) {
      val cs = edges.toSeq.groupBy(_._1._2).view.mapValues(_.map {
        case ((u, _), w) => pr(u) * (w.toDouble / wout(u))
      }.sum).toMap
      pr = nodes.iterator.map(v =>
        v -> rnd(0.15 / n + 0.85 * cs.getOrElse(v, 0.0),
          if (k == 10) 6 else 9)).toMap
    }
    val got = Graph.pagerank10Q.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // per-step rounding pins both computations to the same trajectory; the
    // only slack is the final sum's last-ulp aggregation order
    assert(got.keySet == pr.keySet)
    got.foreach { case (v, p) => assert(math.abs(p - pr(v)) <= 1e-6, v) }
  }

  test("a token attracting more transitions outranks a rare one") {
    val got = Graph.pagerankQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // in-mass per node from the raw bigram stream
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("text")).as[String].collect()
    val inCount = docs.flatMap(_.trim.toLowerCase.split("\\s+").sliding(2)
      .collect { case Array(_, b) => b })
      .groupBy(identity).view.mapValues(_.length).toMap
    val hot = inCount.maxBy(_._2)._1
    val cold = inCount.minBy(_._2)._1
    assert(got(hot) > got(cold))
  }

  test("triangles: each exactly once in (a<b<c) order, matching brute force") {
    val got = Graph.trianglesQ.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.length == got.distinct.length)
    got.foreach { case (a, b, c) => assert(a < b && b < c, s"($a,$b,$c)") }
    // brute force over the collected undirected edge set
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("text")).as[String].collect()
    val edges = docs.flatMap(_.trim.toLowerCase.split("\\s+").sliding(2)
      .collect { case Array(x, y) if x != y =>
        (if (x < y) x else y, if (x < y) y else x) }).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((a, c)) && edges((b, c))
    } yield (a, b, c)
    assert(got.toSet == brute.toSet)
    assert(brute.nonEmpty)
  }

  test("clustering spectrum: planted K4+pendant gives C(3)=1, C(4)=0.5, " +
      "and sf0.001 matches per-node brute force") {
    // K4 on {a,b,c,d} (4 triangles, every pair an edge) + pendant e on a:
    // deg(a)=4 with T_a=3 -> C=0.5; deg(b,c,d)=3 with T=3 each -> C=1.0;
    // e has deg 1 and is excluded from the spectrum
    val pe = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("a", "e"))
    val tmp = java.nio.file.Files.createTempDirectory("ccoef_fixture").toString
    pe.zipWithIndex
      .map { case ((u, v), i) => (i.toLong, s"$u $v", "en", "src0", 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val got = Graph.clusteringQ.run(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(3L -> ((3L, 9L, 1.0)), 4L -> ((1L, 3L, 0.5))), s"$got")

    // sf0.001: spectrum recomputed from brute-force triangles and degrees
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("text")).as[String].collect()
    val edges = docs.flatMap(_.trim.toLowerCase.split("\\s+").sliding(2)
      .collect { case Array(x, y) if x != y =>
        (if (x < y) x else y, if (x < y) y else x) }).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tPer = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((a, c)) && edges((b, c))
    } { tPer(a) += 1; tPer(b) += 1; tPer(c) += 1 }
    val degOf = nodes.map(n => n -> edges.count(e => e._1 == n || e._2 == n))
    val want = degOf.filter(_._2 >= 2).groupBy(_._2).map { case (k, g) =>
      val ts = g.map(p => tPer(p._1)).sum
      val n = g.length.toLong
      k.toLong -> ((n, ts,
        math.floor(2.0 * ts / (n * k * (k - 1)) * 1e6 + 0.5) / 1e6))
    }
    val sfGot = Graph.clusteringQ.run(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(sfGot == want, s"spectrum drifted")
    assert(want.nonEmpty)
  }

  test("assortativity: regular graph (zero degree variance) emits NULL r " +
      "instead of ANSI divide-by-zero — the r10 sf1 saturation case") {
    // a 4-cycle is 2-regular: every endpoint degree is 2, variance is 0,
    // Pearson r is undefined. At 10x corpus the 40-token vocabulary graph
    // saturates toward complete (regular), which is how the sf1 sweep
    // surfaced this as a DIVIDE_BY_ZERO instead of a result row.
    val pe = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val tmp = java.nio.file.Files.createTempDirectory("assort_fixture").toString
    pe.zipWithIndex
      .map { case ((u, v), i) => (i.toLong, s"$u $v", "en", "src0", 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val rows = Graph.assortativityQ.run(spark, tmp).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 8L) // 4 undirected edges x 2 directions
    assert(rows(0).isNullAt(1), s"expected NULL r, got ${rows(0)}")
    // the non-degenerate path still yields a value on sf0.001
    val sfRows = Graph.assortativityQ.run(spark, sf("sf0.001")).collect()
    assert(!sfRows(0).isNullAt(1))
  }

  test("kcore: planted cycle survives peeling, pendant chains peel away, " +
      "and the result matches brute-force iterated peeling") {
    // triangle (x,y,z) + square (p,q,r,s) with pendant chains hanging off:
    // the 2-core is exactly the two cycles; the chains need several rounds
    val edges = Seq(
      ("x", "y"), ("y", "z"), ("x", "z"),            // triangle
      ("p", "q"), ("q", "r"), ("r", "s"), ("p", "s"), // square
      ("z", "c1"), ("c1", "c2"), ("c2", "c3"),        // 3-deep pendant chain
      ("q", "d1"), ("d1", "d2"))                      // 2-deep pendant chain
    val tmp = java.nio.file.Files.createTempDirectory("kcore_fixture").toString
    edges.zipWithIndex
      .map { case ((u, v), i) => (i.toLong, s"$u $v", "en", "src0", 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val got = Graph.kcoreQ.run(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute-force iterated peeling over the undirected edge set
    var es = edges.map { case (u, v) =>
      (if (u < v) u else v, if (u < v) v else u) }.toSet
    var done = false
    while (!done) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      done = next == es; es = next
    }
    val want = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got.keySet == Set("x", "y", "z", "p", "q", "r", "s"))
    assert(got.values.forall(_ == 2L)) // both cores are pure cycles

    // the distributed localCheckpoint loop (forced past the size gate)
    // returns the identical core — and its per-round lineage truncation is
    // what keeps the plan constant-size over ~3 peeling rounds here
    val edgeDf = edges.map { case (u, v) =>
      (if (u < v) u else v, if (u < v) v else u) }.distinct
      .toDF("a", "b")
    val dist = Graph.kcore(edgeDf, 2, broadcastThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == want, s"distributed path drifted: $dist")
  }

  test("jaccard neighbors: degree-oriented wedge count equals brute-force " +
      "set intersection, including through a hub") {
    // planted graph with a hub h touching everything (the Σ deg² shape the
    // wedge orientation exists to avoid), written as fake 2-token docs so
    // the query's own bigramEdges path builds the graph
    val edges = Seq(
      ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"), ("h", "e"), ("h", "f"),
      ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e"))
    val tmp = java.nio.file.Files.createTempDirectory("jac_fixture").toString
    edges.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, s"$x $y", "en", "src0", 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val got = Graph.jaccardQ.run(spark, tmp).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // brute force: neighbor sets over the undirected edge set
    val und = edges.map { case (x, y) =>
      (if (x < y) x else y, if (x < y) y else x) }.toSet
    val nbr = und.toSeq.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = und.toSeq.flatMap { case (a, b) =>
      val c = (nbr(a) & nbr(b)).size
      if (c == 0) None
      else Some((a, b) -> (c.toLong,
        math.floor(c.toDouble / (nbr(a).size + nbr(b).size - c) * 1e4 + 0.5) / 1e4))
    }.toMap
    assert(got == brute, s"got $got\nwant $brute")
    assert(brute.nonEmpty && brute.values.exists(_._1 > 1))
  }
}
