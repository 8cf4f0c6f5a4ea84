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
}
