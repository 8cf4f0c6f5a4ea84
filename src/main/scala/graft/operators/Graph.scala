package graft.operators

import graft.QueryDef
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables — the family beyond connected components
  * ([[Dedup.dedupClusters]]'s label propagation): one damped PageRank
  * iteration as a pure relational plan. An N-step PageRank is this plan
  * iterated with the rank table fed back in — the driver loop stays tiny
  * (one DataFrame per step, like the label-propagation fixpoint), while every
  * step is a distributed join + aggregation.
  *
  * Scale design (100 TB of edges): one shuffle by src for out-weights, one
  * join back to edges (same key — Catalyst reuses the partitioning), one
  * shuffle by dst for the contribution sum; the node-count is a broadcast
  * scalar. No adjacency is ever collected; rank mass moves as rows.
  */
object Graph {

  /** One damped-PageRank step from the uniform distribution over a weighted
    * edge list: pr1(v) = d/N + (1-d) * Σ_{(u,v,w)} (1/N) * w / wout(u). */
  def pagerankStep(edges: DataFrame, damping: Double): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val contrib = edges.join(outw, "src")
      .select(col("dst").as("node"),
        (col("w").cast("double") / col("wout")).as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("cs"))
    nodes.join(contrib, Seq("node"), "left_outer")
      .crossJoin(broadcast(nn))
      .select(col("node"),
        Num.pround(lit(1.0 - damping) / col("n") +
          (lit(damping) * coalesce(col("cs"), lit(0.0))) / col("n"), 6)
          .as("pr"))
  }

  /** N damped-PageRank steps as ONE statically-chained declarative plan —
    * when the iteration count is fixed, no driver loop or Deferred wrapper is
    * needed: each step is a join + aggregation appended to the lineage, and
    * Catalyst's exchange reuse (plus the explicit caches on the loop-invariant
    * edge tables) keeps the invariant side computed once. Intermediate ranks
    * are rounded to 9 places ON BOTH ENGINES each step, so aggregation-order
    * float noise (~1e-16 per sum) can never compound across steps into a
    * cross-engine mismatch; the final step rounds to the reporting precision.
    * At 100 TB, checkpoint the rank table every few steps to cut lineage
    * depth — the plan shape per step is unchanged. */
  def pagerankIterate(edges: DataFrame, damping: Double,
      steps: Int): DataFrame = {
    val e = edges.cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("wout")).cache()
    var pr = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
    for (k <- 1 to steps) {
      val contrib = e.join(outw, "src")
        .join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("pr") * (col("w").cast("double") / col("wout"))).as("x"))
        .groupBy(col("node")).agg(sum(col("x")).as("cs"))
      pr = nodes.join(contrib, Seq("node"), "left_outer")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          Num.pround(lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("cs"), lit(0.0)),
            if (k == steps) 6 else 9).as("pr"))
    }
    pr
  }

  private def pagerank10Oracle: String = {
    val base =
      s"""WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
                        FROM documents),
          e AS (SELECT t[i] AS src, t[i+1] AS dst, count(*) AS w
                FROM toks CROSS JOIN unnest(generate_series(1, len(t)-1)) AS u(i)
                WHERE len(t) >= 2 GROUP BY 1, 2),
          nodes AS (SELECT DISTINCT node FROM
                      (SELECT src AS node FROM e UNION SELECT dst FROM e)),
          nn AS (SELECT count(*) AS n FROM nodes),
          outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY 1),
          pr0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr
                  FROM nodes CROSS JOIN nn)"""
    val steps = (1 to 10).map { k =>
      val prec = if (k == 10) 6 else 9
      s""",
          c$k AS (SELECT e.dst AS node,
                         sum(p.pr * (CAST(e.w AS DOUBLE) / o.wout)) AS cs
                  FROM e JOIN outw o ON e.src = o.src
                  JOIN pr${k - 1} p ON p.node = e.src
                  GROUP BY 1),
          pr$k AS (SELECT d.node,
                          ${Num.sql("0.15 / nn.n + 0.85 * coalesce(s.cs, 0)", prec)} AS pr
                   FROM nodes d CROSS JOIN nn
                   LEFT JOIN c$k s ON s.node = d.node)"""
    }.mkString
    base + steps + "\n          SELECT node, pr FROM pr10"
  }

  val pagerank10Q = QueryDef(
    "token_pagerank_10",
    "10 chained PageRank steps in one static plan (near-converged ranks)",
    Some(pagerank10Oracle),
    (s, dir) => pagerankIterate(bigramEdges(s, dir), 0.85, 10))

  private def bigramEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("text")).as[String]
      .flatMap { t =>
        val a = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        if (a.length < 2) Iterator.empty
        else a.iterator.zip(a.iterator.drop(1))
      }.toDF("src", "dst")
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** The corpus bigram graph (tokens as nodes, adjacency counts as weights)
    * ranked by one PageRank step — "which tokens attract the most transition
    * mass", the graph view of the [[Warehouse.markov]] transition matrix. */
  val pagerankQ = QueryDef(
    "token_pagerank_step",
    "one damped PageRank step over the corpus bigram transition graph",
    Some(s"""WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
                           FROM documents),
             e AS (SELECT t[i] AS src, t[i+1] AS dst, count(*) AS w
                   FROM toks CROSS JOIN unnest(generate_series(1, len(t)-1)) AS u(i)
                   WHERE len(t) >= 2 GROUP BY 1, 2),
             nodes AS (SELECT DISTINCT node FROM
                         (SELECT src AS node FROM e UNION SELECT dst FROM e)),
             nn AS (SELECT count(*) AS n FROM nodes),
             outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY 1),
             contrib AS (SELECT e.dst AS node,
                                sum(CAST(e.w AS DOUBLE) / o.wout) AS cs
                         FROM e JOIN outw o ON e.src = o.src GROUP BY 1)
             SELECT d.node,
                    ${Num.sql("0.15 / nn.n + (0.85 * coalesce(s.cs, 0)) / nn.n", 6)} AS pr
             FROM nodes d CROSS JOIN nn
             LEFT JOIN contrib s ON s.node = d.node"""),
    (s, dir) => pagerankStep(bigramEdges(s, dir), 0.85))

  /** Triangle enumeration over the undirected token co-occurrence graph —
    * the classic distributed graph kernel (clustering-coefficient
    * numerator). Node-ORDERED edges (a < b) make each triangle appear
    * exactly once as (a < b < c) and bound the join work by per-node
    * out-degree in the ordering (the standard Schank-Wagner trick: every
    * node's work is its higher-id neighborhood squared, not its full
    * degree²; orient by degree instead of id at scale for power-law
    * graphs). Two equi-joins, no enumeration of non-edges. */
  val trianglesQ = QueryDef(
    "graph_triangles",
    "all triangles of the undirected token bigram graph, node-ordered (a<b<c)",
    Some(s"""WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
                           FROM documents),
             e0 AS (SELECT t[i] AS src, t[i+1] AS dst
                    FROM toks CROSS JOIN unnest(generate_series(1, len(t)-1)) AS u(i)
                    WHERE len(t) >= 2),
             u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                   FROM e0 WHERE src <> dst)
             SELECT ab.a, ab.b, ac.b AS c
             FROM u ab JOIN u ac ON ab.a = ac.a AND ab.b < ac.b
             JOIN u bc ON bc.a = ab.b AND bc.b = ac.b"""),
    (s, dir) => {
      val e = bigramEdges(s, dir)
      val u = e.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
      u.as("ab").join(u.as("ac"),
          col("ab.a") === col("ac.a") && col("ab.b") < col("ac.b"))
        .join(u.as("bc"),
          col("bc.a") === col("ab.b") && col("bc.b") === col("ac.b"))
        .select(col("ab.a").as("a"), col("ab.b").as("b"), col("ac.b").as("c"))
    })

  val defs: Seq[QueryDef] = Seq(pagerankQ, pagerank10Q, trianglesQ)
}
