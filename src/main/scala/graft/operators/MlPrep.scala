package graft.operators

import graft.QueryDef
import graft.functions.RollingHash
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** ML feature/example preparation over the relational tables — the
  * recommender-training cousins of the §7.6 text pipeline: deterministic
  * negative sampling and the hashing-trick feature cross.
  *
  * Both use the DuckDB-replicable [[RollingHash]] rather than xxhash64 so
  * the sampled ids are oracle-exact; a production build swaps in a stronger
  * mixer at the same call site (the rolling hash's near-consecutive outputs
  * for near-identical keys are fine for determinism demos, not for
  * independence-sensitive samplers).
  */
object MlPrep {

  private val NegK = 5       // candidate draws per customer
  private val NegKeep = 3    // negatives kept per customer
  private val CrossBuckets = 64L

  /** Deterministic negative sampling for contrastive training: for each
    * customer draw `NegK` candidate part ids by hashing (customer, draw)
    * into the part-key space, drop candidates the customer actually bought
    * (anti join on the positive set), dedupe hash collisions, keep the
    * first `NegKeep` by draw order. LINEAR in |customers| — the classic
    * scale mistake this replaces is enumerating the customer x part product
    * and filtering; here the product is never formed, and the positive set
    * is the only join (co-partitioned on the customer key at 100 TB). Part
    * keys are contiguous 0..N-1 (FIXTURES.md §B), so hash % N is a valid
    * id; with sparse ids the draw would join a part-dimension lookup
    * instead. */
  val negativeSamplesQ = QueryDef(
    "negative_samples",
    "per-customer deterministic negative part samples (hash-draw + anti join)",
    Some(s"""WITH np AS (SELECT count(*) AS n FROM part),
             pos AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                     FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
             cand AS (SELECT c_custkey AS c, k,
                        list_reduce(list_transform(
                          string_split(c_custkey || ':' || k, ''),
                          x -> ord(x)::BIGINT),
                          (a,b) -> (a*31+b) % 1000000007) % np.n AS p
                      FROM customer
                      CROSS JOIN unnest(generate_series(1, $NegK)) AS u(k)
                      CROSS JOIN np),
             neg AS (SELECT c, p, min(k) AS k FROM cand
                     WHERE NOT EXISTS (SELECT 1 FROM pos
                                       WHERE pos.c = cand.c AND pos.p = cand.p)
                     GROUP BY 1, 2)
             SELECT c AS c_custkey, neg_rank, p AS p_partkey FROM (
               SELECT c, p,
                      row_number() OVER (PARTITION BY c ORDER BY k, p) AS neg_rank
               FROM neg)
             WHERE neg_rank <= $NegKeep"""),
    (s, dir) => {
      val np = Tables.part(s, dir).agg(count(lit(1)).as("n"))
      val cand = Tables.customer(s, dir).select(col("c_custkey").as("c"))
        .crossJoin(broadcast(np))
        .select(col("c"), explode(sequence(lit(1), lit(NegK))).as("k"),
          col("n"))
        .select(col("c"), col("k"),
          (RollingHash.rolling_hash(concat(col("c").cast("string"), lit(":"),
            col("k").cast("string"))) % col("n")).as("p"))
      // prune the fact-scale positive set by the (tiny, NegK·|customers|)
      // candidate set BEFORE any wide operation: the broadcast semi join
      // replaces a full distinct of customer x part purchase pairs — the
      // anti join then runs against only the positives that could matter
      val pos = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .join(broadcast(cand.select(col("c"), col("p"))),
          Seq("c", "p"), "left_semi")
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c")).orderBy(col("k"), col("p"))
      cand.join(broadcast(pos), Seq("c", "p"), "left_anti")
        .groupBy(col("c"), col("p")).agg(min(col("k")).as("k"))
        .withColumn("neg_rank", row_number().over(w))
        .filter(col("neg_rank") <= NegKeep)
        .select(col("c").as("c_custkey"), col("neg_rank"),
          col("p").as("p_partkey"))
    })

  /** Hashing-trick feature cross: (nation x market segment) hashed into a
    * fixed bucket space — the categorical-cross encoding wide models use
    * when the cross's cardinality is unbounded. Pure per-row codegen'd
    * expression; zero shuffle. */
  val hashCrossQ = QueryDef(
    "feature_hash_cross",
    "hashing-trick bucket of the nation x segment categorical cross",
    Some(s"""SELECT c_custkey,
                    list_reduce(list_transform(
                      string_split(c_nationkey || '|' || c_mktsegment, ''),
                      x -> ord(x)::BIGINT),
                      (a,b) -> (a*31+b) % 1000000007) % $CrossBuckets AS cross_bucket
             FROM customer"""),
    (s, dir) => Tables.customer(s, dir)
      .select(col("c_custkey"),
        (RollingHash.rolling_hash(concat(col("c_nationkey").cast("string"),
          lit("|"), col("c_mktsegment"))) % CrossBuckets).as("cross_bucket")))

  val defs: Seq[QueryDef] = Seq(negativeSamplesQ, hashCrossQ)
}
