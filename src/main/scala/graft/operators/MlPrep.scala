package graft.operators

import graft.QueryDef
import graft.functions.{Num, RollingHash}
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
    * is the only join, co-partitioned with the candidates on (c,p) by an
    * unhinted shuffle (PlanSpec pins that no customer-derived side carries
    * a broadcast hint — both sides grow with |customers|). Part
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
      // prune the fact-scale positive set by the (NegK·|customers|)
      // candidate set BEFORE any wide operation: the semi join replaces a
      // full distinct of customer x part purchase pairs — the anti join
      // then runs against only the positives that could matter. Both the
      // semi and the anti join are (c,p)-keyed with NO strategy hint: both
      // sides are O(|customers|), so at scale they MUST shuffle (a forced
      // broadcast here was the catalog's one 100x-fatal plan — 7.5M rows
      // at sf10, past Spark's 8 GB broadcast cap at 100x); at toy SF
      // Catalyst's size estimate picks broadcast on its own. The semi's
      // (c,p) exchange of pos is then reused verbatim by the anti join and
      // the group-by (same key), so dropping the hints adds exactly one
      // fact-side exchange. Only the 1-row part count stays broadcast.
      val pos = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .join(cand.select(col("c"), col("p")),
          Seq("c", "p"), "left_semi")
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c")).orderBy(col("k"), col("p"))
      cand.join(pos, Seq("c", "p"), "left_anti")
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

  /** One full-batch gradient-descent step of a squared-loss linear model
    * (predict is-English from O(1)-normalized token count, mean token
    * length, and stopword ratio — unnormalized counts put the largest
    * Hessian eigenvalue near 3600 and lr = 0.1 would diverge; MlPrepSpec
    * pins actual descent): w' = w - lr·(1/n)·Σ (x·w - y)·x. Squared loss rather than
    * logistic is the deliberate determinism choice — the update is pure
    * +,*,/ (no exp/sigmoid, whose libm variants differ across engines), so
    * the oracle pins the step bit-tight. The distributed shape is the
    * point: ONE aggregation pass computes the whole gradient (map-side
    * partials over every partition), the weight vector is the only state —
    * an N-step trainer iterates the plan like
    * [[graft.operators.Graph.pagerankIterate]], broadcasting w each step. */
  private val GdW0 = Seq(0.1, 0.001, 0.01, -0.5) // bias, x1, x2, x3
  private val GdLr = 0.1

  val gdStepQ = QueryDef(
    "lr_gd_step",
    "one exact gradient-descent step of a squared-loss linear model",
    Some(s"""WITH t AS (SELECT doc_id, lang,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks,
                 length(regexp_replace(trim(text), '\\s+', '', 'g')) AS dense_len
               FROM documents),
             f AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                     CAST(len(toks) AS DOUBLE) / 200.0 AS x1,
                     (CAST(dense_len AS DOUBLE) / len(toks)) / 8.0 AS x2,
                     CAST(len(list_filter(toks,
                       x -> x IN (${TextAnalysis.stopSql("en")})))
                       AS DOUBLE) / len(toks) AS x3
                   FROM t),
             g AS (SELECT ((${GdW0(0)} + ${GdW0(1)} * x1) +
                           (${GdW0(2)} * x2 + (${GdW0(3)}) * x3)) - y AS err,
                          x1, x2, x3 FROM f),
             s AS (SELECT count(*) AS n,
                          ${Num.sqlQsum("err", 12)} AS g0,
                          ${Num.sqlQsum("err * x1", 12)} AS g1,
                          ${Num.sqlQsum("err * x2", 12)} AS g2,
                          ${Num.sqlQsum("err * x3", 12)} AS g3 FROM g)
             SELECT ${Num.sql(s"${GdW0(0)} - $GdLr * g0 / n", 6)} AS w0,
                    ${Num.sql(s"${GdW0(1)} - $GdLr * g1 / n", 6)} AS w1,
                    ${Num.sql(s"${GdW0(2)} - $GdLr * g2 / n", 6)} AS w2,
                    ${Num.sql(s"${GdW0(3)} - $GdLr * g3 / n", 6)} AS w3
             FROM s"""),
    (s, dir) => {
      import graft.functions.Text
      val f = Tables.documents(s, dir)
        .select(when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
          Text.tokens(col("text")).as("toks"),
          Text.denseLength(col("text")).as("dense_len"))
        .select(col("y"),
          (size(col("toks")).cast("double") / 200.0).as("x1"),
          ((col("dense_len").cast("double") / size(col("toks"))) / 8.0).as("x2"),
          (Text.hitCount(col("toks"), Text.stopwords("en")).cast("double") /
            size(col("toks"))).as("x3"))
      val err = ((lit(GdW0(0)) + lit(GdW0(1)) * col("x1")) +
        (lit(GdW0(2)) * col("x2") + lit(GdW0(3)) * col("x3"))) - col("y")
      // the four gradient components each sum a computed double over the
      // WHOLE corpus in one group — the one aggregation here whose group
      // grows with the data, so summation order must not be able to move
      // the 6-dp result: quantize-then-sum at 1e-12
      f.select(err.as("err"), col("x1"), col("x2"), col("x3"))
        .agg(count(lit(1)).as("n"), Num.qsum(col("err"), 12).as("g0"),
          Num.qsum(col("err") * col("x1"), 12).as("g1"),
          Num.qsum(col("err") * col("x2"), 12).as("g2"),
          Num.qsum(col("err") * col("x3"), 12).as("g3"))
        .select(
          Num.pround(lit(GdW0(0)) - lit(GdLr) * col("g0") / col("n"), 6).as("w0"),
          Num.pround(lit(GdW0(1)) - lit(GdLr) * col("g1") / col("n"), 6).as("w1"),
          Num.pround(lit(GdW0(2)) - lit(GdLr) * col("g2") / col("n"), 6).as("w2"),
          Num.pround(lit(GdW0(3)) - lit(GdLr) * col("g3") / col("n"), 6).as("w3"))
    })

  /** Mutual information between token PRESENCE and the document's language
    * label — the classic filter-method feature selector (what you run before
    * training a fastText-style quality/language classifier to pick its
    * vocabulary). For each token t, I(X_t; L) over the 2x|langs| contingency
    * table of doc-level presence vs label, with the 0·ln0 = 0 convention.
    *
    * Scale/determinism: the presence table is one explode+distinct (linear);
    * label totals are a |langs|-row broadcast; the full contingency grid is
    * |vocab| x |langs| built by a broadcast cross join, NEVER doc x vocab.
    * Each grid cell's two ln-terms are quantized to integer micro-nats
    * BEFORE the per-token sum (the [[graft.operators.Curation]] DSIR
    * discipline) so the MI total is exact BIGINT arithmetic — summation
    * order can't perturb it. Top-50 is a TakeOrdered on the unique key
    * (mi_micro DESC, tok). */
  private val MiTopK = 50

  val tokenMiQ = QueryDef(
    "token_lang_mi",
    "top-50 tokens by mutual information with the language label (micro-nats)",
    Some(s"""WITH pres AS (SELECT DISTINCT doc_id, lang,
                    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                  FROM documents),
       tl AS (SELECT tok, lang, count(*) AS n_ts FROM pres GROUP BY 1, 2),
       nt AS (SELECT tok, CAST(sum(n_ts) AS BIGINT) AS n_t FROM tl GROUP BY 1),
       ls AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
       tot AS (SELECT count(*) AS n FROM documents),
       grid AS (SELECT nt.tok, nt.n_t, ls.lang, ls.n_s,
                       coalesce(tl.n_ts, 0) AS n_ts, tot.n
                FROM nt CROSS JOIN ls CROSS JOIN tot
                LEFT JOIN tl ON tl.tok = nt.tok AND tl.lang = ls.lang),
       cells AS (SELECT tok, n_t,
                   CAST(floor((
                     CASE WHEN n_ts > 0 THEN
                       (CAST(n_ts AS DOUBLE) / n) *
                       ln((CAST(n_ts AS DOUBLE) * n) /
                          (CAST(n_t AS DOUBLE) * n_s)) ELSE 0.0 END +
                     CASE WHEN n_s - n_ts > 0 THEN
                       (CAST(n_s - n_ts AS DOUBLE) / n) *
                       ln((CAST(n_s - n_ts AS DOUBLE) * n) /
                          (CAST(n - n_t AS DOUBLE) * n_s)) ELSE 0.0 END
                   ) * 1e6 + 0.5) AS BIGINT) AS cell_micro
                 FROM grid)
       SELECT tok, n_t AS n_docs, CAST(sum(cell_micro) AS BIGINT) AS mi_micro
       FROM cells GROUP BY 1, 2
       ORDER BY mi_micro DESC, tok LIMIT $MiTopK"""),
    (s, dir) => {
      import graft.functions.Text
      val docs = Tables.documents(s, dir)
      val pres = docs
        .select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("tok"))
        .distinct()
      // cached: two consumers (the per-token rollup + the grid join) —
      // uncached, the corpus explode+distinct behind it runs twice
      val tl = pres.groupBy(col("tok"), col("lang")).agg(count(lit(1)).as("n_ts"))
        .cache()
      val nt = tl.groupBy(col("tok")).agg(sum(col("n_ts")).as("n_t"))
      val ls = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
      val tot = docs.agg(count(lit(1)).as("n"))
      val grid = nt.crossJoin(broadcast(ls)).crossJoin(broadcast(tot))
        .join(tl, Seq("tok", "lang"), "left")
        .withColumn("n_ts", coalesce(col("n_ts"), lit(0L)))
      val presTerm = when(col("n_ts") > 0,
        (col("n_ts").cast("double") / col("n")) *
          log((col("n_ts").cast("double") * col("n")) /
            (col("n_t").cast("double") * col("n_s")))).otherwise(0.0)
      val absTerm = when(col("n_s") - col("n_ts") > 0,
        ((col("n_s") - col("n_ts")).cast("double") / col("n")) *
          log(((col("n_s") - col("n_ts")).cast("double") * col("n")) /
            ((col("n") - col("n_t")).cast("double") * col("n_s")))).otherwise(0.0)
      grid
        .select(col("tok"), col("n_t"),
          floor((presTerm + absTerm) * 1e6 + 0.5).cast("long").as("cell_micro"))
        .groupBy(col("tok"), col("n_t"))
        .agg(sum(col("cell_micro")).as("mi_micro"))
        .select(col("tok"), col("n_t").as("n_docs"), col("mi_micro"))
        .orderBy(col("mi_micro").desc, col("tok"))
        .limit(MiTopK)
    })

  val defs: Seq[QueryDef] = Seq(negativeSamplesQ, hashCrossQ, gdStepQ, tokenMiQ)
}
