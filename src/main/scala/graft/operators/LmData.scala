package graft.operators

import graft.QueryDef
import graft.functions.{Num, Text}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 LM data-prep operators: deterministic corpus shuffling, curriculum
  * ordering, n-gram language-model tables, token-rarity scoring and a
  * per-source contamination report.
  *
  * Scale design (100 TB): both global orderings (shuffle, curriculum) go
  * through [[globalRowNumber]] — the two-level scan from
  * [[Pipeline.packSequences]] — so no stage ever windows over one giant
  * partition; the n-gram table pre-aggregates (map-side combine) before its
  * per-prefix window; rarity joins the token stream to a vocabulary whose
  * size is sublinear in corpus size (AQE picks broadcast/shuffle-hash); the
  * contamination report rides the linear decontamination join.
  */
object LmData {

  /** Distributed global row-number over a non-negative LONG sort key `k`
    * (ties broken by `id`): partition the key space into ordered chunks
    * (`k div chunkDiv`), row-number within each chunk in parallel, then add
    * each chunk's cumulative predecessor count — a tiny table windowed on the
    * driver-side scale (#chunks rows) and broadcast back. Appends `pos`
    * (1-based). The classic alternative — one global window — moves the whole
    * table to a single partition and cannot scale. */
  def globalRowNumber(df: DataFrame, k: String, id: String,
      chunkDiv: Long): DataFrame = {
    val chunked = df.withColumn("__chunk", expr(s"$k div $chunkDiv"))
    val within = Window.partitionBy(col("__chunk"))
      .orderBy(col(k), col(id))
    val overChunks = Window.orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunked.groupBy(col("__chunk"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__before",
        coalesce(sum(col("__n")).over(overChunks), lit(0L)))
      .select(col("__chunk").as("__oc"), col("__before"))
    chunked.join(broadcast(offsets), col("__chunk") === col("__oc"))
      .withColumn("pos", col("__before") + row_number().over(within))
      .drop("__chunk", "__oc", "__before", "__n")
  }

  // ---- deterministic corpus shuffle ----------------------------------------

  /** Knuth's multiplicative constant: doc_id -> (doc_id * A) mod 2^32 is a
    * full-period mix for the shuffle order, reproducible across engines,
    * runs and partitionings (no rand()). */
  private val ShuffleMult = 2654435761L
  private val ShuffleMod = 4294967296L

  val shuffleQ = QueryDef(
    "shuffle_positions",
    "deterministic training shuffle: multiplicative-hash global row number",
    Some(s"""SELECT doc_id, row_number() OVER (
               ORDER BY (doc_id * $ShuffleMult) % $ShuffleMod, doc_id) AS pos
             FROM documents"""),
    (s, dir) => globalRowNumber(
      Tables.documents(s, dir).select(col("doc_id"),
        ((col("doc_id") * ShuffleMult) % ShuffleMod).as("k")),
      "k", "doc_id", 1L << 24)
      .select(col("doc_id"), col("pos")))

  // ---- curriculum ordering -------------------------------------------------

  /** Curriculum rank: highest-quality documents first. The sort key is the
    * quality score scaled to an exact integer (floor(q*1e4 + 0.5), the
    * [[Num.pround]] numerator), so ordering and chunking never compare raw
    * doubles across engines. */
  val curriculumQ = QueryDef(
    "curriculum_order",
    "curriculum rank: global order by quality score desc, two-level scan",
    Some(s"""WITH t AS (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks,
                   length(regexp_replace(trim(text), '\\s+', '', 'g')) AS dense_len
                 FROM documents),
             f AS (SELECT doc_id,
                     len(toks) AS n_tokens,
                     CAST(dense_len AS DOUBLE) / len(toks) AS mean_len,
                     CAST(len(list_filter(toks, x -> x IN (${TextAnalysis.stopSql("en")})))
                       AS DOUBLE) / len(toks) AS stop_ratio
                   FROM t),
             g AS (SELECT doc_id,
                     CAST(floor((least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) * 0.5 +
                       least(mean_len / 8.0, 1.0) * 0.3 +
                       (1.0 - least(stop_ratio * 2.0, 1.0)) * 0.2) * 1e4 + 0.5)
                       AS BIGINT) AS qmilli
                   FROM f)
             SELECT doc_id, qmilli,
                    row_number() OVER (ORDER BY qmilli DESC, doc_id) AS curriculum_rank
             FROM g"""),
    (s, dir) => {
      val toks = Text.tokens(col("text"))
      val scored = Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"),
          Text.denseLength(col("text")).as("dense_len"))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          (col("dense_len").cast("double") / size(col("toks"))).as("mean_len"),
          (Text.hitCount(col("toks"), Text.stopwords("en")).cast("double") /
            size(col("toks"))).as("stop_ratio"))
        .select(col("doc_id"),
          floor(Text.qualityRaw(col("n_tokens"), col("mean_len"),
            col("stop_ratio")) * 1e4 + 0.5).cast("long").as("qmilli"))
      // descending quality == ascending (10000 - qmilli); qmilli is in
      // [0, 10000] by construction of the [0,1] score
      globalRowNumber(scored.withColumn("k", lit(10000L) - col("qmilli")),
        "k", "doc_id", 512L)
        .select(col("doc_id"), col("qmilli"), col("pos").as("curriculum_rank"))
    })

  // ---- n-gram language-model table -----------------------------------------

  /** Most likely next token per bigram prefix (prefixes seen >= 5 times) —
    * the count table of a Katz-style n-gram LM. Pre-aggregation by
    * (w1,w2,w3) shrinks the token stream before the per-prefix window, so
    * the window shuffles distinct trigrams, not tokens. */
  val trigramQ = QueryDef(
    "trigram_next_token",
    "LM n-gram table: top next token per bigram prefix (prefix count >= 5)",
    Some("""WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS t
                          FROM documents),
              tg AS (SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
                     FROM toks CROSS JOIN
                       unnest(generate_series(1, len(t) - 2)) AS u(i)
                     WHERE len(t) >= 3),
              c AS (SELECT w1, w2, w3, count(*) AS cnt FROM tg GROUP BY 1, 2, 3),
              r AS (SELECT *,
                      row_number() OVER (PARTITION BY w1, w2
                                         ORDER BY cnt DESC, w3) AS rn,
                      CAST(sum(cnt) OVER (PARTITION BY w1, w2) AS BIGINT) AS prefix_cnt
                    FROM c)
              SELECT w1, w2, w3 AS next_token, cnt, prefix_cnt
              FROM r WHERE rn = 1 AND prefix_cnt >= 5"""),
    (s, dir) => {
      val t = Text.tokens(col("text"))
      val tg = Tables.documents(s, dir)
        .select(t.as("t")).filter(size(col("t")) >= 3)
        .select(col("t"), explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
        .select(element_at(col("t"), col("i")).as("w1"),
          element_at(col("t"), col("i") + 1).as("w2"),
          element_at(col("t"), col("i") + 2).as("w3"))
      val counts = tg.groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("cnt"))
      val prefix = Window.partitionBy(col("w1"), col("w2"))
      counts
        .withColumn("rn",
          row_number().over(prefix.orderBy(col("cnt").desc, col("w3"))))
        .withColumn("prefix_cnt", sum(col("cnt")).over(prefix))
        .filter(col("rn") === 1 && col("prefix_cnt") >= 5)
        .select(col("w1"), col("w2"), col("w3").as("next_token"),
          col("cnt"), col("prefix_cnt"))
    })

  // ---- token rarity --------------------------------------------------------

  /** Per-document average token commonness: join the token stream (with
    * multiplicity) to the corpus unigram table and average the counts. A
    * rarity/perplexity proxy in pure +,*,/ arithmetic — no ln, whose libm
    * implementations differ across engines — with the mass kept as an exact
    * BIGINT and one IEEE division at the end. */
  val rarityQ = QueryDef(
    "doc_token_rarity",
    "per-doc avg corpus-frequency of its tokens (perplexity proxy, no ln)",
    Some(s"""WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                  FROM documents),
             uni AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1)
             SELECT doc_id, count(*) AS n_tokens, CAST(sum(cnt) AS BIGINT) AS mass,
                    ${Num.sql("CAST(sum(cnt) AS DOUBLE) / count(*)", 4)} AS avg_commonness
             FROM tok JOIN uni USING (tok) GROUP BY 1"""),
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      val uni = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      tok.join(uni, "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("mass"))
        .withColumn("avg_commonness",
          Num.pround(col("mass").cast("double") / col("n_tokens"), 4))
    })

  // ---- contamination report ------------------------------------------------

  private val contamW = 8

  /** Per-source contamination rate against the held-out benchmark source —
    * the summary a data-quality dashboard shows over
    * [[Curation.decontaminate]]'s doc-level flags. */
  val contamReportQ = QueryDef(
    "contamination_report",
    "per-source doc counts + benchmark-contamination rate",
    Some {
      val sh = (0 until contamW).map(k => s"t[i+$k]").mkString(", ")
      s"""WITH toks AS (SELECT doc_id, source,
               string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
          s1 AS (SELECT DISTINCT doc_id, source, concat_ws(' ', $sh) AS sh
                 FROM toks CROSS JOIN
                   unnest(generate_series(1, len(t) - ${contamW - 1})) AS u(i)
                 WHERE len(t) >= $contamW),
          b AS (SELECT DISTINCT sh FROM s1
                WHERE source = '${Curation.BenchmarkSource}'),
          flagged AS (SELECT DISTINCT doc_id FROM s1 JOIN b USING (sh)
                      WHERE source <> '${Curation.BenchmarkSource}'),
          d AS (SELECT doc_id, source FROM documents
                WHERE source <> '${Curation.BenchmarkSource}')
          SELECT source, count(*) AS n_docs, count(f.doc_id) AS n_contaminated,
                 ${Num.sql("CAST(count(f.doc_id) AS DOUBLE) / count(*)", 4)} AS pct
          FROM d LEFT JOIN flagged f USING (doc_id) GROUP BY 1"""
    },
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val flagged = Curation
        .decontaminate(docs, Curation.BenchmarkSource, contamW)
        .select(col("doc_id"), lit(1L).as("__hit"))
      docs.filter(col("source") =!= Curation.BenchmarkSource)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"))
        .join(flagged, Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), count(col("__hit")).as("n_contaminated"))
        .withColumn("pct",
          Num.pround(col("n_contaminated").cast("double") / col("n_docs"), 4))
    })

  /** Per-doc predictability under the corpus trigram model: the mean
    * conditional probability P(w3 | w1 w2) of the doc's trigrams — the
    * LM-based quality filter (KenLM-perplexity shape) in pure rational
    * arithmetic: probabilities are exact count ratios, no ln (whose libm
    * implementations differ across engines), one rounded mean at the end.
    * High scores flag boilerplate/duplicated text; low scores flag noise.
    * Two aggregations over the trigram stream + one probability join that
    * reuses the trigram grouping's partitioning — linear at any corpus
    * size, and the model table is |distinct trigrams|, not |tokens|. */
  val predictabilityQ = QueryDef(
    "doc_lm_predictability",
    "per-doc mean trigram conditional probability (LM quality filter, no ln)",
    Some(s"""WITH toks AS (SELECT doc_id,
                    string_split_regex(trim(lower(text)), '\\s+') AS t
                  FROM documents),
             tg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
                    FROM toks CROSS JOIN
                      unnest(generate_series(1, len(t) - 2)) AS u(i)
                    WHERE len(t) >= 3),
             tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
             bi AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2
                    FROM tri GROUP BY 1, 2),
             p AS (SELECT w1, w2, w3, CAST(c3 AS DOUBLE) / c2 AS prob
                   FROM tri JOIN bi USING (w1, w2))
             SELECT doc_id, count(*) AS n_trigrams,
                    ${Num.sql(s"${Num.sqlQsum("prob", 12)} / count(*)",
                      4)} AS predictability
             FROM tg JOIN p USING (w1, w2, w3) GROUP BY 1"""),
    (s, dir) => {
      import s.implicits._
      val tg = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, txt) =>
          val a = txt.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          if (a.length < 3) Iterator.empty
          else a.sliding(3).map(g => (id, g(0), g(1), g(2)))
        }.toDF("doc_id", "w1", "w2", "w3")
        .cache() // model build and scoring pass both read the stream
      val tri = tg.groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("c3"))
      val bi = tri.groupBy(col("w1"), col("w2")).agg(sum(col("c3")).as("c2"))
      val p = tri.join(bi, Seq("w1", "w2"))
        .select(col("w1"), col("w2"), col("w3"),
          (col("c3").cast("double") / col("c2")).as("prob"))
      tg.join(p, Seq("w1", "w2", "w3"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_trigrams"),
          // prob = c3/c2 is a computed double; per-doc groups are bounded
          // by doc length but quantize-then-sum removes order sensitivity
          // outright rather than relying on the bound
          Num.pround(Num.qsum(col("prob"), 12) / count(lit(1)), 4)
            .as("predictability"))
    })

  /** Vocabulary id-encoding — the tokenizer's final step: tokens map to
    * their rank in the top-24 frequency vocabulary (deterministic
    * count-desc, token-asc order), everything else to the OOV id 0; each
    * document's first 20 positions are emitted as (doc_id, pos, token_id)
    * rows. The vocabulary is a broadcast of 24 rows, so encoding is a
    * scan-speed map-side join at any corpus size; 24 (< the ~31-token
    * fixture vocabulary) deliberately exercises the OOV path. */
  private val EncodeVocab = 24
  private val EncodeMaxPos = 20

  val vocabEncodeQ = QueryDef(
    "vocab_encode_ids",
    "token-id encoding of each doc's first 20 positions against a top-24 vocab",
    Some(s"""WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
                  FROM documents),
             vocab AS (SELECT t, row_number() OVER (ORDER BY count(*) DESC, t)
                         AS token_id
                       FROM tok GROUP BY t ORDER BY 2 LIMIT $EncodeVocab),
             seq AS (SELECT doc_id, i AS pos, toks[i] AS t
                     FROM (SELECT doc_id,
                             string_split_regex(trim(lower(text)), '\\s+') AS toks
                           FROM documents)
                     CROSS JOIN unnest(generate_series(1,
                       least(len(toks), $EncodeMaxPos))) AS u(i))
             SELECT s.doc_id, s.pos, coalesce(v.token_id, 0) AS token_id
             FROM seq s LEFT JOIN vocab v ON v.t = s.t"""),
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val vocab = docs
        .select(explode(Text.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("t")).limit(EncodeVocab)
        .select(col("t"), row_number().over(
          Window.orderBy(desc("c"), col("t"))).cast("long").as("token_id"))
      val seq = docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, txt) =>
          val a = txt.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          a.iterator.take(EncodeMaxPos).zipWithIndex
            .map { case (t, i) => (id, (i + 1).toLong, t) }
        }.toDF("doc_id", "pos", "t")
      seq.join(broadcast(vocab), Seq("t"), "left_outer")
        .select(col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(0L)).as("token_id"))
    })

  /** CCNet-style perplexity bucketing: order the corpus by the LM quality
    * score ([[predictabilityQ]] — the rational no-ln predictability that
    * stands in for KenLM perplexity; MORE predictable = LOWER perplexity =
    * 'head') and split it into head/middle/tail thirds. This is the named
    * curation stage of the CCNet pipeline (Wenzek et al. 2020): downstream
    * mixes sample head-heavy.
    *
    * Scale: the global rank is NOT a global-sort window. Scores are rounded
    * to 1e-4, so the distinct-score table is bounded (<= ~10^4 rows at any
    * corpus size — the [[graft.operators.Eval]] PR-curve discipline); the
    * cumulative over it broadcasts back, and each doc's rank is that
    * cumulative plus a row_number PARTITIONED BY its score (bounded
    * per-partition work), ties broken by doc_id. Bucket edges use integer
    * arithmetic (rank*3 vs N) so no float boundary exists. */
  val ccnetQ = QueryDef(
    "ccnet_perplexity_buckets",
    "head/middle/tail corpus thirds by LM predictability (CCNet bucketing)",
    Some(s"""WITH p AS (${predictabilityQ.oracle.get}),
             n AS (SELECT count(*) AS n FROM p),
             r AS (SELECT doc_id, predictability,
                     row_number() OVER (ORDER BY predictability DESC, doc_id)
                       AS rank
                   FROM p)
             SELECT doc_id, predictability, CAST(rank AS BIGINT) AS rank,
                    CASE WHEN rank * 3 <= n THEN 'head'
                         WHEN rank * 3 <= 2 * n THEN 'middle'
                         ELSE 'tail' END AS bucket
             FROM r CROSS JOIN n"""),
    (s, dir) => {
      // cached: the scored table feeds THREE subtrees (the distinct-score
      // cumulative, the corpus count, and the final join) and Spark's
      // exchange reuse does not fire across them (measured: 9 parquet scans,
      // 0 ReusedExchange uncached — the trigram-LM scoring ran 3x)
      val scored = predictabilityQ.run(s, dir)
        .select(col("doc_id"), col("predictability"))
        .cache()
      // bounded distinct-score cumulative: |distinct rounded scores| rows
      val cum = scored.groupBy(col("predictability"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum_before",
          coalesce(sum(col("c")).over(Window.orderBy(desc("predictability"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("predictability"), col("cum_before"))
      val n = scored.agg(count(lit(1)).as("n"))
      val rn = row_number()
        .over(Window.partitionBy(col("predictability")).orderBy(col("doc_id")))
      scored
        .join(broadcast(cum), Seq("predictability"))
        .crossJoin(broadcast(n))
        .withColumn("rank", col("cum_before") + rn)
        .select(col("doc_id"), col("predictability"), col("rank"),
          when(col("rank") * 3 <= col("n"), "head")
            .when(col("rank") * 3 <= col("n") * 2, "middle")
            .otherwise("tail").as("bucket"))
    })

  val defs: Seq[QueryDef] =
    Seq(shuffleQ, curriculumQ, trigramQ, rarityQ, contamReportQ,
      predictabilityQ, vocabEncodeQ, ccnetQ)
}
