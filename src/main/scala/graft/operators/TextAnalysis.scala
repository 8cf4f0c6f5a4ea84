package graft.operators

import graft.QueryDef
import graft.functions.{Num, RollingHash, Text}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis query surface over `documents` (SURVEY.md §7.6): token
  * statistics, quality scoring, language ID, fingerprinting. All per-row
  * column expressions — shuffle-free, codegen'd, scan-speed at 100 TB.
  */
object TextAnalysis {

  private def enList = stopSql("en")
  private def listSql(l: String) = stopSql(l)

  /** The stopword list for `l` as a SQL IN-list (shared with oracle SQL in
    * other operator files). */
  def stopSql(l: String): String =
    Text.stopwords(l).map(w => s"'$w'").mkString(", ")

  val tokenStats = QueryDef(
    "text_token_stats",
    "token count, dense length, mean token length per document",
    Some(s"""WITH t AS (SELECT doc_id,
                              len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
                              length(regexp_replace(trim(text), '\\s+', '', 'g')) AS dense_len
                       FROM documents)
            SELECT doc_id, n_tokens, dense_len,
                   ${Num.sql("CAST(dense_len AS DOUBLE) / n_tokens", 4)} AS mean_token_len
            FROM t"""),
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).as("n_tokens"),
        Text.denseLength(col("text")).as("dense_len"))
      .withColumn("mean_token_len",
        Num.pround(col("dense_len").cast("double") / col("n_tokens"), 4)))

  val quality = QueryDef(
    "text_quality",
    "composite quality score from length/token-shape/stopword-density",
    Some(s"""WITH t AS (SELECT doc_id,
                               string_split_regex(trim(lower(text)), '\\s+') AS toks,
                               length(regexp_replace(trim(text), '\\s+', '', 'g')) AS dense_len
                        FROM documents),
             f AS (SELECT doc_id,
                          len(toks) AS n_tokens,
                          CAST(dense_len AS DOUBLE) / len(toks) AS mean_len,
                          CAST(len(list_filter(toks, x -> x IN ($enList))) AS DOUBLE)
                            / len(toks) AS stop_ratio
                   FROM t)
             SELECT doc_id, n_tokens, ${Num.sql("stop_ratio", 4)} AS stop_ratio,
                    ${Num.sql("""least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) * 0.5 +
                          least(mean_len / 8.0, 1.0) * 0.3 +
                          (1.0 - least(stop_ratio * 2.0, 1.0)) * 0.2""", 4)} AS quality
             FROM f"""),
    (s, dir) => {
      val toks = Text.tokens(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"),
          Text.denseLength(col("text")).as("dense_len"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          (col("dense_len").cast("double") / size(col("toks"))).as("mean_len"),
          (Text.hitCount(col("toks"), Text.stopwords("en")).cast("double") /
            size(col("toks"))).as("stop_ratio_raw"))
        .select(col("doc_id"), col("n_tokens"),
          Num.pround(col("stop_ratio_raw"), 4).as("stop_ratio"),
          Text.qualityScore(col("n_tokens"), col("mean_len"),
            col("stop_ratio_raw")).as("quality"))
    })

  val langid = QueryDef(
    "text_langid",
    "n-gram (function-word) language heuristic with fixed precedence",
    Some(s"""WITH t AS (SELECT doc_id,
                               string_split_regex(trim(lower(text)), '\\s+') AS toks
                        FROM documents),
             c AS (SELECT doc_id,
                          len(list_filter(toks, x -> x IN (${listSql("en")}))) AS c_en,
                          len(list_filter(toks, x -> x IN (${listSql("de")}))) AS c_de,
                          len(list_filter(toks, x -> x IN (${listSql("fr")}))) AS c_fr,
                          len(list_filter(toks, x -> x IN (${listSql("es")}))) AS c_es
                   FROM t)
             SELECT doc_id, c_en, c_de, c_fr, c_es,
                    CASE WHEN c_en + c_de + c_fr + c_es = 0 THEN 'unknown'
                         WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                         WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                         WHEN c_fr >= c_es THEN 'fr'
                         ELSE 'es' END AS lang_pred
             FROM c"""),
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val counts = Seq("en", "de", "fr", "es").map(l =>
        Text.hitCount(col("toks"), Text.stopwords(l)).as(s"c_$l"))
      d.select(col("doc_id") +: counts: _*)
        .withColumn("lang_pred",
          when(col("c_en") + col("c_de") + col("c_fr") + col("c_es") === 0, "unknown")
            .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") &&
              col("c_en") >= col("c_es"), "en")
            .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"), "de")
            .when(col("c_fr") >= col("c_es"), "fr")
            .otherwise("es"))
    })

  /** Two fingerprints per doc: order-insensitive md5 of the sorted distinct
    * token set, and the order-sensitive polynomial rolling hash — the latter
    * via the custom Catalyst Expression [[graft.functions.RollingHash]]
    * (codegen'd), with an exact BIGINT-arithmetic DuckDB replica. */
  val fingerprint = QueryDef(
    "text_fingerprint",
    "md5 set-fingerprint + custom-Expression rolling hash per document",
    Some("""SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                     string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS set_fp,
                   list_reduce(list_transform(string_split(trim(text), ''),
                     c -> ord(c)::BIGINT), (a, b) -> (a * 31 + b) % 1000000007) AS roll_fp
            FROM documents"""),
    (s, dir) => Tables.documents(s, dir).select(
      col("doc_id"),
      Text.setFingerprint(Text.tokens(col("text"))).as("set_fp"),
      RollingHash.rolling_hash(trim(col("text"))).as("roll_fp")))

  /** Corpus-level n-gram statistics: top-50 word bigrams by document
    * frequency. Reuses the deduplication inverted index (distinct shingles
    * per doc) — one shuffle to count, TakeOrdered for the top-K. */
  val bigramDf = QueryDef(
    "text_bigram_df",
    "top-50 word bigrams by document frequency",
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS s
                   FROM toks CROSS JOIN unnest(generate_series(1, len(t)-1)) AS u(i)
                   WHERE len(t) >= 2)
            SELECT s AS bigram, count(*) AS doc_freq
            FROM sh GROUP BY 1
            ORDER BY doc_freq DESC, bigram LIMIT 50"""),
    (s, dir) => Dedup.shingleIndex(Tables.documents(s, dir), "doc_id", "text", 2)
      .groupBy(col("s").as("bigram"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("bigram"))
      .limit(50))

  /** BPE-style pre-tokenization counts: letter runs, digit runs, and single
    * non-alnum marks — the three classes a byte-pair tokenizer's pre-split
    * produces. Same character-class regex in both engines (no engine-specific
    * syntax), per-row, codegen'd. */
  val bpeTokens = QueryDef(
    "text_bpe_tokens",
    "BPE-ish pre-token counts: word runs, digit runs, punctuation marks",
    Some("""SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+')) AS n_word,
                   len(regexp_extract_all(text, '[0-9]+')) AS n_num,
                   len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n]')) AS n_mark,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]'))
                     AS n_pretokens
            FROM documents"""),
    (s, dir) => {
      def cnt(pat: String) = regexp_count(col("text"), lit(pat))
      Tables.documents(s, dir).select(col("doc_id"),
        cnt("[A-Za-z]+").cast("long").as("n_word"),
        cnt("[0-9]+").cast("long").as("n_num"),
        cnt("[^A-Za-z0-9 \t\n]").cast("long").as("n_mark"),
        cnt("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]").cast("long").as("n_pretokens"))
    })

  /** Content-addressed train/val/test split: the assignment hashes the
    * DOCUMENT BODY (md5, identical across engines), not the row id, so it is
    * stable under re-sharding, dedup reordering, and incremental ingestion —
    * the property a training-data split actually needs. 12/2/2 sixteenths by
    * the first fingerprint nibble. */
  val trainValSplit = QueryDef(
    "split_train_val",
    "deterministic content-hash train/val/test split per document",
    Some("""SELECT doc_id,
                   CASE WHEN substring(md5(text), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
                        WHEN substring(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
                        ELSE 'test' END AS split
            FROM documents"""),
    (s, dir) => Tables.documents(s, dir).select(col("doc_id"),
      when(substring(md5(col("text")), 1, 1).between("0", "b"), "train")
        .when(substring(md5(col("text")), 1, 1).isin("c", "d"), "val")
        .otherwise("test").as("split")))

  /** Redaction pass: scrub digit runs (the stand-in for PII tokens — same
    * engine-portable character-class regex in both engines) and fingerprint
    * the redacted body so the transform itself is hash-verified. */
  val redact = QueryDef(
    "text_redact",
    "redact digit runs, count redactions, fingerprint the redacted text",
    Some("""SELECT doc_id,
                   len(regexp_extract_all(text, '[0-9]+')) AS n_redacted,
                   md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_fp
            FROM documents"""),
    (s, dir) => Tables.documents(s, dir).select(col("doc_id"),
      regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_redacted"),
      md5(regexp_replace(col("text"), "[0-9]+", "<NUM>")).as("redacted_fp")))

  /** Deterministic weighted source mixing: treat the corpus as two sources
    * (split by one hash nibble), keep source A whole and downsample source B
    * to ~25% by a SECOND, independent nibble of the content hash — the
    * training-mix primitive (re-weight sources without RNG state, stable
    * under re-sharding; downsampling decisions are content-addressed exactly
    * like [[trainValSplit]]). */
  val corpusMix = QueryDef(
    "corpus_mix_weighted",
    "two-source weighted mix: keep A, downsample B to 25% by content hash",
    Some("""WITH tagged AS (SELECT doc_id,
                                   CASE WHEN substring(md5(text), 1, 1) < '8'
                                        THEN 'A' ELSE 'B' END AS source,
                                   substring(md5(text), 2, 1) AS w
                            FROM documents)
            SELECT doc_id, source FROM tagged
            WHERE source = 'A' OR w < '4'"""),
    (s, dir) => {
      val h1 = substring(md5(col("text")), 1, 1)
      val h2 = substring(md5(col("text")), 2, 1)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(h1 < "8", "A").otherwise("B").as("source"), h2.as("w"))
        .filter(col("source") === "A" || col("w") < "4")
        .select(col("doc_id"), col("source"))
    })

  /** Within-document repetition signals (the Gopher-family quality filters:
    * heavily repetitive documents are low-value training data): duplicate
    * unigram fraction (1 - distinct/total) and the share of the single most
    * frequent token. One shuffle by (doc, term) with map-side combine, then a
    * per-doc aggregate — each ratio is integer counts and one IEEE division. */
  val repetition = QueryDef(
    "text_repetition",
    "within-doc repetition: duplicate-unigram fraction + top-token share",
    Some(s"""WITH tok AS (SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
                 FROM documents),
             tf AS (SELECT doc_id, term, count(*) AS c FROM tok
                    WHERE term <> '' GROUP BY 1, 2),
             d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                          count(*) AS n_distinct, max(c) AS top_c
                   FROM tf GROUP BY 1)
             SELECT doc_id, total AS n_tokens,
                    ${Num.sql("1.0 - CAST(n_distinct AS DOUBLE) / total", 4)} AS dup_frac,
                    ${Num.sql("CAST(top_c AS DOUBLE) / total", 4)} AS top_share
             FROM d"""),
    (s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
      tf.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_c"))
        .select(col("doc_id"), col("total").as("n_tokens"),
          Num.pround(lit(1.0) - col("n_distinct").cast("double") / col("total"), 4)
            .as("dup_frac"),
          Num.pround(col("top_c").cast("double") / col("total"), 4).as("top_share"))
    })

  /** Temperature-scaled source mixing (the multilingual-LM sampling law,
    * e.g. mT5's alpha-smoothed mixture): source s gets sampling weight
    * w_s ∝ (token mass of s)^alpha with alpha = 0.5, so low-resource sources
    * are UP-weighted relative to proportional sampling; per-source keep rate
    * = min(1, targetTokens · w_s / n_s) with target = half the corpus.
    * The keep decision per doc is content-addressed (md5 prefix vs the
    * rate's 16-bit hex threshold — same determinism discipline as
    * [[trainValSplit]]), so the sample is reproducible across engines,
    * runs, and partitionings. Unlike [[corpusMix]]'s FIXED weights, the
    * rates here are DERIVED from the data: one token-count aggregation
    * (20 rows) that broadcasts back; the corpus itself never shuffles. */
  val corpusMixTemperature = QueryDef(
    "corpus_mix_temperature",
    "alpha=0.5 temperature-scaled source mix targeting half the token mass, content-hash keep decisions",
    Some(s"""WITH tk AS (SELECT doc_id, source, text,
                      len(string_split_regex(trim(lower(text)), '\\s+')) AS nt
                      FROM documents),
       cnt AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_s FROM tk GROUP BY 1),
       tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot,
                      sum(sqrt(CAST(n_s AS DOUBLE))) AS sum_w FROM cnt),
       rates AS (SELECT source,
                        least(1.0, ${Num.sql(
                          "(CAST(n_tot AS DOUBLE) / 2) * sqrt(CAST(n_s AS DOUBLE)) / sum_w / n_s", 6)}) AS rate
                 FROM cnt CROSS JOIN tot),
       thr AS (SELECT source, rate,
                      lower(lpad(to_hex(CAST(floor(rate * 65536) AS BIGINT)), 4, '0')) AS h4
               FROM rates)
       SELECT doc_id, source, rate FROM tk JOIN thr USING (source)
       WHERE rate >= 1.0 OR substring(md5(text), 1, 4) < h4"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          size(Text.tokens(col("text"))).cast("long").as("nt"))
      // cached: two consumers (the corpus totals + the rate projection) —
      // uncached, the corpus tokenization behind the per-source counts runs
      // twice (the final doc join prunes nt, so it does not tokenize)
      val cnt = docs.groupBy(col("source")).agg(sum(col("nt")).as("n_s"))
        .cache()
      val tot = cnt.agg(sum(col("n_s")).as("n_tot"),
        sum(sqrt(col("n_s").cast("double"))).as("sum_w"))
      val rates = cnt.crossJoin(broadcast(tot))
        .select(col("source"),
          least(lit(1.0), Num.pround(
            (col("n_tot").cast("double") / 2) * sqrt(col("n_s").cast("double"))
              / col("sum_w") / col("n_s"), 6)).as("rate"))
        .withColumn("h4",
          lower(lpad(hex(floor(col("rate") * 65536).cast("long")), 4, "0")))
      docs.join(broadcast(rates), "source")
        .filter(col("rate") >= 1.0 || substring(md5(col("text")), 1, 4) < col("h4"))
        .select(col("doc_id"), col("source"), col("rate"))
    })

  /** Greedy BPE merge TRAINING over the token stream — the missing step
    * between [[bpeTokens]] (pre-tokenization) and `vocab_encode_ids`
    * (applying a finished vocabulary): learn the merge table itself. Each
    * round counts adjacent symbol pairs across the corpus, adopts the most
    * frequent pair (ties: lexicographically smallest) as a new merged
    * symbol, and rewrites every sequence left-to-right non-overlapping —
    * the exact algorithm BPE/WordPiece trainers run over characters,
    * applied here at token granularity (phrase merges).
    *
    * Scale: the corpus NEVER leaves the cluster — each round is one
    * (pair → count) aggregation (map-side combined, 16-byte-ish rows) plus a
    * TakeOrdered(1); only the single winning pair crosses to the driver
    * (the pagerank-style loop scalar), and the rewrite is a typed map over
    * cached sequences. Rounds are sequential by construction (BPE's greedy
    * chain); parallelism lives inside each round. Returns (step, left,
    * right, freq) — freq as counted when the pair was adopted. */
  def bpeTrain(docs: DataFrame, id: String, text: String,
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    import docs.sparkSession.implicits._
    def applyMerge(a: Array[String], l: String, r: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < a.length) {
        if (i + 1 < a.length && a(i) == l && a(i + 1) == r) {
          out += (l + " " + r); i += 2
        } else { out += a(i); i += 1 }
      }
      out.result()
    }
    var seqs = docs.select(col(text)).as[String]
      .map(_.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")).cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val top = seqs.flatMap(a =>
          if (a.length < 2) Iterator.empty
          else a.sliding(2).map(p => (p(0), p(1))))
        .toDF("l", "r").groupBy(col("l"), col("r"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect().headOption
      top match {
        case Some(row) =>
          val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((step, l, r, f))
          val next = seqs.map(applyMerge(_, l, r)).cache()
          next.count() // materialize before dropping the parent
          seqs.unpersist()
          seqs = next
        case None => done = true
      }
      step += 1
    }
    seqs.unpersist()
    merges.result()
  }

  /** Per-document unigram (Shannon) entropy in nats — the information-
    * density quality signal complementing [[repetition]]'s duplicate
    * fraction: H = ln(n) - (Σ c·ln c)/n over term counts c. Low-entropy
    * documents are degenerate/repetitive; unusually high entropy on a known
    * vocabulary signals noise. One (doc, term) shuffle with map-side
    * combine, then a per-doc aggregate; the only floating-point steps are
    * one ln per distinct term and the final rounded division (sub-ulp
    * cross-engine drift absorbed by the 1e-6 grid, the [[graft.operators
    * .Curation]] DSIR discipline). */
  val entropy = QueryDef(
    "text_entropy",
    "per-doc unigram Shannon entropy (nats, rounded 1e-6) + token count",
    Some(s"""WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
                  FROM documents),
       term AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
       agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                      sum(c * ln(c)) AS sclnc FROM term GROUP BY 1)
       SELECT doc_id, n_tokens,
              ${Num.sql("ln(n_tokens) - sclnc / n_tokens", 6)} AS entropy
       FROM agg"""),
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * log(col("c"))).as("sclnc"))
      .select(col("doc_id"), col("n_tokens"),
        Num.pround(log(col("n_tokens")) - col("sclnc") / col("n_tokens"), 6)
          .as("entropy")))

  /** MOSS winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): hash every word 3-gram, slide a window of [[WinnowW]]
    * consecutive shingle hashes, and per window keep the RIGHTMOST minimum —
    * the guarantee is every match of length >= k+w-1 shares a selected
    * fingerprint, at ~2/(w+1) the density of the full shingle set. This is
    * the robust local fingerprint the n-gram/minhash family lacks: selected
    * positions are stable under edits outside the window.
    *
    * The textbook algorithm is a per-doc sequential scan; the distributed
    * form here replaces it with an O(1)-lookahead window characterization so
    * no blocked self-join and no per-doc sequential pass is needed: position
    * p is selected iff SOME window start i in [p-w+1, p] is valid and p is
    * its rightmost argmin, i.e. all hashes in [i, p-1] are >= h(p) (p wins
    * left ties) and all in [p+1, i+w-1] are > h(p) (right ties win over p).
    * With per-position window mins over the previous/next 1..w-1 rows that
    * is a pure boolean over 2(w-1) window columns — one hash shuffle by
    * doc_id, WindowExec over bounded-length docs, linear at any corpus size.
    * Hashes are the first 8 md5 hex chars compared lexicographically
    * (identical ASCII collation in both engines — no integer conversion
    * needed for a min).
    */
  val WinnowK = 3
  val WinnowW = 4

  def winnowingFingerprints(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("t")
    val shingleAt = (i: org.apache.spark.sql.Column) =>
      concat_ws(" ", (0 until WinnowK).map(j => element_at(t, i + j)): _*)
    val sh = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(t) >= WinnowK + WinnowW - 1) // at least one full window
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(t) - (WinnowK - 1)), shingleAt)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        substring(md5(col("col")), 1, 8).as("h"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val whole = Window.partitionBy("doc_id")
    val withMins = sh
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("p1", min(col("h")).over(byDoc.rowsBetween(-1, -1)))
      .withColumn("p2", min(col("h")).over(byDoc.rowsBetween(-2, -1)))
      .withColumn("p3", min(col("h")).over(byDoc.rowsBetween(-3, -1)))
      .withColumn("f1", min(col("h")).over(byDoc.rowsBetween(1, 1)))
      .withColumn("f2", min(col("h")).over(byDoc.rowsBetween(1, 2)))
      .withColumn("f3", min(col("h")).over(byDoc.rowsBetween(1, 3)))
    val h = col("h")
    val selected =
      (col("pos") + 3 <= col("m") && h < col("f3")) ||                       // d=0
        (col("pos") >= 2 && col("pos") + 2 <= col("m") &&
          col("p1") >= h && h < col("f2")) ||                                // d=1
        (col("pos") >= 3 && col("pos") + 1 <= col("m") &&
          col("p2") >= h && h < col("f1")) ||                                // d=2
        (col("pos") >= 4 && col("p3") >= h)                                  // d=3
    withMins.filter(selected)
      .select(col("doc_id"), col("pos"), h.as("fp"))
  }

  val winnowing = QueryDef(
    "winnowing_fingerprints",
    "MOSS winnowing: rightmost-min of each 4-window over 3-gram hashes, via O(1) window mins",
    Some("""WITH toks AS (SELECT doc_id,
                    string_split_regex(trim(lower(text)), '\s+') AS t
                  FROM documents),
       sh AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                     substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8) AS h
              FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 2)) AS u(i)
              WHERE len(t) >= 6),
       wm AS (SELECT doc_id, pos, h,
                count(*) OVER (PARTITION BY doc_id) AS m,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS p1,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS p2,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS p3,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS f1,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS f2,
                min(h) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS f3
              FROM sh)
       SELECT doc_id, pos, h AS fp FROM wm
       WHERE (pos + 3 <= m AND h < f3)
          OR (pos >= 2 AND pos + 2 <= m AND p1 >= h AND h < f2)
          OR (pos >= 3 AND pos + 1 <= m AND p2 >= h AND h < f1)
          OR (pos >= 4 AND p3 >= h)"""),
    (s, dir) => winnowingFingerprints(Tables.documents(s, dir)))

  val defs: Seq[QueryDef] =
    Seq(tokenStats, quality, langid, fingerprint, bigramDf, bpeTokens,
      trainValSplit, redact, corpusMix, repetition, corpusMixTemperature,
      entropy, winnowing)
}
