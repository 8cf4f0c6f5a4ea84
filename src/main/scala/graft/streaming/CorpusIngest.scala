package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The composed streaming training-data ingest: documents stream in, junk is
  * dropped by per-row quality gates BEFORE any state is touched, survivors
  * run through [[CorpusDedup.incrementalDedup]] — so dedup state holds only
  * documents worth keeping (a junk keeper would otherwise shadow clean
  * near-dups forever), and the stateful stage's memory scales with the CLEAN
  * corpus.
  *
  * Stage order is the scale decision: the quality gate is stateless
  * per-row Column arithmetic (scan speed, no shuffle) and typically removes
  * a large corpus fraction; running it first shrinks both the signature
  * computation and the band-bucket state footprint.
  */
object CorpusIngest {

  val MinTokens = 5L
  val MaxMeanTokenLen = 20.0

  /** Per-row quality gate — same primitives as the batch `text_quality`
    * query (token count, dense length, mean token length), applied as a
    * streaming-safe stateless filter. */
  def qualityGate(docs: Dataset[CorpusDedup.StreamDoc]): DataFrame = {
    val toks = Text.tokens(col("text"))
    val dense = length(regexp_replace(trim(col("text")), "\\s+", ""))
    docs.toDF()
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        dense.cast("double") / greatest(col("n_tokens"), lit(1L)))
      .filter(col("n_tokens") >= MinTokens &&
        col("mean_token_len") <= MaxMeanTokenLen)
  }

  /** Quality-gated incremental dedup: one verdict row per SURVIVING doc —
    * `dup_of` = earliest kept near-dup, -1 for keepers. Junk documents get
    * no row and leave no state. Run in Update output mode. */
  def ingest(docs: Dataset[CorpusDedup.StreamDoc],
      maxBucket: Int = 10000): DataFrame = {
    import docs.sparkSession.implicits._
    val clean = qualityGate(docs)
      .select(col("doc_id"), col("text")).as[CorpusDedup.StreamDoc]
    CorpusDedup.incrementalDedup(clean, maxBucket)
  }

  /** xxhash64 of every `w`-token shingle of a text column — the column-level
    * shingle form (the batch pipelines use the typed fnv64 pass; here the
    * hashes only have to agree between the two sides of the SAME gate, so
    * the codegen'd builtin hash is the right choice). */
  def shingleHashes(text: Column, w: Int): Column = {
    val toks = Text.tokens(text)
    when(size(toks) >= w,
      transform(sequence(lit(1), size(toks) - (w - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(w))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Streaming benchmark decontamination — the streaming face of the batch
    * `decontaminate_benchmark` operator: drop any arriving document that
    * shares a `w`-token shingle with the (static) benchmark corpus. The
    * benchmark compresses ONCE, driver-side, into a broadcast Bloom sketch
    * of shingle hashes (~1.2 MB per million shingles at 1% fpp — the same
    * move as [[graft.operators.Pipeline.bloomPrune]]); every arriving doc is
    * then a STATELESS per-row probe, so the gate adds no streaming state and
    * no stream-side shuffle at any corpus size. Bloom false positives drop
    * extra docs (conservative, safe for decontamination); false negatives
    * cannot occur, so nothing contaminated leaks through. */
  def decontaminationGate(docs: Dataset[CorpusDedup.StreamDoc],
      benchmark: DataFrame, w: Int = 8, expectedShingles: Long = 1000000L,
      fpp: Double = 0.01): Dataset[CorpusDedup.StreamDoc] = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val benchShingles = benchmark
      .select(explode(shingleHashes(col("text"), w)).as("s")).distinct()
    val bf = benchShingles.stat.bloomFilter("s", expectedShingles, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val anyHit = udf((hs: Seq[Long]) => hs.exists(bfB.value.mightContainLong))
    docs.toDF()
      .filter(!anyHit(shingleHashes(col("text"), w)))
      .select(col("doc_id"), col("text")).as[CorpusDedup.StreamDoc]
  }

  /** Streaming SEMANTIC decontamination — the embedding-space companion to
    * [[decontaminationGate]]: the n-gram Bloom gate needs verbatim w-token
    * overlap, so a paraphrased benchmark item sails through it; this gate
    * drops any arriving document whose embedding lies within
    * `cosine >= minCos` of a watchlist vector. The watchlist broadcasts
    * with precomputed norms and the stream side is a stateless broadcast
    * anti-join probe (native [[graft.functions.DotProduct]] per candidate)
    * — no streaming state, no stream-side shuffle; per-row cost is
    * |watchlist| dot products, the same economics as the batch
    * `semdedup_verdicts` verify stage. Emits the surviving (doc_id,
    * embedding) rows.
    *
    * Degenerate embeddings (ADVICE r9): a null or zero-norm vector has no
    * direction, so cosine is undefined for it. Watchlist entries like that
    * are dropped up front (they could never match; keeping them would only
    * make the NaN reach the predicate). Stream rows like that PASS THROUGH
    * deliberately — the predicate is guarded with `sn > 0` so the NaN/NULL
    * never decides the anti-join implicitly; a caller wanting to quarantine
    * directionless rows instead should filter them before the gate. */
  def semanticDecontaminationGate(stream: DataFrame, watchlist: DataFrame,
      minCos: Double): DataFrame = {
    import graft.functions.Vec
    val w = broadcast(watchlist
      .select(Vec.toDouble(col("embedding")).as("wv"))
      .withColumn("wn", Vec.norm(col("wv")))
      .filter(col("wn") > 0))
    stream
      .withColumn("sv", Vec.toDouble(col("embedding")))
      .withColumn("sn", Vec.norm(col("sv")))
      .join(w, col("sn") > 0 &&
        Vec.cosinePrenormed(Vec.dot(col("sv"), col("wv")),
          col("sn"), col("wn")) >= minCos, "left_anti")
      .select(col("doc_id"), col("embedding"))
  }

  /** The full composed ingest: decontaminate (stateless broadcast probe) →
    * quality gate (stateless) → incremental near-dup dedup (stateful) —
    * stateless stages first so the band-bucket state only ever holds clean,
    * uncontaminated keepers. */
  def ingestDecontaminated(docs: Dataset[CorpusDedup.StreamDoc],
      benchmark: DataFrame, w: Int = 8,
      maxBucket: Int = 10000): DataFrame =
    ingest(decontaminationGate(docs, benchmark, w), maxBucket)

  /** Streaming LM quality gate — the streaming face of the batch
    * `doc_lm_predictability` filter: drop arriving documents whose mean
    * trigram conditional probability under a REFERENCE corpus model falls
    * below `minScore` (gibberish/noise scores near zero; natural text from
    * the model's domain scores well above). The model is built ONCE from the
    * static reference corpus — (w1 w2 w3) -> P(w3|w1 w2), exact count
    * ratios — and broadcast as a plain map keyed by the xxhash-free joined
    * trigram string; each arriving doc is then a STATELESS per-row score:
    * no streaming state, no stream-side shuffle, same scale contract as
    * [[decontaminationGate]]. Unseen trigrams score 0 (maximally surprising
    * — the conservative choice for a quality gate). */
  def lmQualityGate(docs: Dataset[CorpusDedup.StreamDoc],
      reference: DataFrame, minScore: Double,
      maxModelSize: Int = 1 << 20): Dataset[CorpusDedup.StreamDoc] = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val modelB = spark.sparkContext.broadcast(
      trigramModel(reference, maxModelSize))
    val score = udf { (t: String) =>
      val a = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      if (a.length < 3) 0.0
      else {
        val probs = a.sliding(3).map(g =>
          modelB.value.getOrElse(g.mkString(" "), 0.0))
        var s = 0.0; var n = 0
        probs.foreach { p => s += p; n += 1 }
        s / n
      }
    }
    docs.toDF().filter(score(col("text")) >= minScore)
      .select(col("doc_id"), col("text")).as[CorpusDedup.StreamDoc]
  }

  /** The full curated ingest — every stateless gate ahead of the stateful
    * dedup, in cost order: benchmark decontamination (broadcast Bloom
    * probe), per-row quality, DSIR domain fit (broadcast 256-row model) —
    * then incremental near-dup dedup. Band-bucket state only ever holds
    * clean, on-target, uncontaminated keepers; each gate is a stateless
    * filter so the chain adds ZERO streaming state beyond the dedup's. */
  def ingestCurated(docs: Dataset[CorpusDedup.StreamDoc],
      benchmark: DataFrame, dsirProfile: Map[String, Long],
      minWeightMicro: Long, w: Int = 8,
      maxBucket: Int = 10000): DataFrame = {
    import docs.sparkSession.implicits._
    val decon = decontaminationGate(docs, benchmark, w)
    val clean = qualityGate(decon)
      .select(col("doc_id"), col("text")).as[CorpusDedup.StreamDoc]
    val onTarget = dsirGate(clean, dsirProfile, minWeightMicro)
      .select(col("doc_id"), col("text")).as[CorpusDedup.StreamDoc]
    CorpusDedup.incrementalDedup(onTarget, maxBucket)
  }

  /** Streaming DSIR gate — the streaming face of the batch `dsir_weights`
    * operator: score each arriving document's hashed-bigram profile against
    * a TRAINED target-vs-raw log-likelihood model
    * ([[graft.operators.Curation.dsirProfile]]) and keep docs scoring at
    * least `minWeightMicro` micro-nats — continuous importance-based
    * selection toward a target domain. The model is 256 (bucket, lr_micro)
    * entries BY CONSTRUCTION (bounded however large the reference corpus),
    * broadcast once; each doc is a stateless per-row score — no streaming
    * state, no stream-side shuffle, same scale contract as
    * [[decontaminationGate]]. Scoring arithmetic is identical to the batch
    * operator (same md5-prefix bucketing, same integer micro-nat sum), so a
    * doc's stream score equals its batch `weight_micro` exactly. */
  def dsirGate(docs: Dataset[CorpusDedup.StreamDoc],
      profile: Map[String, Long], minWeightMicro: Long): DataFrame = {
    val spark = docs.sparkSession
    val profB = spark.sparkContext.broadcast(profile)
    val weight = udf { (t: String) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val toks = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      var w = 0L
      if (toks.length >= 2) {
        toks.sliding(2).foreach { g =>
          val d = md.digest(g.mkString(" ").getBytes("UTF-8"))
          val bucket = f"${d(0) & 0xff}%02x"
          w += profB.value.getOrElse(bucket, 0L)
          md.reset()
        }
      }
      w
    }
    docs.toDF()
      .withColumn("weight_micro", weight(col("text")))
      .filter(col("weight_micro") >= minWeightMicro)
  }

  /** The gate's trigram model, bounded to the `maxModelSize` most frequent
    * trigrams so the driver/broadcast footprint is capped however large the
    * reference corpus is (a web-scale reference would otherwise collect an
    * unbounded map). Conditional probabilities are computed against the FULL
    * corpus prefix totals BEFORE the cap, so every kept trigram's probability
    * is identical to the uncapped model's; a dropped (rare) trigram scores 0
    * like any unseen one. Capped scores are therefore a LOWER BOUND of
    * uncapped scores, equal for any document whose trigrams all survive —
    * a quality gate keys on common language, which is exactly what survives
    * a frequency cap. Top-K selection is TakeOrdered (per-partition heap),
    * never a global sort, with the trigram string as the deterministic
    * tiebreak. */
  private[streaming] def trigramModel(reference: DataFrame,
      maxModelSize: Int): Map[String, Double] = {
    val tg = reference
      .select(explode(trigrams(col("text"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c3"))
      .withColumn("prefix", substring_index(col("g"), " ", 2))
    tg.withColumn("c2", sum(col("c3")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("prefix"))))
      .select(col("g"), col("c3"), (col("c3").cast("double") / col("c2")).as("p"))
      .orderBy(col("c3").desc, col("g"))
      .limit(maxModelSize)
      .select(col("g"), col("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** All `w=3`-token shingles of a text column as joined strings. */
  private def trigrams(text: Column): Column = {
    val toks = Text.tokens(text)
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }
}
