package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental near-duplicate detection — the continuous form of
  * [[graft.operators.Dedup.minHashDedup]]: documents arrive on a stream and
  * each is judged against everything already ingested, in one pass, without
  * ever re-scanning the corpus (the batch pipeline re-reads all N docs per
  * run; at a 100 TB corpus with a trickle of new docs that is the wrong
  * asymptotics — the stream form touches only the new docs' band buckets).
  *
  * Same MinHash/LSH geometry as the batch path (32 hashes, 8 bands x 4 rows,
  * word 3-gram shingles): a doc's signature is banded into 8 keys; state
  * lives PER BAND BUCKET (keyed flatMapGroupsWithState) as the signature
  * list of prior docs in that bucket; a new doc matching any bucket-mate at
  * estimated Jaccard >= threshold is flagged a duplicate of the earliest
  * such doc. A per-doc aggregation then reduces the 8 band verdicts:
  * `dup_of = min(matching keeper)` or -1 for a keeper.
  *
  * Scale notes: state per bucket is (32 longs + id) per KEPT doc — ~260 B —
  * and buckets shard across executors by (band, band_hash), so state scales
  * with corpus size / parallelism, not stream rate; near-dup docs are not
  * added to state (their signature is already represented by the keeper).
  * For unbounded streams bound state with `maxBucket` (newest-kept eviction)
  * — a full solution would TTL buckets by event time.
  */
object CorpusDedup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleN = 3
  val Threshold = 0.8

  case class StreamDoc(doc_id: Long, text: String)
  case class BandProbe(band: Int, band_hash: Long, doc_id: Long, sig: Array[Long])
  case class BandVerdict(doc_id: Long, band: Int, dup_of: Long)
  case class BucketEntry(doc_id: Long, sig: Array[Long])
  case class BucketState(entries: List[BucketEntry])

  /** FNV-1a 64-bit — identical to the batch shingle hash (Dedup.fnv64). */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer — the per-slot seeded mix for the signature. */
  private def mix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature of a document: per-slot min of a seeded mix over the
    * FNV-hashed word 3-gram shingle set. Pure driver/executor-side Scala —
    * the streaming path computes it per new doc, not via a corpus groupBy. */
  def signature(text: String): Array[Long] = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    if (toks.length >= ShingleN) {
      toks.sliding(ShingleN).foreach { g =>
        val sh = fnv64(g.mkString(" "))
        var i = 0
        while (i < NumHashes) {
          val h = mix64(sh ^ (i * 0x9e3779b97f4a7c15L))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
    }
    sig
  }

  /** The 8 LSH band keys of a signature (hash of its 4-slot slice). */
  def bandKeys(sig: Array[Long]): Array[Long] =
    Array.tabulate(Bands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var i = b * RowsPerBand
      while (i < (b + 1) * RowsPerBand) { h = (h ^ sig(i)) * 0x100000001b3L; i += 1 }
      h
    }

  /** Estimated Jaccard = fraction of agreeing signature slots. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < NumHashes) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / NumHashes
  }

  private def processBucket(maxBucket: Int)(
      key: (Int, Long), rows: Iterator[BandProbe],
      state: GroupState[BucketState]): Iterator[BandVerdict] = {
    var stored = state.getOption.map(_.entries).getOrElse(Nil)
    val out = List.newBuilder[BandVerdict]
    // earliest doc_id first: intra-batch duplicates resolve to the lowest id
    rows.toSeq.sortBy(_.doc_id).foreach { p =>
      stored.filter(e => estJaccard(e.sig, p.sig) >= Threshold)
        .map(_.doc_id).sorted.headOption match {
        case Some(keeper) => out += BandVerdict(p.doc_id, key._1, keeper)
        case None =>
          if (stored.size < maxBucket) stored = BucketEntry(p.doc_id, p.sig) :: stored
          out += BandVerdict(p.doc_id, key._1, -1L)
      }
    }
    state.update(BucketState(stored))
    out.result().iterator
  }

  /** Streaming near-dup verdicts: one row per incoming doc with `dup_of` =
    * the earliest matching prior doc's id, or -1 for a first-seen keeper.
    * Run the result in Update output mode (it ends in an aggregation). */
  def incrementalDedup(docs: Dataset[StreamDoc],
      maxBucket: Int = 10000): DataFrame = {
    import docs.sparkSession.implicits._
    val probes = docs.flatMap { d =>
      val sig = signature(d.text)
      bandKeys(sig).zipWithIndex.map { case (bh, b) =>
        BandProbe(b, bh, d.doc_id, sig)
      }
    }
    val verdicts = probes
      .groupByKey(p => (p.band, p.band_hash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processBucket(maxBucket))
    verdicts.toDF()
      .groupBy(col("doc_id"))
      .agg(coalesce(min(when(col("dup_of") >= 0, col("dup_of"))), lit(-1L))
        .as("dup_of"))
  }

  case class TimedDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class TimedBandProbe(band: Int, band_hash: Long, doc_id: Long,
      sig: Array[Long], ts: java.sql.Timestamp)
  case class TimedBandVerdict(doc_id: Long, ts: java.sql.Timestamp,
      band: Int, dup_of: Long)
  case class TimedEntry(doc_id: Long, sig: Array[Long], last_ms: Long)
  case class TimedBucketState(entries: List[TimedEntry])

  /** The ROLLING-HORIZON form of [[incrementalDedup]] — the eviction story
    * the unbounded-stream contract needs (SCALE.md "streaming CorpusDedup
    * state contract"): a kept signature is authoritative only for `horizon`
    * of EVENT time past its last match, after which its band buckets are
    * reclaimed and the same content arriving later is a fresh keeper. Two
    * mechanisms, both required:
    *
    *  - entry-level filter: on every bucket invocation, stored entries whose
    *    refreshed last-seen timestamp has fallen `horizon` behind the
    *    current watermark are dropped BEFORE matching. This is what makes
    *    eviction correct for hot buckets — Spark fires a group's event-time
    *    timeout only when the group receives NO data, so a bucket that keeps
    *    getting traffic would otherwise retain expired entries forever.
    *  - group-level timeout (EventTimeTimeout set to last-seen + horizon):
    *    reclaims the state of buckets that stop receiving traffic entirely —
    *    the long tail that entry filtering alone would never visit again.
    *
    * Matching a keeper REFRESHES its last-seen (the keeper stays
    * representative of its cluster while the cluster is live — LRU
    * semantics, same reason caches refresh on hit). Returns the raw
    * per-(doc, band) verdicts (doc_id, ts, band, dup_of); reduce per doc in
    * the sink via [[reducePerDoc]] — see its scaladoc for why the reduction
    * must live OUTSIDE the streaming graph. Total query state is O(docs
    * kept within one horizon), not O(corpus) — the knob that turns the
    * corpus-linear soak slope into a plateau. Append output mode. */
  def incrementalDedupTtl(docs: Dataset[TimedDoc], horizonMs: Long,
      maxBucket: Int = 10000): DataFrame = {
    import docs.sparkSession.implicits._
    require(horizonMs > 0, "horizon must be positive")
    val horizon = s"$horizonMs milliseconds"
    val probes = docs.flatMap { d =>
      val sig = signature(d.text)
      bandKeys(sig).zipWithIndex.map { case (bh, b) =>
        TimedBandProbe(b, bh, d.doc_id, sig, d.ts)
      }
    }.withWatermark("ts", horizon)
    val verdicts = probes
      .groupByKey(p => (p.band, p.band_hash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[TimedBandProbe],
            state: GroupState[TimedBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var stored = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(e => e.last_ms + horizonMs > wm)
            val out = List.newBuilder[TimedBandVerdict]
            rows.toSeq.sortBy(_.doc_id).foreach { p =>
              val tMs = p.ts.getTime
              stored.filter(e => estJaccard(e.sig, p.sig) >= Threshold)
                .map(_.doc_id).sorted.headOption match {
                case Some(keeper) =>
                  stored = stored.map(e =>
                    if (e.doc_id == keeper) e.copy(last_ms = math.max(e.last_ms, tMs))
                    else e)
                  out += TimedBandVerdict(p.doc_id, p.ts, key._1, keeper)
                case None =>
                  if (stored.size < maxBucket)
                    stored = TimedEntry(p.doc_id, p.sig, tMs) :: stored
                  out += TimedBandVerdict(p.doc_id, p.ts, key._1, -1L)
              }
            }
            if (stored.isEmpty) state.remove()
            else {
              state.update(TimedBucketState(stored))
              state.setTimeoutTimestamp(
                math.max(stored.map(_.last_ms).max + horizonMs, wm + 1L))
            }
            out.result().iterator
          }
      }
    verdicts.toDF()
  }

  /** Per-doc reduction of [[incrementalDedupTtl]]'s band verdicts — run it
    * in the SINK (`foreachBatch`), where the micro-batch is a plain batch
    * frame and the group-by is exact and stateless: a doc's 8 band verdicts
    * all emit in its arrival batch, so no cross-batch state is ever needed.
    * Keeping this out of the streaming graph is load-bearing, not style:
    * Spark's global-watermark correctness checker rejects
    * flatMapGroupsWithState feeding ANY further stateful operator (it
    * cannot prove the black-box stage emits nothing older than the
    * watermark), so the TTL query stays a single stateful op and its total
    * state stays O(docs within one horizon). */
  def reducePerDoc(bandVerdicts: DataFrame): DataFrame =
    bandVerdicts
      .groupBy(col("doc_id"))
      .agg(coalesce(min(when(col("dup_of") >= 0, col("dup_of"))), lit(-1L))
        .as("dup_of"))

  /** Streaming EXACT dedup: first writer wins on the content hash — the
    * compaction analog for document streams. State is one 16-byte hash per
    * distinct doc (dropDuplicates keyed state); bound it with a watermark
    * variant (dropDuplicatesWithinWatermark) when the stream is unbounded. */
  def exactDedupStream(docs: Dataset[StreamDoc]): DataFrame =
    docs.toDF()
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")

  case class ParaProbe(para_hash: Long, doc_id: Long, chunk_idx: Long,
      chunk: String, n_paras: Long)
  case class ParaVerdict(doc_id: Long, chunk_idx: Long, chunk: String,
      n_paras: Long, kept: Boolean)

  /** Streaming paragraph-granularity dedup with document REWRITE — the
    * continuous form of [[graft.operators.Dedup.paragraphDedup]]: each
    * arriving document's token stream is chunked into fixed
    * `paraTokens`-token paragraphs; a paragraph is kept only the FIRST time
    * its hash is ever seen on the stream (intra-batch ties resolve to the
    * earliest (doc_id, position), matching the batch window's order), and
    * each doc's row carries its surviving text reassembled in order.
    * Output schema matches the batch operator exactly:
    * (doc_id, n_paras, n_kept, kept_text). Run in Update mode (the
    * per-doc reassembly is an aggregation after the stateful stage).
    *
    * Scale: state is ONE BOOLEAN per distinct paragraph, keyed by an 8-byte
    * fnv64 hash (the same narrow-state move as [[incrementalDedup]]'s band
    * buckets — paragraph text never enters state), sharded across executors
    * by hash; for unbounded streams TTL the keys by event time
    * (GroupStateTimeout) once dedup only needs a rolling horizon. */
  def paragraphDedupStream(docs: Dataset[StreamDoc],
      paraTokens: Int = graft.operators.Dedup.ParaTokens): DataFrame = {
    import docs.sparkSession.implicits._
    val probes = docs.flatMap { d =>
      val toks = d.text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      val chunks = toks.grouped(paraTokens).map(_.mkString(" ")).toArray
      chunks.iterator.zipWithIndex.map { case (c, i) =>
        ParaProbe(fnv64(c), d.doc_id, i.toLong, c, chunks.length.toLong)
      }
    }
    val verdicts = probes
      .groupByKey(_.para_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[ParaProbe], state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(p => (p.doc_id, p.chunk_idx)).map { p =>
            val kept = !seen
            seen = true
            ParaVerdict(p.doc_id, p.chunk_idx, p.chunk, p.n_paras, kept)
          }
          state.update(seen)
          out.iterator
      }
    verdicts.toDF()
      .groupBy(col("doc_id"))
      .agg(max(col("n_paras")).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("kept"), struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("kept_text"))
  }
}
