package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, Dataset}
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
}
