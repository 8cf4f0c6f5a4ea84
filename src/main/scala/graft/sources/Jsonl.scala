package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus I/O — the interchange format LLM training corpora
  * actually arrive in (one JSON document per line, typically gzip-sharded).
  * The engine's documents schema is the common (id, text, metadata...) shape;
  * this source binds JSONL files to that schema with the ingest-edge
  * discipline the rest of the engine uses (decodeWithQuarantine,
  * AvroCodec's drop-on-corrupt): malformed lines are QUARANTINED to a side
  * channel, never silently dropped and never failing the job.
  *
  * Scale notes: Spark parallelizes JSONL by file split (and transparently
  * decompresses .gz — gzip shards parallelize per FILE, so corpora should
  * arrive as many shards, not one giant file). The explicit schema below
  * skips the schema-inference pre-scan entirely — at 100 TB inference would
  * read the corpus twice. Column pruning still reaches the parser (Jackson
  * skips unprojected fields), but JSONL has no rowgroup statistics — convert
  * to parquet (`toParquet`) after the first pass; every downstream operator
  * then gets pushdown + pruning for free.
  */
object Jsonl {

  /** The documents-table schema plus Spark's PERMISSIVE-mode corrupt-record
    * column. Extra JSON fields are ignored; missing fields are null. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL corpus: (documents, quarantine). A line that fails to
    * parse — or parses but misses the required doc_id/text — lands in the
    * quarantine frame with its raw text preserved for forensics; clean rows
    * arrive with `n_chars` defaulted from the text when absent. */
  def readDocuments(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      // the corrupt-record column only materializes alongside a cached or
      // re-scanned plan; caching also keeps the two branches to one read
      .cache()
    val bad = raw.filter(col("_corrupt").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(coalesce(col("_corrupt"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))).as("raw_line"))
    val good = raw.filter(col("_corrupt").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long"))
          .as("n_chars"))
    (good, bad)
  }

  /** Land a JSONL corpus as the parquet documents table (the format every
    * operator in the engine reads) — run once per corpus delivery, then all
    * downstream passes get rowgroup stats, pushdown, and pruning. */
  def toParquet(docs: DataFrame, outDir: String,
      partitions: Int = 0): Unit = {
    val d = if (partitions > 0) docs.repartition(partitions) else docs
    d.write.mode("overwrite").parquet(outDir)
  }

  /** Write documents back out as JSONL shards (interchange with external
    * tools); one shard per partition, gzip for transport. */
  def writeDocuments(docs: DataFrame, outDir: String): Unit =
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .write.mode("overwrite")
      .option("compression", "gzip")
      .json(outDir)
}
