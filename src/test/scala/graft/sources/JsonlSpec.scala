package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JSONL corpus ingest: clean lines bind to the documents schema, malformed
  * or incomplete lines quarantine with their raw text, round-trip through
  * gzip JSONL shards and parquet landing is lossless. */
class JsonlSpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("jsonl-fix")
    val lines = Seq(
      """{"doc_id": 1, "text": "clean doc one", "lang": "en", "source": "web", "n_chars": 13}""",
      // n_chars absent -> defaulted from text length
      """{"doc_id": 2, "text": "no char count", "lang": "de", "source": "web"}""",
      // extra field ignored
      """{"doc_id": 3, "text": "extra field", "lang": "en", "source": "web", "n_chars": 11, "score": 0.9}""",
      """this is not json at all""",
      // parses but misses required text
      """{"doc_id": 5, "lang": "en", "source": "web"}""")
    Files.write(dir.resolve("part-000.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("clean rows bind, defaults fill, malformed and incomplete lines quarantine") {
    val (good, bad) = Jsonl.readDocuments(spark, writeFixture())
    val rows = good.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, "clean doc one", 13L),
      (2L, "no char count", 13L),  // defaulted n_chars = length(text)
      (3L, "extra field", 11L)))
    val q = bad.collect().map(_.getString(0))
    assert(q.length == 2)
    assert(q.exists(_.contains("not json at all"))) // raw line preserved
    assert(q.exists(_.contains("\"doc_id\":5")))    // incomplete row kept for forensics
  }

  test("parquet landing + JSONL round-trip are lossless and operator-ready") {
    val (good, _) = Jsonl.readDocuments(spark, writeFixture())
    val pq = Files.createTempDirectory("jsonl-pq").toString + "/documents.parquet"
    Jsonl.toParquet(good, pq)
    val landed = spark.read.parquet(pq)
    assert(landed.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    // the landed table drives a real operator unchanged
    val dedup = graft.operators.Dedup.exact(landed, "doc_id", "text")
    assert(dedup.count() == 3)

    val shards = Files.createTempDirectory("jsonl-out").toString + "/shards"
    Jsonl.writeDocuments(landed, shards)
    val (back, bad2) = Jsonl.readDocuments(spark, shards)
    assert(bad2.isEmpty)
    assert(back.orderBy(col("doc_id")).collect().toSeq ==
      good.orderBy(col("doc_id")).collect().toSeq)
  }
}
