package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * One normalization: `events.ts` is stored as parquet TIMESTAMP(NANOS), which
  * Spark's parquet reader rejects (PARQUET_TYPE_ILLEGAL). We read it as a raw
  * nanosecond Long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microseconds — the same truncation DuckDB applies when casting TIMESTAMP_NS
  * to TIMESTAMP — so engine results stay oracle-comparable.
  *
  * At 100 TB these reads are plain distributed parquet scans; every accessor
  * returns an un-materialized DataFrame so Catalyst can push filters and prune
  * columns into the scan (verify via `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, dir, name): the driver tables are immutable, so
    * re-creating the DataFrame would only repeat file listing + parquet
    * footer/schema reads on every query — a real engine caches catalog
    * metadata. The returned DataFrame is still lazy; only the relation
    * (file index + schema) is reused. LRU-bounded so stopped sessions and
    * their plans are eventually released; callers regenerating files at a
    * cached path in the SAME session should read via spark.read directly
    * (the cache pins the first file listing, by design for static tables). */
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame]): Boolean =
        size() > 64
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.synchronized {
      // stopped sessions never hit again — drop their entries now instead of
      // pinning session + analyzed plans until 64 newer entries evict them
      // (test suites cycle many short-lived sessions in one JVM)
      val it = cache.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getKey._1.sparkContext.isStopped) it.remove()
      val key = (spark, dir, name)
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val df = spark.read.parquet(s"$dir/$name.parquet")
        cache.put(key, df)
        df
      }
    }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts` normalized to a proper microsecond TimestampType
    * (UTC) regardless of how the generator encoded it. Observed layouts
    * across driver data drops: parquet TIMESTAMP(NANOS) (bound as a raw
    * nanosecond Long via `nanosAsLong`, truncated to micros — the same
    * truncation DuckDB applies casting TIMESTAMP_NS to TIMESTAMP), and
    * parquet TIMESTAMP(MICROS) without UTC adjustment (bound as
    * TIMESTAMP_NTZ — cast to TimestampType under the UTC session zone, which
    * is value-identical to DuckDB's naive read). Adapting on the READ schema
    * rather than pinning one layout keeps every events query working across
    * regenerations.
    *
    * NOTE (deliberate session-wide effect): `nanosAsLong` is a SQL conf, not a
    * per-read option, so setting it here affects every later parquet read in
    * the session. That is benign — the flag only changes how TIMESTAMP(NANOS)
    * columns bind, and `events` is the sole nanos table — but callers wanting
    * it explicit can set the conf at session build time; this set is
    * idempotent and merely defensive. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
