package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable materialized-view layout (the C3 append-sink analog for batch —
  * clickhouse-ddl.sql:32-38's role): hive-style partitioned parquet, so
  * queries filtering on the partition column prune whole directories at
  * planning time (PartitionFilters in the scan, zero data files touched for
  * excluded partitions) — the storage-level pruning a 100 TB table needs
  * before any rowgroup statistics apply.
  *
  * Partition column choice: low-cardinality, filter-bearing (event day /
  * type, ship type). A high-cardinality partition column (mmsi, event_id)
  * produces millions of directories and kills listing — use bucketing for
  * high-cardinality keys instead (BucketingSpec).
  */
object Mv {

  def write(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental maintenance: overwrite ONLY the partitions present in
    * `delta`, leaving every other partition's files untouched — Spark's
    * dynamic partition-overwrite. This is how a 100 TB day-partitioned MV
    * absorbs a late/corrected day: the rewrite cost is the affected
    * partitions, never the table (MvSpec proves untouched partitions keep
    * their exact files). The session's partitionOverwriteMode is restored
    * afterward, so callers keep their own semantics. */
  def upsertPartitions(delta: DataFrame, path: String,
      partitionCols: String*): Unit = {
    val spark = delta.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try delta.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
