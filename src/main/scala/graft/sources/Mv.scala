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
}
