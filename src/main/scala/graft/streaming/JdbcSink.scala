package graft.streaming

import graft.ais.{PositionWithWeather, ShipInfoEvent}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** ClickHouse/JDBC landing sink — the reference's storage backbone
  * (sql/clickhouse-ddl.sql:5-38: Kafka-engine queue tables + MVs) re-expressed
  * as Structured Streaming `foreachBatch` over plain JDBC, the Spark-idiomatic
  * shape for a store Spark has no native streaming connector for.
  *
  * Exactly-once without engine cooperation: Spark's checkpoint gives
  * at-least-once re-delivery of whole micro-batches, and every (re)delivery
  * of batch N first deletes its own previous rows — keyed by the
  * `(_batch_id, _part_id)` lineage columns each row carries — then
  * re-inserts. Replays of a batch AND task-level retries within a batch both
  * converge to the same final table (JdbcSinkSpec proves the re-run).
  * On ClickHouse the same insert-only stream can instead land in a
  * ReplacingMergeTree keyed on the natural id; the delete-then-insert default
  * here is the portable contract (any JDBC store with lightweight DELETE).
  *
  * Scale: one JDBC connection per partition per batch, `batchSize`-row
  * prepared-statement batches — inserts scale with partition count, and the
  * lineage delete hits an indexed int pair, not a scan. The JDBC driver jar
  * is deploy-time (like the Kafka connector); everything here is driver-free
  * logic behind the [[JdbcSink.ConnectionFactory]] seam.
  */
object JdbcSink {

  final case class Endpoint(url: String, table: String,
      props: Map[String, String] = Map.empty, batchSize: Int = 5000)

  /** Serializable connection seam: executors open their own connections;
    * tests substitute an in-memory fake. */
  trait ConnectionFactory extends Serializable {
    def connect(): java.sql.Connection
  }

  /** Production factory — DriverManager with endpoint props (user/password/
    * socket timeouts). */
  final case class DriverManagerFactory(url: String,
      props: Map[String, String]) extends ConnectionFactory {
    def connect(): java.sql.Connection = {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      java.sql.DriverManager.getConnection(url, p)
    }
  }

  def factoryFor(ep: Endpoint): ConnectionFactory =
    DriverManagerFactory(ep.url, ep.props)

  /** Lineage columns appended to every row; the idempotence key. */
  val BatchCol = "_batch_id"
  val PartCol = "_part_id"

  def insertSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${(cols :+ BatchCol :+ PartCol).mkString(", ")}) " +
      s"VALUES (${Seq.fill(cols.length + 2)("?").mkString(", ")})"

  def deleteSql(table: String): String =
    s"DELETE FROM $table WHERE $BatchCol = ? AND $PartCol = ?"

  def deleteBatchSql(table: String): String =
    s"DELETE FROM $table WHERE $BatchCol = ?"

  /** Land one micro-batch idempotently, against BOTH replay shapes:
    *
    *   - batch redelivery (driver restart): the whole-batch delete below
    *     clears every row a previous delivery attempt wrote — necessary
    *     because a redelivered batch may RE-PLAN with a different partition
    *     count, so per-partition slices of the old attempt would not all be
    *     covered by the new attempt's (batch, part) deletes;
    *   - task retry within this attempt: each partition deletes its own
    *     (batch, partition) slice before inserting, so a retried task
    *     converges instead of duplicating.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, ep: Endpoint,
      cf: ConnectionFactory): Unit = {
    val cols = batch.columns.toSeq
    require(!cols.contains(BatchCol) && !cols.contains(PartCol),
      s"$BatchCol/$PartCol are sink-owned lineage columns")
    val ins = insertSql(ep.table, cols)
    val del = deleteSql(ep.table)
    // driver-side: clear any previous delivery attempt of this batch
    val conn0 = cf.connect()
    try {
      conn0.setAutoCommit(false)
      val d0 = conn0.prepareStatement(deleteBatchSql(ep.table))
      d0.setLong(1, batchId); d0.executeUpdate(); d0.close()
      conn0.commit()
    } finally conn0.close()
    val width = cols.length
    val bs = ep.batchSize
    batch.foreachPartition { (rows: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val conn = cf.connect()
      try {
        conn.setAutoCommit(false)
        val d = conn.prepareStatement(del)
        d.setLong(1, batchId); d.setInt(2, pid)
        d.executeUpdate(); d.close()
        val ps = conn.prepareStatement(ins)
        var n = 0
        rows.foreach { r =>
          var i = 0
          while (i < width) { ps.setObject(i + 1, r.get(i)); i += 1 }
          ps.setLong(width + 1, batchId)
          ps.setInt(width + 2, pid)
          ps.addBatch(); n += 1
          if (n % bs == 0) ps.executeBatch()
        }
        if (n % bs != 0) ps.executeBatch()
        ps.close()
        conn.commit()
      } finally conn.close()
    }
  }

  /** Streaming writer: checkpointed `foreachBatch` around [[upsertBatch]].
    * `.start()` it like any other stream. */
  def writer(df: DataFrame, ep: Endpoint, checkpoint: String,
      cf: ConnectionFactory = null): DataStreamWriter[Row] = {
    val factory = Option(cf).getOrElse(factoryFor(ep))
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        upsertBatch(b.toDF(), id, ep, factory))
  }

  /** Enriched positions → the ship_pos_and_wx landing projection
    * (clickhouse-ddl.sql:5-19: column order and the epoch→DateTime('UTC')
    * cast — the streaming application of `c2_epoch_cast`). */
  def positionsLanding(pw: Dataset[PositionWithWeather]): DataFrame =
    pw.toDF().select(col("mmsi"),
      to_timestamp(from_unixtime(col("timestamp"))).as("timestamp"),
      col("status"), col("heading"), col("speed"), col("lat"), col("lon"),
      col("country"), col("region"), col("locale"), col("condition"),
      col("temp_f"), col("wind_dir"), col("wind_mph"))

  /** Ship info → the ship_info_and_destination landing projection
    * (clickhouse-ddl.sql:42-49). */
  def infoLanding(info: Dataset[ShipInfoEvent]): DataFrame =
    info.toDF().select(col("mmsi"), col("shipname"), col("shiptype"),
      col("callsign"), col("destination"),
      to_timestamp(from_unixtime(col("timestamp"))).as("timestamp"))

  def positionsWriter(pw: Dataset[PositionWithWeather], ep: Endpoint,
      checkpoint: String, cf: ConnectionFactory = null): DataStreamWriter[Row] =
    writer(positionsLanding(pw), ep, checkpoint, cf)

  def infoWriter(info: Dataset[ShipInfoEvent], ep: Endpoint,
      checkpoint: String, cf: ConnectionFactory = null): DataStreamWriter[Row] =
    writer(infoLanding(info), ep, checkpoint, cf)
}
