package graft.streaming

import graft.SparkSpec
import graft.ais._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ClickHouse/JDBC sink without a database: the foreachBatch landing logic
  * runs against the FakeJdbc store, pinning the contract that matters for a
  * real deployment — idempotent re-delivery of a batch, the DDL column
  * projection, and transactional per-partition writes. */
class JdbcSinkSpec extends SparkSpec {

  private val ep = JdbcSink.Endpoint("jdbc:clickhouse://ch:8123/nst",
    "ship_pos_and_wx", batchSize = 3)

  private def somePositions(n: Int): Seq[PositionWithWeather] =
    (1 to n).map(i => PositionWithWeather(
      mmsi = s"mmsi$i", status = "under way using engine", speed = 10.0 + i,
      heading = i, timestamp = 1700000000L + i, lat = 52.0 + i * 0.01,
      lon = 4.0, locale = "Hoek van Holland", region = "South Holland",
      country = "Netherlands", condition = "Sunny", temp_f = 70.5,
      wind_mph = 5.0, wind_dir = "NW"))

  test("upsertBatch: re-running batch N leaves the table unchanged; new batches append") {
    import spark.implicits._
    FakeJdbc.clear()
    val landed = JdbcSink.positionsLanding(somePositions(7).toDS().repartition(2))
    JdbcSink.upsertBatch(landed, 0L, ep, FakeJdbc.Factory)
    val after1 = FakeJdbc.rows("ship_pos_and_wx")
    assert(after1.size == 7)

    // the at-least-once replay: the same batch id delivered again
    JdbcSink.upsertBatch(landed, 0L, ep, FakeJdbc.Factory)
    val after2 = FakeJdbc.rows("ship_pos_and_wx")
    assert(after2.size == 7)
    assert(after2.map(_.filterNot(_._1.startsWith("_"))).toSet ==
      after1.map(_.filterNot(_._1.startsWith("_"))).toSet)

    // a genuinely new batch appends
    val more = JdbcSink.positionsLanding(
      somePositions(3).map(p => p.copy(mmsi = p.mmsi + "b")).toDS())
    JdbcSink.upsertBatch(more, 1L, ep, FakeJdbc.Factory)
    assert(FakeJdbc.rows("ship_pos_and_wx").size == 10)
    // batch 0's replay never touched batch 1's lineage
    assert(FakeJdbc.rows("ship_pos_and_wx")
      .count(_(JdbcSink.BatchCol).toString == "1") == 3)
  }

  test("redelivery with a DIFFERENT partition count still converges") {
    import spark.implicits._
    FakeJdbc.clear()
    val ds = somePositions(7).toDS()
    // attempt 1 plans 4 partitions; the redelivered attempt re-plans to 2 —
    // partition ids shift, so per-slice deletes alone would strand attempt-1
    // rows in slices the new attempt never writes
    JdbcSink.upsertBatch(JdbcSink.positionsLanding(ds.repartition(4)),
      0L, ep, FakeJdbc.Factory)
    JdbcSink.upsertBatch(JdbcSink.positionsLanding(ds.repartition(2)),
      0L, ep, FakeJdbc.Factory)
    val rows = FakeJdbc.rows("ship_pos_and_wx")
    assert(rows.size == 7, s"stranded or duplicated rows: ${rows.size}")
    assert(rows.map(_("mmsi").toString).sorted ==
      (1 to 7).map(i => s"mmsi$i").sorted)
  }

  test("landing projections match the ClickHouse DDL column sets") {
    import spark.implicits._
    val pos = JdbcSink.positionsLanding(somePositions(1).toDS())
    assert(pos.columns.toSeq == Seq("mmsi", "timestamp", "status", "heading",
      "speed", "lat", "lon", "country", "region", "locale", "condition",
      "temp_f", "wind_dir", "wind_mph"))
    assert(pos.schema("timestamp").dataType.typeName == "timestamp")

    val info = JdbcSink.infoLanding(Seq(ShipInfoEvent("1", 1700000000L,
      "SHIP", "CALL", "cargo ship", "ROTTERDAM")).toDS())
    assert(info.columns.toSeq ==
      Seq("mmsi", "shipname", "shiptype", "callsign", "destination", "timestamp"))
  }

  test("streaming writer lands micro-batches through foreachBatch, checkpointed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    FakeJdbc.clear()
    val input = MemoryStream[ShipInfoEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("jdbc-ckpt").toString
    val iep = ep.copy(table = "ship_info_and_destination")
    val q = JdbcSink.infoWriter(input.toDS(), iep, ckpt, FakeJdbc.Factory).start()
    try {
      input.addData(ShipInfoEvent("1", 1700000000L, "A", "CA", "cargo ship", "X"))
      q.processAllAvailable()
      input.addData(ShipInfoEvent("2", 1700000060L, "B", "CB", "tanker", "Y"))
      q.processAllAvailable()
    } finally q.stop()
    val got = FakeJdbc.rows("ship_info_and_destination")
    assert(got.size == 2)
    // distinct micro-batches carry distinct lineage ids
    assert(got.map(_(JdbcSink.BatchCol).toString).toSet == Set("0", "1"))
    assert(FakeJdbc.committed >= 2)
  }
}
