package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EncounterEpisodes.{Detection, Episode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming episode state machine: gap-close semantics on a
  * hand-built sequence, then the CorpusDedup-style DIFFERENTIAL — a
  * bounded time-ordered replay of the sf0.001 close-pair detections must
  * reproduce the batch `geo_encounter_episodes` rows exactly. */
class EncounterEpisodesSpec extends SparkSpec {

  private def ts(hours: Double): Timestamp =
    new Timestamp((hours * EncounterEpisodes.binMs).toLong)

  private def episodeSet(rows: Seq[Episode]): Set[(Long, Long, Long, Long, Long, Long, Double)] =
    rows.map(e => (e.ship_a, e.ship_b, e.hb_start, e.hb_end,
      e.n_hours, e.n_close, e.min_km)).toSet

  test("gap-close semantics: in-band gap closes an episode; event-time " +
      "timeout flushes the silent pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Detection]
    val q = EncounterEpisodes.episodes(in.toDS(), watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ep_t1").start()
    try {
      // pair (1,2): bins 10,10,11 then a jump to 14 (gap) then silence
      in.addData(
        Detection(1, 2, ts(10.1), 5.0), Detection(1, 2, ts(10.6), 3.0),
        Detection(1, 2, ts(11.2), 9.0))
      q.processAllAvailable()
      in.addData(Detection(1, 2, ts(14.5), 2.5))
      q.processAllAvailable()
      // watermark advance on an unrelated pair, twice (timeout fires one
      // batch after the watermark passes bin hbEnd+2)
      in.addData(Detection(8, 9, ts(100), 1.0))
      q.processAllAvailable()
      in.addData(Detection(8, 9, ts(101), 1.0))
      q.processAllAvailable()
      val got = spark.table("ep_t1").as[Episode].collect().toSeq
        .filter(e => e.ship_a == 1L)
      assert(episodeSet(got) == Set(
        (1L, 2L, 10L, 11L, 2L, 3L, 3.0),  // closed in-band by the jump
        (1L, 2L, 14L, 14L, 1L, 1L, 2.5)), // closed by event-time timeout
        got.toString)
    } finally q.stop()
  }

  test("differential vs batch geo_encounter_episodes on a bounded " +
      "time-ordered replay (sf0.001)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val positions = graft.sources.Tables.events(spark, sf("sf0.001")).select(
      col("user_id").as("ship"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      ((col("event_id") % 1780) / 10.0 - 89.0).as("lat"),
      ((col("event_id") % 3580) / 10.0 - 179.0).as("lon"))
    // the batch answer, minus the per-pair episode index
    val want = graft.operators.Geo.encounterEpisodes(positions)
      .select(col("ship_a"), col("ship_b"), col("hb_start"), col("hb_end"),
        col("n_hours"), col("n_close"), col("min_km"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(want.nonEmpty)
    // the same detections, replayed in event-time order in 4 batches
    val dets = EncounterEpisodes.detectionsFromPositions(positions)
      .collect().sortBy(_.ts.getTime)
    val in = MemoryStream[Detection]
    val q = EncounterEpisodes.episodes(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ep_t2").start()
    try {
      dets.grouped(math.max(1, (dets.length + 3) / 4)).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // two sentinel batches on a dummy pair far in the future: the first
      // advances the watermark past every pair's close instant, the second
      // triggers the timeout sweep
      val far = dets.last.ts.getTime + 30L * 24 * EncounterEpisodes.binMs
      in.addData(Detection(999999998L, 999999999L, new Timestamp(far), 1.0))
      q.processAllAvailable()
      in.addData(Detection(999999998L, 999999999L, new Timestamp(far + 1000), 1.0))
      q.processAllAvailable()
      val got = spark.table("ep_t2").as[Episode].collect().toSeq
        .filter(_.ship_a != 999999998L)
      assert(episodeSet(got) == want,
        s"streaming=${got.size} batch=${want.size} " +
          s"missing=${(want -- episodeSet(got)).take(3)} " +
          s"extra=${(episodeSet(got) -- want).take(3)}")
    } finally q.stop()
  }
}
