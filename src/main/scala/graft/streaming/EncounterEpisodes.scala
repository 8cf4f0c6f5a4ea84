package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Geo

/** Streaming twin of the batch `geo_encounter_episodes` sessionization
  * (r14 verdict item 7): the episode state machine over a close-pair
  * DETECTION stream, keyed by (ship_a, ship_b), gap-closed exactly like
  * the batch window (an episode is a run of hour-bins with no full empty
  * bin between; a detection in bin `hbEnd + 2` or later starts a new one).
  *
  * Where the detections come from is the upstream's business — the batch
  * blocked join replayed from a topic, or `encounterAlerts`-style live
  * proximity events; the operator is the SESSIONIZATION, which is the
  * genuinely streaming-native piece (a convoy's episode closes `gap` after
  * its last co-location, not at job end).
  *
  * Two closing paths, both required (the CorpusDedup TTL lesson):
  *   - in-band: a detection with `dhb > hbEnd + 1` closes the previous
  *     episode and opens the next — hot pairs close their own history;
  *   - event-time timeout at the start of bin `hbEnd + 2`: once the
  *     watermark passes the first instant that could NOT extend the
  *     episode, it is final and is emitted — pairs that go silent don't
  *     hold state forever. State per live pair is ONE fixed-size record
  *     (no per-bin history), so state size is O(live pairs).
  *
  * Ordering contract (same as any watermark-disciplined feed): detections
  * for one pair arrive in event-time order ACROSS micro-batches (within a
  * batch the processor sorts). Under that contract the emitted episodes
  * are EXACTLY the batch query's rows — EncounterEpisodesSpec pins the
  * differential on a bounded replay. Append output mode.
  */
object EncounterEpisodes {

  /** One close-pair detection; `ts` is the pair's event time (the earlier
    * ping — matching the batch `least(ts_a, ts_b)` bin assignment). */
  case class Detection(ship_a: Long, ship_b: Long, ts: Timestamp, d: Double)

  case class EpisodeState(hbStart: Long, hbEnd: Long, nHours: Long,
      nClose: Long, minKm: Double)

  /** Mirrors the batch output row minus the per-pair episode index. */
  case class Episode(ship_a: Long, ship_b: Long, hb_start: Long,
      hb_end: Long, n_hours: Long, n_close: Long, min_km: Double)

  /** Hour-bin width in ms (the batch query bins in µs). */
  val binMs: Long = Geo.encounterUs / 1000L

  def episodes(det: Dataset[Detection],
      watermark: String = "2 hours"): Dataset[Episode] = {
    import det.sparkSession.implicits._
    det.withWatermark("ts", watermark)
      .groupByKey(r => (r.ship_a, r.ship_b))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), rows: Iterator[Detection],
            state: GroupState[EpisodeState]) =>
          def emit(s: EpisodeState) = Episode(key._1, key._2,
            s.hbStart, s.hbEnd, s.nHours, s.nClose, s.minKm)
          if (state.hasTimedOut) {
            val e = state.get
            state.remove()
            Iterator.single(emit(e))
          } else {
            val out = List.newBuilder[Episode]
            var cur = state.getOption
            rows.toSeq.sortBy(r => (r.ts.getTime, r.d)).foreach { r =>
              val dhb = Math.floorDiv(r.ts.getTime, binMs)
              cur match {
                case None =>
                  cur = Some(EpisodeState(dhb, dhb, 1L, 1L, r.d))
                case Some(s) if dhb > s.hbEnd + 1 =>
                  out += emit(s)
                  cur = Some(EpisodeState(dhb, dhb, 1L, 1L, r.d))
                case Some(s) =>
                  cur = Some(EpisodeState(math.min(s.hbStart, dhb),
                    math.max(s.hbEnd, dhb),
                    s.nHours + (if (dhb > s.hbEnd) 1L else 0L),
                    s.nClose + 1L, math.min(s.minKm, r.d)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // final once nothing can land in bin <= hbEnd + 1; the max
              // guards the (late-data) case where the watermark already
              // passed that instant — close at the next possible moment
              state.setTimeoutTimestamp(math.max((s.hbEnd + 2) * binMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** The batch close-pair core reshaped into this operator's input — used
    * by the differential spec and any batch-to-topic replay: one Detection
    * per qualifying pair-ping, event time = the earlier ping. */
  def detectionsFromPositions(positions: DataFrame): Dataset[Detection] = {
    import positions.sparkSession.implicits._
    val repW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ship"),
        floor(col("ts_us") / Geo.encounterUs).cast("long"))
      .orderBy(col("ts_us"), col("event_id"))
    val reps = positions.filter(abs(col("lat")) <= 70)
      .withColumn("rn", row_number().over(repW))
      .filter(col("rn") === 1)
      .select(col("ship"), col("ts_us"), col("lat"), col("lon"))
    Geo.closePairs(reps)
      .select(col("ship_a"), col("ship_b"),
        timestamp_millis((least(col("ts_a"), col("ts_b")) / 1000L)
          .cast("long")).as("ts"),
        col("d"))
      .as[Detection]
  }
}
