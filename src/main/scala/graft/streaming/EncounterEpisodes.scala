package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Geo

/** Streaming twin of the batch `geo_encounter_episodes` sessionization:
  * the episode state machine over a close-pair DETECTION stream, keyed by
  * (ship_a, ship_b), gap-closed exactly like the batch window (an episode
  * is a run of hour-bins with no full empty bin between; a detection in
  * bin `hbEnd + 2` or later starts a new one).
  *
  * Where the detections come from is the upstream's business — the batch
  * blocked join replayed from a topic, or `encounterAlerts`-style live
  * proximity events; the operator is the SESSIONIZATION, which is the
  * genuinely streaming-native piece (a convoy's episode closes `gap` after
  * its last co-location, not at job end).
  *
  * ==Disorder-safe by construction (r16)==
  *
  * The r15 version folded detections into the open episode as they
  * arrived, which silently assumed per-pair EVENT-TIME ORDER ACROSS
  * micro-batches — a contract the watermark does not give (it only bounds
  * lateness; an in-watermark detection for an EARLIER bin can arrive a
  * batch late, and `min(hbStart, dhb)` would bridge a real gap the batch
  * query splits, undercounting `n_hours` for interior bins). This version
  * assumes nothing beyond the watermark itself:
  *
  *   - arriving detections are only BUFFERED, merged per hour-bin
  *     (`n`, `min_km` — both order-free);
  *   - a buffered bin is folded into the episode run only once the
  *     watermark seals it (`(bin+1)·binMs <= watermark` — nothing can
  *     arrive in it any more, because the event-time-timeout path of
  *     flatMapGroupsWithState drops rows older than the watermark);
  *     sealed bins fold in ascending bin order, so the run machine sees
  *     exactly the batch query's ordered bin sequence;
  *   - the open episode is emitted once the watermark passes the start of
  *     bin `hbEnd + 2`: bin `hbEnd + 1` is then sealed and known empty
  *     (it would have folded), so the gap is REAL.
  *
  * A row that arrives is never immediately sealable (its event time is >=
  * the watermark, its bin >= the watermark's bin), so fold order and
  * arrival order can never race. Progress for quiet pairs comes from an
  * event-time timeout armed at the earliest instant anything new becomes
  * final (next seal, or the open episode's close); hot pairs fold in-band
  * on every batch that brings them data.
  *
  * State per live pair is the open episode plus the buffered bins that the
  * watermark has not sealed yet — at most `watermarkDelay/binMs + 2` bins
  * (the span between the watermark and the pair's max event time), so
  * state is O(live pairs x watermark horizon in bins), independent of
  * stream length. Append output mode; emitted rows are exactly the batch
  * query's rows (minus the per-pair episode index) for ANY arrival order
  * the watermark admits — EncounterEpisodesSpec pins in-order, shuffled,
  * and adversarial late-bin replays differentially against the batch
  * operator.
  */
object EncounterEpisodes {

  /** One close-pair detection; `ts` is the pair's event time (the earlier
    * ping — matching the batch `least(ts_a, ts_b)` bin assignment). */
  case class Detection(ship_a: Long, ship_b: Long, ts: Timestamp, d: Double)

  /** The folded (all-bins-sealed) prefix of the pair's current episode. */
  case class EpisodeState(hbStart: Long, hbEnd: Long, nHours: Long,
      nClose: Long, minKm: Double)

  /** One buffered hour-bin the watermark has not sealed yet. */
  case class BinStat(bin: Long, n: Long, minKm: Double)

  /** Per-pair state: folded open episode + unsealed bin buffer. */
  case class PairState(open: Option[EpisodeState], buf: Seq[BinStat])

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
            state: GroupState[PairState]) =>
          def emit(s: EpisodeState) = Episode(key._1, key._2,
            s.hbStart, s.hbEnd, s.nHours, s.nClose, s.minKm)
          val out = List.newBuilder[Episode]
          val prev = state.getOption.getOrElse(PairState(None, Nil))
          // merge arrivals into the bin buffer (order-free per bin)
          val bins = collection.mutable.HashMap.empty[Long, (Long, Double)]
          prev.buf.foreach(b => bins(b.bin) = (b.n, b.minKm))
          rows.foreach { r =>
            val dhb = Math.floorDiv(r.ts.getTime, binMs)
            val (n0, k0) = bins.getOrElse(dhb, (0L, Double.MaxValue))
            bins(dhb) = (n0 + 1L, math.min(k0, r.d))
          }
          val wm = state.getCurrentWatermarkMs()
          // fold the bins the watermark sealed, in ascending order; each
          // folded bin is strictly beyond the open episode's hbEnd (it
          // arrived after the bins already folded were sealed)
          val (ripe, pending) =
            bins.toSeq.partition { case (b, _) => (b + 1) * binMs <= wm }
          var cur = prev.open
          ripe.sortBy(_._1).foreach { case (b, (n, km)) =>
            cur match {
              case None =>
                cur = Some(EpisodeState(b, b, 1L, n, km))
              case Some(s) if b > s.hbEnd + 1 =>
                out += emit(s)
                cur = Some(EpisodeState(b, b, 1L, n, km))
              case Some(s) =>
                cur = Some(EpisodeState(s.hbStart, b, s.nHours + 1L,
                  s.nClose + n, math.min(s.minKm, km)))
            }
          }
          // the open episode is final once bin hbEnd+1 is sealed-empty
          cur match {
            case Some(s) if (s.hbEnd + 2) * binMs <= wm =>
              out += emit(s)
              cur = None
            case _ =>
          }
          if (cur.isEmpty && pending.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(PairState(cur,
              pending.map { case (b, (n, k)) => BinStat(b, n, k) }
                .sortBy(_.bin)))
            // wake at the earliest instant something new becomes final
            val next = (cur.map(s => (s.hbEnd + 2) * binMs).toSeq ++
              pending.map { case (b, _) => (b + 1) * binMs }).min
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.result().iterator
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
