package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams"): a fixed-`capacity` counter
  * table; a new key past capacity EVICTS the minimum counter and inherits
  * its count as over-estimation error. One pass, mergeable — the standard
  * one-scan heavy-hitter sketch for data too large to group exactly.
  *
  * Guarantees: every key with true count > N/capacity is present. The
  * SEQUENTIAL sketch strictly over-counts (by at most the inherited
  * minimum, bounded by N/capacity); the truncating merge of partition
  * partials can additionally drop a key's minority-partition mass, so the
  * merged estimate carries a symmetric |est - true| <= ε·layers bound with
  * ε = N/capacity (SketchSpec pins both regimes). When capacity >=
  * |distinct keys| no eviction ever happens, the merge is lossless, and
  * every estimate is EXACT — the regime the DuckDB oracle pins at test
  * scale; at 100 TB capacity ≪ |distinct| trades exactness for fixed
  * memory under those bounds. */
case class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        // evict the minimum (tie: largest key id — deterministic), the
        // newcomer inherits its count + 1
        val (mk, mc) = b.minBy { case (k, c) => (c, -k) }
        (b - mk).updated(key, mc + 1)
    }

  override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val summed = (x.keySet ++ y.keySet).iterator
      .map(k => k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))).toMap
    if (summed.size <= capacity) summed
    else summed.toSeq.sortBy { case (k, c) => (-c, k) }.take(capacity).toMap
  }

  override def finish(r: Map[Long, Long]): Map[Long, Long] = r

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
}

object HeavyHittersAgg {
  /** Column form: a map<key, estimated count> of at most `capacity` keys. */
  def heavy_hitters(c: Column, capacity: Int): Column =
    udaf(SpaceSavingAggregator(capacity), Encoders.scalaLong)(c)
}
