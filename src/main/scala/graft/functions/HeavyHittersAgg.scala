package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable Space-Saving counter table — the per-partition buffer behind
  * [[SpaceSavingAggregator]].
  *
  * The naive form (immutable map + `minBy` scan per eviction) is O(capacity)
  * per over-capacity row: the r10 sf10 sweep measured it burning 32 cores for
  * >15 minutes on 10M rows once 150k distinct keys crossed the 65k capacity —
  * the sketch that exists to make the over-capacity regime CHEAP was linear
  * in its own table size exactly there. This implementation is the standard
  * stream-summary shape instead:
  *
  *  - `counts`: open hash map, key -> estimated count (O(1) per row);
  *  - `buckets`: count -> ordered key set (a TreeMap of TreeSets), giving
  *    O(log m) min lookup and eviction with the same deterministic tie rule
  *    as before (evict the LARGEST key among the minimum-count entries);
  *  - the bucket index is built LAZILY at the first eviction and maintained
  *    incrementally only from then on, so the exact regime
  *    (capacity >= |distinct|, the oracle-pinned demonstration) never pays
  *    for it at all — one hash update per row.
  *
  * The index is `@transient`: only `counts` crosses the partial/final shuffle
  * (Kryo), and a deserialized buffer rebuilds buckets on demand. Semantics
  * are IDENTICAL to the previous implementation — SketchSpec pins both the
  * exact and the eviction regime against hand-computed tables. */
final class SpaceSavingSketch(val capacity: Int) extends Serializable {

  val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()

  @transient private var buckets:
      java.util.TreeMap[java.lang.Long, java.util.TreeSet[java.lang.Long]] = _

  private def indexKey(k: java.lang.Long, c: java.lang.Long): Unit = {
    var s = buckets.get(c)
    if (s == null) { s = new java.util.TreeSet[java.lang.Long](); buckets.put(c, s) }
    s.add(k)
  }

  private def unindexKey(k: java.lang.Long, c: java.lang.Long): Unit = {
    val s = buckets.get(c)
    s.remove(k)
    if (s.isEmpty) buckets.remove(c)
  }

  private def ensureBuckets(): Unit = if (buckets == null) {
    buckets = new java.util.TreeMap[java.lang.Long, java.util.TreeSet[java.lang.Long]]()
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); indexKey(e.getKey, e.getValue) }
  }

  def add(key: Long): Unit = {
    val k = java.lang.Long.valueOf(key)
    val c = counts.get(k)
    if (c != null) {
      val c1 = java.lang.Long.valueOf(c + 1L)
      counts.put(k, c1)
      if (buckets != null) { unindexKey(k, c); indexKey(k, c1) }
    } else if (counts.size < capacity) {
      val one = java.lang.Long.valueOf(1L)
      counts.put(k, one)
      if (buckets != null) indexKey(k, one)
    } else {
      // evict the minimum (tie: largest key id — deterministic); the
      // newcomer inherits its count + 1
      ensureBuckets()
      val minC = buckets.firstKey()
      val evict = buckets.get(minC).last()
      unindexKey(evict, minC)
      counts.remove(evict)
      val inherited = java.lang.Long.valueOf(minC + 1L)
      counts.put(k, inherited)
      indexKey(k, inherited)
    }
  }

  /** Sum both tables; past capacity keep the top-`capacity` by
    * (count desc, key asc) — the same truncating-merge rule as before. */
  def mergeWith(other: SpaceSavingSketch): SpaceSavingSketch = {
    val out = new SpaceSavingSketch(capacity)
    out.counts.putAll(counts)
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (out.counts.size > capacity) {
      val entries = new java.util.ArrayList(out.counts.entrySet())
      entries.sort(
        java.util.Comparator
          .comparingLong[java.util.Map.Entry[java.lang.Long, java.lang.Long]](
            e => -e.getValue)
          .thenComparingLong(e => e.getKey))
      out.counts.clear()
      var i = 0
      while (i < capacity) {
        val e = entries.get(i); out.counts.put(e.getKey, e.getValue); i += 1
      }
    }
    out
  }

  def toMap: Map[Long, Long] = {
    val b = Map.newBuilder[Long, Long]
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); b += (e.getKey.longValue() -> e.getValue.longValue())
    }
    b.result()
  }
}

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
    extends Aggregator[Long, SpaceSavingSketch, Map[Long, Long]] {

  override def zero: SpaceSavingSketch = new SpaceSavingSketch(capacity)

  override def reduce(b: SpaceSavingSketch, key: Long): SpaceSavingSketch = {
    b.add(key); b
  }

  override def merge(x: SpaceSavingSketch, y: SpaceSavingSketch): SpaceSavingSketch =
    x.mergeWith(y)

  override def finish(r: SpaceSavingSketch): Map[Long, Long] = r.toMap

  override def bufferEncoder: Encoder[SpaceSavingSketch] =
    Encoders.kryo[SpaceSavingSketch]
  override def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
}

object HeavyHittersAgg {
  /** Column form: a map<key, estimated count> of at most `capacity` keys. */
  def heavy_hitters(c: Column, capacity: Int): Column =
    udaf(SpaceSavingAggregator(capacity), Encoders.scalaLong)(c)
}
