package graft.functions

import com.esotericsoftware.kryo.{Kryo, KryoSerializable}
import com.esotericsoftware.kryo.io.{Input, Output}
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
  *  - `counts`: [[LongLongOpenMap]] — primitive open-addressing, two parallel
  *    long arrays at 16 B/slot (≤ 32 B/entry at the 50% load ceiling), O(1)
  *    per row. This replaced the boxed `java.util.HashMap` whose ~55 B/entry
  *    (boxing + node headers) put a FULL 2^20 partial at ~58 MB in-heap; the
  *    primitive table caps the same partial at 32 MB of flat arrays with
  *    zero per-entry objects for the GC to trace (measured: BENCH_NOTES r13).
  *  - `buckets`: count -> ordered key set (a TreeMap of TreeSets), giving
  *    O(log m) min lookup and eviction with the same deterministic tie rule
  *    as before (evict the LARGEST key among the minimum-count entries);
  *    still boxed — it exists ONLY in the eviction regime (built lazily at
  *    the first eviction), so the exact-regime hot path (the oracle-pinned
  *    demonstration) never allocates a single box per row.
  *
  * The index is `@transient`; the wire format is explicit KryoSerializable
  * (capacity, size, then the occupied (key, value) pairs — 16 B/entry, ~16 MB
  * for a full 2^20 partial), so the empty table slots never cross the
  * shuffle. A deserialized buffer rebuilds buckets on demand. Semantics are
  * IDENTICAL to the boxed implementation — SketchSpec pins the exact regime,
  * the eviction tie rule, and a randomized differential of the open map
  * against java.util.HashMap. */
final class SpaceSavingSketch(private var cap: Int)
    extends Serializable with KryoSerializable {

  def this() = this(0) // Kryo/objenesis instantiation path

  def capacity: Int = cap

  var counts = new LongLongOpenMap()

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
    counts.foreachEntry((k, c) => indexKey(k, c))
  }

  def add(key: Long): Unit = {
    val c = counts.get(key)
    if (c >= 0L) {
      counts.put(key, c + 1L)
      if (buckets != null) { unindexKey(key, c); indexKey(key, c + 1L) }
    } else if (counts.size < cap) {
      counts.put(key, 1L)
      if (buckets != null) indexKey(key, 1L)
    } else {
      // evict the minimum (tie: largest key id — deterministic); the
      // newcomer inherits its count + 1
      ensureBuckets()
      val minC = buckets.firstKey()
      val evict = buckets.get(minC).last()
      unindexKey(evict, minC)
      counts.remove(evict)
      val inherited = minC + 1L
      counts.put(key, inherited)
      indexKey(key, inherited)
    }
  }

  /** Sum both tables; past capacity keep the top-`capacity` by
    * (count desc, key asc) — the same truncating-merge rule as before. */
  def mergeWith(other: SpaceSavingSketch): SpaceSavingSketch = {
    val out = new SpaceSavingSketch(cap)
    counts.foreachEntry((k, v) => out.counts.put(k, v))
    other.counts.foreachEntry((k, v) => out.counts.addTo(k, v))
    if (out.counts.size > cap) {
      val entries = new java.util.ArrayList[Array[Long]](out.counts.size)
      out.counts.foreachEntry((k, v) => { entries.add(Array(k, v)); () })
      entries.sort(
        java.util.Comparator
          .comparingLong[Array[Long]](e => -e(1))
          .thenComparingLong(e => e(0)))
      val trimmed = new LongLongOpenMap(cap * 2)
      var i = 0
      while (i < cap) {
        val e = entries.get(i); trimmed.put(e(0), e(1)); i += 1
      }
      out.counts = trimmed
    }
    out
  }

  def toMap: Map[Long, Long] = {
    val b = Map.newBuilder[Long, Long]
    counts.foreachEntry((k, v) => { b += (k -> v); () })
    b.result()
  }

  override def write(kryo: Kryo, out: Output): Unit = {
    out.writeInt(cap)
    out.writeInt(counts.size)
    counts.foreachEntry((k, v) => { out.writeLong(k); out.writeLong(v) })
  }

  override def read(kryo: Kryo, in: Input): Unit = {
    cap = in.readInt()
    val n = in.readInt()
    counts = new LongLongOpenMap(math.max(32, n * 2))
    var i = 0
    while (i < n) { counts.put(in.readLong(), in.readLong()); i += 1 }
    buckets = null
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
  * ε = N/capacity (SketchSpec pins both regimes) — unless the input is
  * hash-partitioned BY KEY, which confines each key to one partial and
  * makes presence and never-undercount unconditional (see
  * [[graft.operators.Sketches]]). When capacity >= |distinct keys| no
  * eviction ever happens, the merge is lossless, and every estimate is
  * EXACT — the regime the DuckDB oracle pins at test scale; at 100 TB
  * capacity ≪ |distinct| trades exactness for fixed memory under those
  * bounds. */
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
  /** Column form: a map<key, estimated count> of at most `capacity` keys.
    * Probes the Kryo/JDK17 add-opens dependency at construction — the ONLY
    * Encoders.kryo path in the engine — so a mis-launched JVM fails here
    * with the fix named, not at shuffle (see [[KryoProbe]]). */
  def heavy_hitters(c: Column, capacity: Int): Column = {
    KryoProbe.ensure()
    udaf(SpaceSavingAggregator(capacity), Encoders.scalaLong)(c)
  }
}
