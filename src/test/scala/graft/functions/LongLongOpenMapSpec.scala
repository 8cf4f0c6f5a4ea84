package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Differential + wire-format pins for the primitive Space-Saving buffer.
  * The map replaced a boxed java.util.HashMap under an eviction-heavy
  * workload, so the differential drives exactly that mix — interleaved
  * put/addTo/remove/get with key reuse — against the boxed reference, and
  * the deletion path (backward-shift, no tombstones) gets its own directed
  * cases for the cyclic-wrap branch. */
class LongLongOpenMapSpec extends AnyFunSuite {

  test("randomized differential vs java.util.HashMap (puts, addTo, removes, " +
      "zero keys, negative keys, growth across several doublings)") {
    val rnd = new scala.util.Random(20260815L)
    val m = new LongLongOpenMap()
    val ref = new java.util.HashMap[Long, Long]()
    // key space small enough to force collisions + reuse; includes 0 and
    // negatives (0 is the table's empty sentinel — carried out-of-band)
    def key(): Long = rnd.nextInt(400) match {
      case 0 => 0L
      case k if k % 7 == 0 => -k.toLong * 12345
      case k => k.toLong
    }
    for (_ <- 1 to 20000) {
      val k = key()
      rnd.nextInt(4) match {
        case 0 => val v = rnd.nextLong(); m.put(k, v); ref.put(k, v)
        case 1 => val v = rnd.nextInt(100).toLong
          m.addTo(k, v)
          ref.merge(k, v, (a, b) => a + b)
        case 2 => m.remove(k); ref.remove(k)
        case _ =>
          assert(m.get(k) == (if (ref.containsKey(k)) ref.get(k) else -1L),
            s"get($k)")
      }
      assert(m.size == ref.size)
    }
    // full-content sweep at the end
    var seen = 0
    m.foreachEntry((k, v) => { assert(ref.get(k) == v, s"entry $k"); seen += 1 })
    assert(seen == ref.size)
  }

  test("backward-shift deletion keeps probe chains intact across wraps") {
    // force a dense cluster: with 32 initial slots and load <= 50%, insert
    // 16 keys, delete from the middle of chains, then verify every survivor
    val m = new LongLongOpenMap()
    val ks = (1L to 16L).map(_ * 7919L) // arbitrary spread keys
    ks.foreach(k => m.put(k, k * 2))
    ks.zipWithIndex.foreach { case (k, i) => if (i % 2 == 0) m.remove(k) }
    ks.zipWithIndex.foreach { case (k, i) =>
      assert(m.get(k) == (if (i % 2 == 0) -1L else k * 2), s"key $k")
    }
    assert(m.size == 8)
  }

  test("sketch Kryo wire format carries occupied entries only and " +
      "round-trips exactly") {
    val agg = SpaceSavingAggregator(1 << 20)
    val buf = (1L to 5000L).foldLeft(agg.zero)(agg.reduce)
    val kryo = new com.esotericsoftware.kryo.Kryo()
    kryo.setInstantiatorStrategy(
      new com.esotericsoftware.kryo.Kryo.DefaultInstantiatorStrategy(
        new org.objenesis.strategy.StdInstantiatorStrategy))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new com.esotericsoftware.kryo.io.Output(bos)
    kryo.writeObject(out, buf)
    out.close()
    val bytes = bos.toByteArray
    // 5000 entries x 16 B + header — NOT the 2^21-slot table (32 MB): the
    // explicit wire format is what keeps a big-capacity sketch shippable
    assert(bytes.length < 5000 * 16 + 64, s"wire=${bytes.length}")
    val back = kryo.readObject(
      new com.esotericsoftware.kryo.io.Input(
        new java.io.ByteArrayInputStream(bytes)),
      classOf[SpaceSavingSketch])
    assert(back.capacity == (1 << 20))
    assert(back.toMap == buf.toMap)
    // a deserialized buffer must keep absorbing rows (buckets rebuild lazily)
    val more = agg.reduce(back, 1L)
    assert(more.toMap(1L) == 2L)
  }
}
