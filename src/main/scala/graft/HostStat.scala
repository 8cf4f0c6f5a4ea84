package graft

/** CPU-steal reading from `/proc/stat` — the co-tenant axis the load1m
  * idle gate cannot see. Found the hard way in r16: two gate-admitted
  * sf0.1 runs (load1m_start 0.7-0.9) came in 1.35-1.55x over r15 with the
  * inflation UNIFORM across all 227 queries and zero plan changes; a
  * 32-way burn measured 11.8% of CPU time stolen by a VM co-tenant.
  * Steal never appears in the load average (the thread is runnable, the
  * cpu just isn't delivered), so Bench/StreamBench stamp the steal share
  * measured over their own run and tools/bench_check.py gates on it.
  */
object HostStat {

  /** (steal, total) jiffies since boot from the aggregate cpu line;
    * (-1, -1) when /proc/stat is unreadable (non-Linux). */
  def cpuJiffies(): (Long, Long) = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val v = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      (if (v.length > 7) v(7) else 0L, v.sum)
    } finally src.close()
  } catch { case _: Throwable => (-1L, -1L) }

  /** Steal share (percent of all CPU time, idle included) between two
    * snapshots; -1 when either snapshot was unreadable. Denominator is
    * wall x ncpu in jiffies, so 5% here means the co-tenant held ~5% of
    * the MACHINE for the whole window — under a saturating local[32]
    * bench that converts ~1:1 into lost compute. */
  def stealPct(start: (Long, Long), end: (Long, Long)): Double =
    if (start._1 < 0 || end._1 < 0 || end._2 <= start._2) -1.0
    else 100.0 * (end._1 - start._1) / (end._2 - start._2)

  /** Memory canary: wall-clock ms for four sequential sweeps over a
    * 128 MB Long array (512 MB of reads — delivered DRAM bandwidth, one
    * thread). Steal only counts cpu slices DENIED to this VM; a co-tenant
    * also slows the host through memory-bandwidth/LLC contention that
    * steal never sees — measured in r16: Spark queries 1.4-1.8x slow
    * (r15 AND r16 classes alike) while steal read 1-2.7% and a
    * register-only xorshift canary read its normal 215 ms, i.e. the
    * contention lived entirely in the memory system. This canary reads
    * the axis that actually gates Spark throughput. The buffer is
    * allocated once and reused; the sum is consumed so the sweep can't
    * dead-code. bench_check gates stamped values at --max-canary-ms. */
  private lazy val canaryBuf: Array[Long] = {
    val a = new Array[Long](16 * 1024 * 1024)
    var i = 0
    while (i < a.length) { a(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    a
  }

  def canaryMs(): Double = {
    def sweep(): Long = {
      var s = 0L
      var p = 0
      while (p < 4) {
        var i = 0
        while (i < canaryBuf.length) { s += canaryBuf(i); i += 1 }
        p += 1
      }
      s
    }
    sweep() // warm-up: JIT + buffer init before timing
    val t0 = System.nanoTime()
    val sink = sweep()
    val ms = (System.nanoTime() - t0) / 1e6
    if (sink == 42L) println("") // consume the sum
    ms
  }
}
