package graft.functions

import graft.SparkSpec

/** The engine-level JDK17 add-opens guard: in this (correctly-flagged) JVM
  * the probe must pass and be idempotent; its failure wrapper must name the
  * exact flags and the shuffle symptom, since that message IS the fix for
  * the r13 bare-`java -cp` incident. The probe's actual trip in an
  * unflagged JVM is exercised out-of-process (tools/ bare-launch check;
  * recorded in BENCH_NOTES) — module opens can't be retracted in-process. */
class KryoProbeSpec extends SparkSpec {

  test("probe passes and is idempotent in a correctly-flagged JVM") {
    KryoProbe.ensure()
    KryoProbe.ensure()
  }

  test("failure wrapper names every required open, the spark-submit " +
      "alternative, and the shuffle symptom") {
    val cause = new RuntimeException("boom")
    val e = KryoProbe.wrap(cause)
    assert(e.getCause eq cause)
    val m = e.getMessage
    assert(m.contains("spark-submit"))
    assert(m.toLowerCase.contains("shuffle"))
    for (p <- KryoProbe.requiredOpens)
      assert(m.contains(s"--add-opens $p=ALL-UNNAMED"), p)
  }

  test("heavy_hitters column construction runs the probe (and still works)") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L).toDF("k")
    val m = df.select(HeavyHittersAgg.heavy_hitters(
      org.apache.spark.sql.functions.col("k"), 8))
      .collect()(0).getMap[Long, Long](0)
    assert(m == Map(1L -> 2L, 2L -> 1L))
  }
}
