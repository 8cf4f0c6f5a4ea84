package graft.functions

import org.apache.spark.SparkConf
import org.apache.spark.serializer.KryoSerializer

/** Engine-level guard for the JDK17 module-opens dependency.
  *
  * Incident this exists for: Spark 4 on JDK 17 needs `--add-opens` flags
  * (spark-submit injects them; build.sbt's `jdk17AddOpens` mirrors the list
  * from `org.apache.spark.launcher.JavaModuleOptions`). A bare `java -cp`
  * launch without them starts fine and runs MOST of the catalog — the one
  * thing that breaks is Kryo serialization of the heavy-hitters buffer at
  * shuffle, deep inside a task, with a reflection error naming neither the
  * missing flag nor the fix. Two bench rows were recorded as
  * times-to-exception before the harness grew a guard; this probe moves the
  * guard INTO the engine so every launch path (spark-submit, sbt, a user's
  * own main) self-diagnoses at first use instead of failing at shuffle.
  *
  * The probe round-trips a [[SpaceSavingSketch]] through Spark's
  * KryoSerializer once per JVM (driver-side, ~ms); on failure it raises
  * with the exact flags to add. Local mode shares the JVM with executors,
  * so a passing driver probe covers the task path; on a real cluster
  * executors are launched by spark-submit, which injects the opens itself.
  */
object KryoProbe {

  @volatile private var passed = false

  /** The full open list build.sbt and spark-submit agree on. */
  private[graft] val requiredOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  private[graft] def wrap(cause: Throwable): IllegalStateException =
    new IllegalStateException(
      "graft: Kryo serialization probe failed — this JVM is missing the " +
        "JDK17 module opens Spark needs. Launch via spark-submit, or add: " +
        requiredOpens.map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ") +
        " (build.sbt jdk17AddOpens / org.apache.spark.launcher." +
        "JavaModuleOptions). Without them the heavy-hitters Kryo buffer " +
        "fails at SHUFFLE with an unrelated-looking reflection error.",
      cause)

  /** Out-of-process negative check (module opens can't be retracted from a
    * running JVM, so KryoProbeSpec can't force the trip in-process): run
    * `java -cp <spark jars glob>:target/scala-2.13/classes graft.functions.KryoProbe`
    * WITHOUT the flags — must print the fix and exit 2; with them, "ok". */
  def main(args: Array[String]): Unit =
    try { ensure(); println("kryo-probe ok") }
    catch {
      case e: IllegalStateException =>
        System.err.println(e.getMessage)
        sys.exit(2)
    }

  /** Round-trip the one Encoders.kryo wire path once per JVM; raise with
    * the fix on failure. Idempotent and cheap enough for every init. */
  def ensure(): Unit = if (!passed) {
    try {
      val ser = new KryoSerializer(new SparkConf(false)).newInstance()
      val sk = new SpaceSavingSketch(4)
      sk.add(42L); sk.add(42L); sk.add(7L)
      val back = ser.deserialize[SpaceSavingSketch](ser.serialize(sk))
      val got = back.toMap
      require(got == Map(42L -> 2L, 7L -> 1L), s"kryo roundtrip mismatch: $got")
      passed = true
    } catch {
      case e: Throwable => throw wrap(e)
    }
  }
}
