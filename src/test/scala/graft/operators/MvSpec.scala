package graft.operators

import graft.SparkSpec
import graft.sources.{Mv, Tables}
import org.apache.spark.sql.functions._

class MvSpec extends SparkSpec {

  test("dynamic partition upsert rewrites only the delta's partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mv-upsert").toString
    val events = Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Mv.write(events, tmp, "day")

    val days = events.select("day").distinct().collect().map(_.getString(0)).sorted
    assert(days.length >= 2, days.mkString(","))
    val (hotDay, coldDay) = (days.head, days.last)

    def files(day: String): Set[(String, Long)] = {
      val dir = java.nio.file.Paths.get(tmp, s"day=$day")
      val s = java.nio.file.Files.list(dir).toArray.toSeq
        .map(_.toString).filter(_.endsWith(".parquet"))
      s.map(p => p -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)).toMillis).toSet
    }
    val coldBefore = files(coldDay)

    // corrected replay of ONE day: same rows, values scaled
    val delta = events.filter(col("day") === hotDay)
      .withColumn("value", col("value") * 2)
    Mv.upsertPartitions(delta, tmp, "day")

    // untouched partition: exactly the same files with the same mtimes
    assert(files(coldDay) == coldBefore)
    val back = Mv.read(spark, tmp)
    // total row count unchanged; only the hot day's values moved
    assert(back.count() == events.count())
    val hotSum = back.filter(col("day") === hotDay)
      .agg(sum("value")).head().getDouble(0)
    val origHotSum = events.filter(col("day") === hotDay)
      .agg(sum("value")).head().getDouble(0)
    assert(math.abs(hotSum - origHotSum * 2) < 1e-6)
    // overwrite semantics restored for the caller
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .contains("dynamic"))
  }
}
