package graft
import graft.ais.NmeaEncoder
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
object GenFixture {
  def main(args: Array[String]): Unit = {
    val lines = (0 until 20).flatMap { i =>
      val mmsi = 257100001L + i
      Seq(NmeaEncoder.position(1, mmsi, i % 9, 5.0 + i, 4.5 + i * 0.05,
        58.0 + i * 0.1, (i * 31) % 360, 1700000000L + i * 10)) ++
        NmeaEncoder.staticVoyage(mmsi, s"CS$i", s"VESSEL$i", 70, "OSLO",
          1700000005L + i * 10)
    }
    Files.createDirectories(Paths.get(args(0)))
    Files.write(Paths.get(args(0), "feed.nmea"), lines.asJava)
    println(s"wrote ${lines.length} lines")
  }
}
