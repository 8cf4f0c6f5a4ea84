package graft.ais

/** AIS sentence encoder — the independent inverse of AisDecoder. Used to
  * build golden test vectors from known field values (FIXTURES.md §A1) and to
  * synthesize deterministic replay fixtures (SparkEntry.entry). Bit layouts
  * re-derived from ITU-R M.1371 field tables, not from the decoder, so
  * roundtrip failures expose real layout bugs.
  */
object NmeaEncoder {

  final class BitBuilder {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]

    def uint(v: Long, len: Int): this.type = {
      var i = len - 1
      while (i >= 0) { bits += ((v >> i) & 1L).toInt; i -= 1 }
      this
    }

    def sint(v: Long, len: Int): this.type =
      uint(if (v < 0) v + (1L << len) else v, len)

    /** 6-bit text, '@'-padded to len bits. */
    def text(s: String, len: Int): this.type = {
      val n = len / 6
      val padded = s.toUpperCase.padTo(n, '@').take(n)
      padded.foreach { c =>
        val v = if (c >= '@' && c <= '_') c - 64 else c.toInt
        uint(v.toLong, 6)
      }
      this
    }

    /** Armor into payload chars + fill bits. */
    def armored: (String, Int) = {
      val fill = (6 - bits.length % 6) % 6
      val all = bits.toIndexedSeq ++ Seq.fill(fill)(0)
      val chars = all.grouped(6).map { g =>
        val v = g.foldLeft(0)((acc, b) => (acc << 1) | b)
        (if (v < 40) v + 48 else v + 56).toChar
      }.mkString
      (chars, fill)
    }
  }

  def sentence(payload: String, fill: Int, total: Int = 1, num: Int = 1,
      seq: String = "", channel: String = "A",
      receiverTs: Option[Long] = None): String = {
    val body = s"AIVDM,$total,$num,$seq,$channel,$payload,$fill"
    val cs = f"${Nmea.checksum(body)}%02X"
    val core = s"!$body*$cs"
    receiverTs.fold(core)(ts => s"\\c:$ts*00\\$core")
  }

  /** Class A position report (type 1 or 3), 168 bits. */
  def position(msgType: Int, mmsi: Long, status: Int, speedKnots: Double,
      lon: Double, lat: Double, heading: Int, ts: Long,
      channel: String = "A"): String = {
    val b = new BitBuilder
    b.uint(msgType.toLong, 6).uint(0, 2).uint(mmsi, 30)
      .uint(status.toLong, 4).sint(0, 8) // ROT
      .uint(math.round(speedKnots * 10), 10).uint(0, 1)
      .sint(math.round(lon * 600000), 28).sint(math.round(lat * 600000), 27)
      .uint(0, 12).uint(heading.toLong, 9).uint(0, 6).uint(0, 2).uint(0, 3)
      .uint(0, 1).uint(0, 19)
    val (p, f) = b.armored
    sentence(p, f, channel = channel, receiverTs = Some(ts))
  }

  /** Class B position report (type 18), 168 bits. */
  def positionB(mmsi: Long, speedKnots: Double, lon: Double, lat: Double,
      heading: Int, ts: Long): String = {
    val b = new BitBuilder
    b.uint(18, 6).uint(0, 2).uint(mmsi, 30).uint(0, 8)
      .uint(math.round(speedKnots * 10), 10).uint(0, 1)
      .sint(math.round(lon * 600000), 28).sint(math.round(lat * 600000), 27)
      .uint(0, 12).uint(heading.toLong, 9).uint(0, 6).uint(0, 31)
    val (p, f) = b.armored
    sentence(p, f, receiverTs = Some(ts))
  }

  /** Static+voyage (type 5), 424 bits, split into 2 fragments like the real
    * feed (SURVEY.md §7.4.1). Returns both sentences. */
  def staticVoyage(mmsi: Long, callsign: String, shipname: String,
      shiptype: Int, destination: String, ts: Long,
      seq: String = "1"): Seq[String] = {
    val b = new BitBuilder
    b.uint(5, 6).uint(0, 2).uint(mmsi, 30).uint(0, 2).uint(0, 30)
      .text(callsign, 42).text(shipname, 120).uint(shiptype.toLong, 8)
      .uint(0, 30).uint(0, 4).uint(0, 20).uint(0, 8)
      .text(destination, 120).uint(0, 1).uint(0, 1)
    val (p, f) = b.armored
    val cut = p.length / 2
    Seq(
      sentence(p.substring(0, cut), 0, total = 2, num = 1, seq = seq,
        receiverTs = Some(ts)),
      sentence(p.substring(cut), f, total = 2, num = 2, seq = seq))
  }
}
