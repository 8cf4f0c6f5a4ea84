package graft.ais

import org.scalatest.funsuite.AnyFunSuite

class AisDecoderSpec extends AnyFunSuite {

  private def decodeLine(line: String): Option[DecodedAis] =
    Nmea.assemble(Nmea.parse(line).iterator).flatMap(AisDecoder.decode).nextOption()

  test("published known-good type 1 sentence decodes to documented values") {
    // Canonical example from the public AIVDM/AIVDO protocol decoding guide:
    // type 1, MMSI 477553000, status 5 (Moored), SOG 0.0,
    // lon -122.345832..., lat 47.582833..., heading 181.
    val line = "!AIVDM,1,1,,B,177KQJ5000G?tO`K>RA1wUbN0TKH,0*5C"
    val d = decodeLine(line).getOrElse(fail("did not decode"))
    assert(d.msgType == 1)
    assert(d.mmsi == "477553000")
    assert(d.status.contains(5))
    assert(d.speed.contains(0.0))
    assert(math.abs(d.lon.get - -122.34583) < 1e-4)
    assert(math.abs(d.lat.get - 47.58283) < 1e-4)
    assert(d.heading.contains(181))
    assert(d.receiverTs.isEmpty) // no tag block on this line
  }

  test("encoder<->decoder roundtrip for types 1, 3, 18") {
    for (t <- Seq(1, 3)) {
      val line = NmeaEncoder.position(t, 257000001L, status = 0,
        speedKnots = 12.3, lon = 5.32, lat = 60.39, heading = 187, ts = 1700000000L)
      val d = decodeLine(line).getOrElse(fail(s"type $t did not decode"))
      assert(d.msgType == t)
      assert(d.mmsi == "257000001")
      assert(d.status.contains(0))
      assert(d.speed.contains(12.3))
      assert(math.abs(d.lon.get - 5.32) < 1e-5)
      assert(math.abs(d.lat.get - 60.39) < 1e-5)
      assert(d.heading.contains(187))
      assert(d.receiverTs.contains(1700000000L))
    }
    val b = decodeLine(NmeaEncoder.positionB(257000002L, 6.5, -3.5, 58.1,
      270, 1700000100L)).getOrElse(fail("type 18 did not decode"))
    assert(b.msgType == 18)
    assert(b.status.isEmpty) // class B has no nav status
    assert(b.speed.contains(6.5))
    assert(math.abs(b.lon.get - -3.5) < 1e-5)
    assert(b.heading.contains(270))
  }

  test("type 5 two-fragment assembly decodes names and destination") {
    val lines = NmeaEncoder.staticVoyage(257000001L, "LAJX", "HAVFRUEN",
      shiptype = 70, destination = "BERGEN", ts = 1700000200L)
    val sentences = lines.flatMap(Nmea.parse)
    assert(sentences.length == 2)
    val d = Nmea.assemble(sentences.iterator).flatMap(AisDecoder.decode)
      .nextOption().getOrElse(fail("fragments did not assemble"))
    assert(d.msgType == 5)
    assert(d.mmsi == "257000001")
    assert(d.callsign.contains("LAJX"))
    assert(d.shipname.contains("HAVFRUEN"))
    assert(d.shiptype.contains(70))
    assert(d.destination.contains("BERGEN"))
    assert(d.receiverTs.contains(1700000200L)) // tag of first fragment wins
  }

  test("fragments of a pair arriving out of order still assemble") {
    val lines = NmeaEncoder.staticVoyage(257000009L, "XXYY", "REVERSED",
      60, "OSLO", 1700000300L)
    val rev = lines.reverse.flatMap(Nmea.parse)
    val d = Nmea.assemble(rev.iterator).flatMap(AisDecoder.decode).nextOption()
    assert(d.exists(_.shipname.contains("REVERSED")))
  }

  test("a lost fragment does not poison a recycled seqId") {
    // AIS seqIds are 0-9 and recycle constantly: ship A's second fragment is
    // lost, then ship B reuses seqId 1. B's fragment 1 duplicates the buffered
    // num=1, so the assembler must restart the group — not append forever.
    val a = NmeaEncoder.staticVoyage(257000011L, "AAAA", "LOSTTWO", 70,
      "BERGEN", 1700000400L, seq = "1").flatMap(Nmea.parse)
    val b = NmeaEncoder.staticVoyage(257000012L, "BBBB", "SURVIVOR", 60,
      "OSLO", 1700000500L, seq = "1").flatMap(Nmea.parse)
    val asm = new Nmea.Assembler
    assert(asm.offer(a.head).isEmpty) // A fragment 1; fragment 2 never arrives
    val out = b.flatMap(asm.offer).flatMap(AisDecoder.decode)
    assert(out.exists(_.shipname.contains("SURVIVOR")), out)
  }

  test("duplicated and total-inconsistent fragments restart the group") {
    val lines = NmeaEncoder.staticVoyage(257000013L, "CCCC", "TWINFRAG", 70,
      "STAVANGER", 1700000600L, seq = "2").flatMap(Nmea.parse)
    val asm = new Nmea.Assembler
    // duplicate fragment 1 three times: each restarts, none completes
    assert(asm.offer(lines.head).isEmpty)
    assert(asm.offer(lines.head).isEmpty)
    assert(asm.offer(lines.head).isEmpty)
    // then the real pair assembles despite the noise
    assert(asm.offer(lines.head).isEmpty)
    val done = asm.offer(lines(1)).flatMap(AisDecoder.decode)
    assert(done.exists(_.shipname.contains("TWINFRAG")), done)
    // a changed total mid-group restarts too: feed frag1 (total=2), then a
    // crafted frag2 claiming total=3 — group restarts from the total=3 frag
    val asm2 = new Nmea.Assembler
    assert(asm2.offer(lines.head).isEmpty)
    assert(asm2.offer(lines(1).copy(total = 3)).isEmpty)
    assert(asm2.offer(lines(1)).isEmpty) // no frag1 buffered anymore
    // out-of-range num drops the group outright
    val asm3 = new Nmea.Assembler
    assert(asm3.offer(lines.head.copy(num = 0)).isEmpty)
    assert(asm3.offer(lines.head.copy(num = 5)).isEmpty)
  }

  test("bad checksum, empty lines, and non-AIS noise are rejected") {
    assert(Nmea.parse("!AIVDM,1,1,,B,177KQJ5000G?tO`K>RA1wUbN0TKH,0*FF").isEmpty)
    assert(Nmea.parse("").isEmpty)
    assert(Nmea.parse("$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9*47").isEmpty)
    assert(Nmea.parse("random garbage").isEmpty)
  }

  test("tag block receiver timestamp parses; sentence without tag has none") {
    val withTag = NmeaEncoder.position(1, 123456789L, 0, 5.0, 10.0, 55.0,
      90, 1699999999L)
    assert(Nmea.parse(withTag).flatMap(_.tag.flatMap(_.receiverTimestamp))
      .contains(1699999999L))
  }

  test("unknown message types are dropped by the decoder") {
    // type 24 payload (static data report) — not in {1,3,5,18}
    val b = new NmeaEncoder.BitBuilder
    b.uint(24, 6).uint(0, 2).uint(111111111L, 30).uint(0, 130)
    val (p, f) = b.armored
    val line = NmeaEncoder.sentence(p, f, receiverTs = Some(1700000000L))
    assert(decodeLine(line).isEmpty)
  }

  test("nav status and ship type name tables") {
    assert(AisDecoder.navStatusName(0) == "UnderWayUsingEngine")
    assert(AisDecoder.navStatusName(5) == "Moored")
    assert(AisDecoder.navStatusName(15) == "Undefined")
    assert(AisDecoder.navStatusName(99) == "NotReported")
    assert(AisDecoder.shipTypeName(70) == "Cargo_AllShipsOfThisType")
    assert(AisDecoder.shipTypeName(71) == "Cargo_HazardousCategory_A")
    assert(AisDecoder.shipTypeName(80) == "Tanker_AllShipsOfThisType")
    assert(AisDecoder.shipTypeName(30) == "Fishing")
    assert(AisDecoder.shipTypeName(52) == "Tug")
    assert(AisDecoder.shipTypeName(0) == "NotReported")
  }

  test("six-bit armoring is self-inverse over the full alphabet") {
    for (v <- 0 until 64) {
      val c = (if (v < 40) v + 48 else v + 56).toChar
      assert(AisDecoder.sixBit(c) == v)
    }
  }
}
