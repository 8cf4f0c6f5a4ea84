package graft.ais

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Robustness: hostile/garbage input must never throw — a poisoned record on
  * a 100 TB ingest must drop, not kill the stage. */
class DecoderFuzzSpec extends AnyFunSuite {

  private def lines(gen: Gen[String], n: Int, seed: Long): Seq[String] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  test("random printable garbage never throws through parse+assemble+decode") {
    val garbage = Gen.asciiPrintableStr
    val out = Nmea.assemble(
      lines(garbage, 2000, 1L).iterator.flatMap(Nmea.parse))
      .flatMap(AisDecoder.decode).toList
    assert(out != null) // completing without an exception is the property
  }

  test("structurally plausible but corrupt sentences never throw") {
    val corrupt = for {
      payload <- Gen.stringOfN(28, Gen.oneOf(('0' to 'W') ++ ('`' to 'w')))
      total <- Gen.chooseNum(1, 3)
      num <- Gen.chooseNum(0, 4)
      fill <- Gen.chooseNum(0, 9)
    } yield {
      val body = s"AIVDM,$total,$num,,A,$payload,$fill"
      s"!$body*${f"${Nmea.checksum(body)}%02X"}" // valid checksum, junk fields
    }
    val out = Nmea.assemble(
      lines(corrupt, 2000, 2L).iterator.flatMap(Nmea.parse))
      .flatMap(AisDecoder.decode).toList
    // decodes may succeed (junk payloads CAN be valid type-1 frames) or not,
    // but values that do decode stay in representable ranges
    out.foreach { d =>
      d.lat.foreach(v => assert(math.abs(v) <= 111.9)) // raw 27-bit/600k range
      d.heading.foreach(h => assert(h >= 0 && h <= 511))
    }
  }

  test("property: adjacent fragment pairs assemble through arbitrary noise " +
    "and seqId collisions") {
    // 40 type-5 messages cycling through only 3 seqIds, with random
    // single-fragment noise and random duplicated first fragments injected
    // between pairs — every complete adjacent pair must still assemble.
    val rnd = new scala.util.Random(7L)
    val msgs = (0 until 40).map { i =>
      NmeaEncoder.staticVoyage(257100000L + i, f"C$i%03d", f"SHIP$i%03d",
        60 + (i % 30), "OSLO", 1700000000L + i, seq = (i % 3).toString)
        .flatMap(Nmea.parse)
    }
    val noise = Nmea.parse(NmeaEncoder.position(1, 999999999L, 0, 9.9,
      5.0, 60.0, 90, 1699999999L)).get
    val stream = msgs.flatMap { pair =>
      val pre = if (rnd.nextBoolean()) Seq(noise) else Seq.empty
      val dup = if (rnd.nextBoolean()) Seq(pair.head) else Seq.empty // stray frag 1
      pre ++ dup ++ pair
    }
    val names = Nmea.assemble(stream.iterator).flatMap(AisDecoder.decode)
      .flatMap(_.shipname).toSet
    assert((0 until 40).forall(i => names.contains(f"SHIP$i%03d")), names.size)
  }

  test("truncated payloads and absurd fill bits are rejected, not thrown") {
    for (p <- Seq("", "1", "177KQ", "1" * 200); fill <- Seq(0, 5)) {
      val body = s"AIVDM,1,1,,A,$p,$fill"
      val line = s"!$body*${f"${Nmea.checksum(body)}%02X"}"
      Nmea.parse(line).foreach { s =>
        Nmea.assemble(Iterator.single(s)).flatMap(AisDecoder.decode).toList
      } // must not throw
    }
  }
}
