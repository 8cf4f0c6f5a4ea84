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
