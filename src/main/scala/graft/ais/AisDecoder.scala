package graft.ais

/** Bit-level AIS payload decoder for message types 1, 3, 18 (position) and 5
  * (static + voyage) — the only types the Norwegian feed sends and the
  * reference routes (producer-from-ais-api.py:37-40, 78). Field layouts per
  * ITU-R M.1371 / the public AIVDM protocol documentation; replaces pyais's
  * `msg.decode().asdict()` (producer:26-27).
  *
  * Pure Scala — used inside `Dataset.mapPartitions` (no Catalyst Expression
  * needed: decode is a per-record function on the ingest edge, SURVEY.md §2.A).
  */
object AisDecoder {

  /** 6-bit ASCII armoring: char - 48, minus 8 more above 40. */
  private[ais] def sixBit(c: Char): Int = {
    val v = c - 48
    if (v > 40) v - 8 else v
  }

  /** Random-access bit view over an armored payload. */
  final class BitVector(payload: String, fillBits: Int) {
    private val vals: Array[Int] = payload.toCharArray.map(sixBit)
    val nBits: Int = payload.length * 6 - fillBits

    def uint(from: Int, len: Int): Long = {
      var acc = 0L
      var i = from
      val end = from + len
      while (i < end) {
        acc = (acc << 1) | ((vals(i / 6) >> (5 - i % 6)) & 1)
        i += 1
      }
      acc
    }

    def sint(from: Int, len: Int): Long = {
      val raw = uint(from, len)
      if ((raw & (1L << (len - 1))) != 0) raw - (1L << len) else raw
    }

    /** 6-bit string: values 0-31 map to '@'..'_', 32-63 to ' '..'?'; '@'
      * terminates; trailing spaces trimmed. */
    def string(from: Int, len: Int): String = {
      val sb = new StringBuilder
      var i = from
      var done = false
      while (!done && i + 6 <= math.min(from + len, nBits)) {
        val v = uint(i, 6).toInt
        if (v == 0) done = true
        else { sb.append(if (v < 32) ('@' + v).toChar else v.toChar); i += 6 }
      }
      sb.toString.reverse.dropWhile(_ == ' ').reverse
    }
  }

  /** Navigation-status names (ITU-R M.1371 table 45); the producer publishes
    * `status.name` or "NotReported" when absent (producer:41-45). */
  val navStatusNames: IndexedSeq[String] = IndexedSeq(
    "UnderWayUsingEngine", "AtAnchor", "NotUnderCommand",
    "RestrictedManoeuverability", "ConstrainedByDraught", "Moored", "Aground",
    "EngagedInFishing", "UnderWaySailing",
    "ReservedForFutureAmendmentOfNavigationalStatusForHSC",
    "ReservedForFutureAmendmentOfNavigationalStatusForWIG",
    "PowerDrivenVesselTowingAstern",
    "PowerDrivenVesselPushingAheadOrTowingAlongside",
    "ReservedForFutureUse", "AisSartIsActive", "Undefined")

  def navStatusName(code: Int): String =
    if (code >= 0 && code < navStatusNames.length) navStatusNames(code)
    else "NotReported"

  /** Ship-type names (ITU-R M.1371 table 53). The serving layer's icon map
    * matches on these prefixes (console.py:62-80), so the base-category
    * spelling matters: Cargo/Tanker/Passenger/Fishing/HSC/OtherType/etc. */
  def shipTypeName(code: Int): String = {
    def hazard(u: Int, base: String): String = u match {
      case 1 | 2 | 3 | 4 => s"${base}_HazardousCategory_${('A' + u - 1).toChar}"
      case 9             => s"${base}_NoAdditionalInformation"
      case 0             => s"${base}_AllShipsOfThisType"
      case _             => s"${base}_Reserved"
    }
    code match {
      case 30 => "Fishing"
      case 31 | 32 => "Towing"
      case 33 => "DredgingOrUnderwaterOps"
      case 34 => "DivingOps"
      case 35 => "MilitaryOps"
      case 36 => "Sailing"
      case 37 => "PleasureCraft"
      case 50 => "PilotVessel"
      case 51 => "SearchAndRescueVessel"
      case 52 => "Tug"
      case 53 => "PortTender"
      case 54 => "AntiPollutionEquipment"
      case 55 => "LawEnforcement"
      case 56 | 57 => "SpareLocalVessel"
      case 58 => "MedicalTransport"
      case 59 => "NonCombatShip"
      case c if c >= 20 && c <= 29 => hazard(c - 20, "WIG")
      case c if c >= 40 && c <= 49 => hazard(c - 40, "HSC")
      case c if c >= 60 && c <= 69 => hazard(c - 60, "Passenger")
      case c if c >= 70 && c <= 79 => hazard(c - 70, "Cargo")
      case c if c >= 80 && c <= 89 => hazard(c - 80, "Tanker")
      case c if c >= 90 && c <= 99 => hazard(c - 90, "OtherType")
      case _ => "NotReported"
    }
  }

  /** Decode an assembled payload; None for types we don't carry or payloads
    * too short for their advertised type. */
  def decode(a: Nmea.Assembled): Option[DecodedAis] = {
    val b = new BitVector(a.payload, a.fillBits)
    if (b.nBits < 38) return None
    val t = b.uint(0, 6).toInt
    val mmsi = b.uint(8, 30).toString
    def base = DecodedAis(t, mmsi, a.receiverTs, None, None, None, None, None,
      None, None, None, None)
    t match {
      case 1 | 3 if b.nBits >= 144 =>
        Some(base.copy(
          status = Some(b.uint(38, 4).toInt),
          speed = Some(b.uint(50, 10) / 10.0),
          lon = Some(b.sint(61, 28) / 600000.0),
          lat = Some(b.sint(89, 27) / 600000.0),
          heading = Some(b.uint(128, 9).toInt)))
      case 18 if b.nBits >= 144 =>
        Some(base.copy(
          speed = Some(b.uint(46, 10) / 10.0),
          lon = Some(b.sint(57, 28) / 600000.0),
          lat = Some(b.sint(85, 27) / 600000.0),
          heading = Some(b.uint(124, 9).toInt)))
      case 5 if b.nBits >= 420 =>
        Some(base.copy(
          callsign = Some(b.string(70, 42)),
          shipname = Some(b.string(112, 120)),
          shiptype = Some(b.uint(232, 8).toInt),
          destination = Some(b.string(302, 120))))
      case _ => None
    }
  }
}
