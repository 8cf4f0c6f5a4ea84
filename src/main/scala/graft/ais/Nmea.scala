package graft.ais

import scala.collection.mutable

/** NMEA 0183 framing for AIS (!AIVDM/!AIVDO): tag-block parse, checksum
  * validation, field split, and multi-sentence payload assembly — the engine's
  * replacement for pyais's stream layer (producer-from-ais-api.py:23-33).
  * Format per the public AIVDM/AIVDO protocol documentation and ITU-R M.1371.
  *
  * Pure Scala, no Spark dependency: invoked from `Dataset[String].mapPartitions`
  * (SURVEY.md §2.A A2) where fragments of multi-sentence messages arrive
  * adjacently on one TCP stream, so assembly is partition-local state.
  */
object Nmea {

  /** NMEA v4.10 TAG block (`\k:v,k:v*hh\` prefix). Only `c:` (receiver unix
    * timestamp) is extracted — the only field the reference uses
    * (producer-from-ais-api.py:32-34). */
  case class TagBlock(receiverTimestamp: Option[Long])

  case class Sentence(
      total: Int,
      num: Int,
      seqId: Option[Int],
      channel: String,
      payload: String,
      fillBits: Int,
      tag: Option[TagBlock])

  /** A complete (possibly multi-fragment) 6-bit payload ready to decode. */
  case class Assembled(payload: String, fillBits: Int, receiverTs: Option[Long])

  /** XOR checksum of the characters between '!'/'$' and '*'. */
  def checksum(body: String): Int = body.foldLeft(0)(_ ^ _.toInt)

  private def checksumOk(body: String, hex: String): Boolean =
    try checksum(body) == Integer.parseInt(hex.trim, 16)
    catch { case _: NumberFormatException => false }

  private def parseTag(s: String): TagBlock = {
    // strip optional trailing *hh tag checksum, then k:v fields
    val fields = s.lastIndexOf('*') match {
      case -1 => s
      case i  => s.substring(0, i)
    }
    val ts = fields.split(',').collectFirst {
      case f if f.startsWith("c:") => f.drop(2)
    }.flatMap(v => scala.util.Try(v.trim.toLong).toOption)
    TagBlock(ts)
  }

  /** Parse one raw line (optionally tag-block-prefixed) into a validated
    * sentence; None for non-AIS lines, bad checksums, malformed fields. */
  def parse(line: String): Option[Sentence] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return None
    val (tag, rest) =
      if (trimmed.startsWith("\\")) {
        val end = trimmed.indexOf('\\', 1)
        if (end < 0) return None
        (Some(parseTag(trimmed.substring(1, end))), trimmed.substring(end + 1))
      } else (None, trimmed)
    if (rest.isEmpty || (rest.charAt(0) != '!' && rest.charAt(0) != '$')) return None
    val star = rest.lastIndexOf('*')
    if (star < 0 || star + 3 > rest.length) return None
    val body = rest.substring(1, star)
    if (!checksumOk(body, rest.substring(star + 1))) return None
    val f = body.split(",", -1)
    if (f.length < 7 || !f(0).endsWith("VDM") && !f(0).endsWith("VDO")) return None
    try Some(Sentence(
      total = f(1).toInt,
      num = f(2).toInt,
      seqId = if (f(3).isEmpty) None else Some(f(3).toInt),
      channel = f(4),
      payload = f(5),
      fillBits = f(6).toInt,
      tag = tag))
    catch { case _: NumberFormatException => None }
  }

  /** Incremental multi-sentence assembler (type 5 spans 2 sentences —
    * SURVEY.md §7.4.1). Fragments buffer per (seqId, channel) and emit when
    * the last arrives; the tag block of the first fragment wins (it carries
    * the receive time). One instance per partition/stream; incomplete groups
    * at end-of-partition drop.
    *
    * AIS seqIds are 0-9 and recycle constantly on a live feed, so a group key
    * must never be poisoned: an inconsistent fragment (duplicate num, changed
    * total, num out of range) restarts the group from that fragment instead
    * of appending — the old half-group is a casualty of fragment loss and the
    * newcomer is the start of the next message reusing the seqId. Fragments
    * within a group are therefore distinct nums in 1..total (≤ 9 each), and
    * `pending` is bounded by the seqId×channel key space — memory is O(1) on
    * an unbounded stream, and `buf.length == total` is always reachable. */
  final class Assembler {
    private val pending =
      mutable.Map.empty[(Option[Int], String), mutable.ArrayBuffer[Sentence]]

    def offer(s: Sentence): Option[Assembled] =
      if (s.total <= 1) {
        Some(Assembled(s.payload, s.fillBits, s.tag.flatMap(_.receiverTimestamp)))
      } else {
        val key = (s.seqId, s.channel)
        if (s.num < 1 || s.num > s.total) { pending.remove(key); return None }
        val buf = pending.get(key) match {
          case Some(b) if b.head.total == s.total && !b.exists(_.num == s.num) => b
          case _ => // none open, or inconsistent: restart from this fragment
            val fresh = mutable.ArrayBuffer.empty[Sentence]
            pending(key) = fresh
            fresh
        }
        buf += s
        if (buf.length == s.total) {
          pending.remove(key)
          val ordered = buf.sortBy(_.num)
          Some(Assembled(
            ordered.map(_.payload).mkString,
            ordered.last.fillBits,
            ordered.head.tag.flatMap(_.receiverTimestamp)))
        } else None
      }
  }

  /** Iterator form of [[Assembler]]. */
  def assemble(sentences: Iterator[Sentence]): Iterator[Assembled] = {
    val asm = new Assembler
    sentences.flatMap(asm.offer)
  }
}
