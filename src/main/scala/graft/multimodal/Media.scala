package graft.multimodal

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.6): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted in
  * batched per-partition passes.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything around it —
  * schema, binary column handling, partitioning, batch iteration shape — is
  * real and tested. At 100 TB the payloads dominate row size: the design
  * keeps them out of every shuffle (metadata-only projections before joins,
  * payload fetched per-partition), which is why the typed record carries
  * metadata beside the blob instead of in a separate table.
  */
object Media {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features (stub schema matches what a real decoder would emit). */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, mime: String)

  /** Batched per-partition "decode": iterates each partition once, touching
    * payload bytes only here. STUB — a real build links an image/audio codec
    * at this exact seam; the deterministic fake derives dimensions from the
    * byte length so tests and the oracle can pin the plumbing.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        MediaFeatures(r.doc_id, n, n % 640 + 1, (n * 7) % 480 + 1, r.mime)
      }
    }
  }

  /** Documents reinterpreted as a media table (UTF-8 payload bytes). */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRecord]
  }

  /** Metadata extraction, column-expression form: the oracled equivalent of
    * [[decodeStub]]'s arithmetic (identical outputs — pinned by MediaSpec). */
  val metadataQ = QueryDef(
    "media_metadata",
    "binary payload + stubbed decode: byte length -> fake dimensions",
    Some("""SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   octet_length(encode(text)) % 640 + 1 AS width,
                   (octet_length(encode(text)) * 7) % 480 + 1 AS height,
                   'text/plain' AS mime
            FROM documents"""),
    (s, dir) => {
      val payload = encode(col("text"), "UTF-8")
      Tables.documents(s, dir).select(
        col("doc_id"),
        octet_length(payload).as("n_bytes"),
        (octet_length(payload) % 640 + 1).as("width"),
        (octet_length(payload) * 7 % 480 + 1).as("height"),
        lit("text/plain").as("mime"))
    })

  /** Frame sampling: every 4th frame index of an n_chars/32-frame "video" —
    * the generate-indices + explode plumbing a video pipeline needs. */
  val frameSampleQ = QueryDef(
    "media_frame_sample",
    "frame-index sampling via sequence + explode (every 4th of n/32 frames)",
    Some("""SELECT doc_id, unnest(generate_series(0, n_chars // 32 - 1, 4)) AS frame_idx
            FROM documents WHERE n_chars // 32 >= 1"""),
    (s, dir) => Tables.documents(s, dir)
      .withColumn("n_frames", expr("n_chars div 32"))
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx")))

  /** Resize planning: aspect-preserving target dimensions (max side 256) for
    * every payload — integer arithmetic over the stubbed decode dims, so a
    * real resize kernel at the [[decodeStub]] seam receives exact output
    * shapes. Pure per-row expressions; payload bytes untouched. */
  val resizeQ = QueryDef(
    "media_resize",
    "aspect-preserving resize dims (max side 256) per payload",
    Some("""WITH m AS (SELECT doc_id,
                              octet_length(encode(text)) % 640 + 1 AS width,
                              (octet_length(encode(text)) * 7) % 480 + 1 AS height
                       FROM documents)
            SELECT doc_id, width, height,
                   greatest(1, width * 256 // greatest(width, height)) AS out_w,
                   greatest(1, height * 256 // greatest(width, height)) AS out_h
            FROM m"""),
    (s, dir) => {
      val payload = encode(col("text"), "UTF-8")
      // clamp to >= 1: floor division of an extreme aspect ratio (1x321)
      // would otherwise emit a degenerate 0-wide target
      Tables.documents(s, dir)
        .select(col("doc_id"),
          (octet_length(payload) % 640 + 1).as("width"),
          (octet_length(payload) * 7 % 480 + 1).as("height"))
        .withColumn("out_w",
          expr("greatest(1L, width * 256 div greatest(width, height))"))
        .withColumn("out_h",
          expr("greatest(1L, height * 256 div greatest(width, height))"))
    })

  /** Feature extraction at the decode seam: per-payload byte statistics
    * (total, mean byte value, low-byte count, distinct bytes) computed in
    * the same batched mapPartitions pass a real featurizer (CLIP embedding,
    * mel spectrogram) would occupy. Payload bytes are touched exactly once
    * per partition and never shuffled — only the fixed-width feature row
    * moves. Oracle: the corpus is ASCII, so byte stats equal code-point
    * stats over the text (pinned by the gate at every SF). */
  val featuresQ = QueryDef(
    "media_feature_bytes",
    "per-payload byte features via the batched decode seam (mapPartitions)",
    Some(s"""WITH cp AS (SELECT doc_id,
                    list_transform(string_split(text, ''), c -> ord(c)) AS cps
                  FROM documents)
             SELECT doc_id, len(cps) AS n_bytes,
                    ${graft.functions.Num.sql(
                      "CAST(list_sum(cps) AS DOUBLE) / len(cps)", 4)} AS mean_byte,
                    len(list_filter(cps, c -> c < 97)) AS n_low,
                    len(list_distinct(cps)) AS n_distinct_bytes
             FROM cp WHERE len(cps) > 0"""),
    (s, dir) => {
      import s.implicits._
      asMedia(s, dir).filter(r => r.payload.nonEmpty).mapPartitions { it =>
        it.map { r =>
          var sum = 0L; var low = 0L
          val seen = new java.util.BitSet(256)
          var i = 0
          while (i < r.payload.length) {
            val b = r.payload(i) & 0xFF
            sum += b; if (b < 97) low += 1; seen.set(b)
            i += 1
          }
          (r.doc_id, r.payload.length.toLong, sum, low,
            seen.cardinality().toLong)
        }
      }.toDF("doc_id", "n_bytes", "byte_sum", "n_low", "n_distinct_bytes")
        .select(col("doc_id"), col("n_bytes"),
          graft.functions.Num.pround(
            col("byte_sum").cast("double") / col("n_bytes"), 4).as("mean_byte"),
          col("n_low"), col("n_distinct_bytes"))
    })

  /** Exact payload dedup on the binary column: group by sha-256 of the raw
    * bytes, keep the smallest doc_id. The media twin of Dedup's md5-on-text —
    * at 100 TB the hash is computed in the scan projection so the blobs
    * themselves never shuffle; only (hash, id, length) moves. */
  val dedupQ = QueryDef(
    "media_dedup",
    "binary payload dedup: sha-256 grouping, keep min doc_id",
    Some("""SELECT sha256(text) AS payload_sha, min(doc_id) AS keeper_id,
                   count(*) AS n_copies,
                   min(octet_length(encode(text))) AS n_bytes
            FROM documents GROUP BY 1"""),
    (s, dir) => asMedia(s, dir)
      .groupBy(sha2(col("payload"), 256).as("payload_sha"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"),
        min(octet_length(col("payload"))).as("n_bytes")))

  /** One PCM audio frame: which payload, which frame, mean square energy. */
  case class PcmFrame(doc_id: Long, frame_idx: Long, energy: Double)

  /** Audio-shaped decode: interpret the payload as big-endian unsigned
    * 16-bit PCM (centered to signed), cut into fixed 128-sample frames, and
    * emit per-frame mean-square energy — the framing + feature pass of an
    * audio pipeline (a real build swaps the 2-byte decode for a codec at
    * this seam; the framing, energy accumulation and output schema stay).
    * Energy is sum(s²)/128 — an exact integer divided by a power of two, so
    * the double is bit-identical in any engine with NO rounding step.
    * Payload bytes are read once per partition and never shuffled. */
  def pcmFrameEnergy(media: Dataset[MediaRecord],
      frameBytes: Int): Dataset[PcmFrame] = {
    import media.sparkSession.implicits._
    val samplesPerFrame = frameBytes / 2
    media.mapPartitions { it =>
      it.flatMap { r =>
        val b = r.payload
        (0 until b.length / frameBytes).iterator.map { f =>
          var sum = 0L
          var j = f * frameBytes
          val end = j + frameBytes
          while (j + 1 < end) {
            val s = (((b(j) & 0xFF) << 8) | (b(j + 1) & 0xFF)) - 32768
            sum += s.toLong * s
            j += 2
          }
          PcmFrame(r.doc_id, f.toLong, sum.toDouble / samplesPerFrame)
        }
      }
    }
  }

  val pcmEnergyQ = QueryDef(
    "media_pcm_energy",
    "PCM framing + mean-square energy per 128-sample frame (audio seam)",
    Some("""WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents),
            fr AS (SELECT doc_id, text, i AS frame_idx
                   FROM c CROSS JOIN unnest(generate_series(0, n // 256 - 1)) AS u(i)
                   WHERE n >= 256),
            sm AS (SELECT doc_id, frame_idx,
                     (256 * ord(text[CAST(256*frame_idx + 2*j + 1 AS BIGINT)])
                        + ord(text[CAST(256*frame_idx + 2*j + 2 AS BIGINT)])
                        - 32768) AS s
                   FROM fr CROSS JOIN unnest(generate_series(0, 127)) AS v(j))
            SELECT doc_id, frame_idx, CAST(sum(s*s) AS DOUBLE)/128 AS energy
            FROM sm GROUP BY 1, 2"""),
    (s, dir) => pcmFrameEnergy(asMedia(s, dir), 256).toDF())

  val defs: Seq[QueryDef] = Seq(metadataQ, frameSampleQ, resizeQ, featuresQ,
    dedupQ, pcmEnergyQ)
}
