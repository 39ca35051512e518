package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star scope): image/audio/video
  * payloads ride through the pipeline as opaque BINARY columns with a
  * typed metadata struct alongside text + embeddings — the row shape a
  * large-scale training-data pipeline materializes.
  *
  * Everything metadata-level (sniffing, hashing, sizing, sample assembly)
  * is real, codegen'd column arithmetic that scales like any other
  * projection. Actual codec work (pixel decode, resample, frame extract)
  * requires native libraries that are NOT in this build environment, so
  * [[decodeImageStub]] is a clearly-marked deterministic stand-in with the
  * production shape documented: at scale the decode step is a
  * `mapPartitions` (or Python `mapInPandas`) over batches of binary
  * payloads, emitting the same `(width, height, channels)` struct this
  * stub fakes — the schema, partitioning, and downstream plumbing are
  * identical either way.
  */
object Multimodal {

  /** Magic-byte prefixes (public file-format signatures). */
  val JpegMagic: Array[Byte] = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
  val PngMagic: Array[Byte] = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
  val RiffMagic: Array[Byte] = Array(0x52, 0x49, 0x46, 0x46).map(_.toByte) // "RIFF" (wav/avi)

  /** Content-type sniff from leading magic bytes — hex-prefix compare on
    * the first 4 bytes only, so the whole (possibly huge) payload never
    * feeds the predicate. */
  def modality(bin: Column): Column = {
    val head = hex(substring(bin, 1, 4))
    when(head.startsWith("FFD8FF"), lit("image/jpeg"))        // JPEG = FF D8 FF
      .when(head.startsWith("89504E47"), lit("image/png"))
      .when(head.startsWith("52494646"), lit("audio/riff"))
      .otherwise(lit("application/octet-stream"))
  }

  /** Deterministic 128-bit content hash of a binary payload, emitted as hex
    * md5 — the exact-dedup / provenance key for media, same role
    * [[graft.functions.Funcs.fingerprint]] plays for text. (Hashes the hex
    * encoding so the Spark and DuckDB oracles agree byte-for-byte.) */
  def contentHash(bin: Column): Column = md5(hex(bin).cast("binary"))

  /** Typed media metadata struct: size, hash, sniffed modality. This is
    * the column a 100 TB pipeline computes ONCE at ingest and carries
    * instead of re-reading payload bytes. */
  def mediaMeta(bin: Column): Column = struct(
    length(bin).cast("bigint").as("n_bytes"),
    contentHash(bin).as("content_md5"),
    modality(bin).as("modality"))

  /** STUB — deterministic fake image decode. Production: this exact
    * struct comes from a `mapPartitions` batch decode with a real codec
    * (libjpeg/ffmpeg), one partition per worker-locality batch; the fake
    * derives plausible dimensions from the payload hash so downstream
    * plumbing (schema, filters, grouping on decoded fields) is testable
    * without the native libs. */
  def decodeImageStub(bin: Column): Column = {
    val h = xxhash64(bin) // pmod (not %/abs): ANSI-safe, always non-negative
    struct(
      (pmod(h, lit(1920L)) + 1).cast("int").as("width"),
      (pmod(h, lit(1080L)) + 1).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** Decoded-image row emitted by [[decodePartitions]]. */
  case class DecodedImage(doc_id: Long, width: Int, height: Int, channels: Int,
      feature: Array[Float])

  /** The REAL decode plumbing — the Scala analog of a Python
    * `mapInPandas` batch decode: one pluggable `codec` call per payload,
    * executed per partition so a native library handle (libjpeg/ffmpeg
    * context) is acquired once per task, not per row. Rows whose payloads
    * fail to decode are dropped (codec returns None). The default codec is
    * the deterministic fake ([[decodeImageStub]]'s math + a hash-derived
    * feature vector) so schema, batching, and downstream joins are
    * testable without native libs; swap `codec` for the real thing in
    * production — nothing else changes.
    */
  def decodePartitions(
      media: DataFrame,
      codec: Array[Byte] => Option[(Int, Int, Int, Array[Float])] = fakeCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-task codec setup would go here (one native context per partition)
        rows.flatMap { case (id, bytes) =>
          codec(bytes).map { case (w, h, c, f) => DecodedImage(id, w, h, c, f) }
        }
      }
      .toDF()
  }

  /** STUB codec: plausible dimensions + an 8-dim feature vector derived
    * from the payload hash. Deterministic; null/empty payloads fail to
    * decode (None) like a real codec would. */
  def fakeCodec(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    if (bytes == null || bytes.isEmpty) None
    else {
      val h = java.util.Arrays.hashCode(bytes).toLong & 0x7FFFFFFFL
      val feature = Array.tabulate(8)(i => (((h >> (i * 4)) & 0xF).toFloat / 15f))
      Some(((h % 1920 + 1).toInt, (h % 1080 + 1).toInt, 3, feature))
    }
  }

  /** STUB — resize plan: the target geometry preserving aspect ratio
    * within a `maxDim` box, computed from decoded dimensions. Pure column
    * arithmetic (the pixel resample itself is codec work executed inside
    * [[decodePartitions]]' pluggable codec). */
  def resizePlan(width: Column, height: Column, maxDim: Int): Column = {
    val scale = least(lit(maxDim) / width.cast("double"), lit(maxDim) / height.cast("double"), lit(1.0))
    struct(
      ceil(width * scale).cast("int").as("target_width"),
      ceil(height * scale).cast("int").as("target_height"))
  }

  /** Frame-sample positions for a media payload of `durationMs`, every
    * `everyMs` — the pure-Spark plumbing of a video frame sampler (the
    * per-position pixel grab is codec work, see [[decodeImageStub]]). */
  def framePositionsMs(durationMs: Column, everyMs: Long): Column =
    // zero-length media yields no frames (an unguarded sequence(0, -1, +step) throws)
    when(durationMs > 0, sequence(lit(0L), durationMs - 1, lit(everyMs)))
      .otherwise(array().cast("array<bigint>"))

  /** Assemble the canonical multimodal training sample: doc fields + media
    * binary with its metadata + embedding, one struct row per doc. The
    * join is keyed (doc_id = vec_id) so Catalyst plans a shuffle-keyed or
    * broadcast equi-join — no payload ever crosses the network more than
    * once. */
  def assembleSamples(documents: DataFrame, media: DataFrame, embeddings: DataFrame): DataFrame =
    documents
      .join(media, Seq("doc_id"))
      .join(embeddings.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(
        col("doc_id"),
        struct(col("text"), col("media"), mediaMeta(col("media")).as("meta"),
          col("embedding")).as("sample"))
}
