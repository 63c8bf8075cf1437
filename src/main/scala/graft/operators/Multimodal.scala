package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/**
 * Multimodal column handling: image/audio/video payloads as opaque
 * `binary` columns with a typed metadata struct, plus the executor-side
 * decode/feature-extract plumbing.
 *
 * The decode itself is STUBBED (this container ships no image/audio
 * codecs): `decodeStub` derives deterministic fake dimensions from the
 * payload's md5. Everything around it — schema, batched per-partition
 * processing, partition sizing — is real and tested, so swapping in a
 * codec is a one-function change.
 *
 * Scale notes: media payloads are large and must never be shuffled
 * gratuitously — derive metadata in a narrow map, then drop or offload the
 * payload before any wide operation. `mapPartitions` processes rows
 * iterator-to-iterator (constant memory per partition) — the Scala analog
 * of Arrow-batched mapInPandas; batch-level vectorization happens inside
 * the partition iterator.
 */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the multimodal schema
    * pattern — binary stays opaque to Catalyst, metadata is columnar). */
  final case class MediaRecord(
      media_id: Long,
      modality: String,            // "image" | "audio" | "video"
      payload: Array[Byte],
      media_meta: MediaMeta)

  final case class MediaMeta(
      byte_len: Long,
      width: Int,                  // px (image/video) or sample-rate/1000 (audio)
      height: Int,
      n_frames: Int)

  /** Deterministic fake decode: dimensions derived from md5(payload).
    * Replace with a real codec call in production. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val hex = java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    MediaMeta(
      byte_len = payload.length.toLong,
      width = Integer.parseInt(hex.substring(0, 2), 16) + 1,
      height = Integer.parseInt(hex.substring(2, 4), 16) + 1,
      n_frames = Integer.parseInt(hex.substring(4, 5), 16) + 1)
  }

  /** Attach decoded metadata to a binary payload table via batched
    * per-partition processing. Iterator-to-iterator: no partition
    * materialization, constant memory.
    *
    * This is the LOAD-BEARING CODEC SEAM, kept deliberately even though
    * the gate queries (q28/q73) use the codegen-friendly
    * [[decodeMetaColumns]]: a real image/audio codec is a JVM library
    * call that cannot be expressed as Catalyst expressions, and this
    * iterator shape (open codec once per partition, stream rows through
    * it) is exactly where it plugs in. Use `decodeMetaColumns` whenever
    * the "decode" is expressible columnarly — it keeps whole-stage
    * codegen intact; fall back to this only for true native decodes. */
  def withDecodedMeta(df: DataFrame, idCol: String, payloadCol: String,
                      modalityCol: String): Dataset[MediaRecord] = {
    val enc = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType), col(modalityCol), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          MediaRecord(r.getLong(0), r.getString(1), payload, decodeStub(payload))
        }
      }(enc)
  }

  /** Column-level variant of the stub decode (pure Catalyst expressions —
    * codegen'd, and expressible in the SQL oracle): same md5-derived fake
    * dimensions as `decodeStub`. */
  def decodeMetaColumns(df: DataFrame, payloadCol: String): DataFrame =
    df
      .withColumn("byte_len", length(col(payloadCol)).cast(LongType))
      .withColumn("width",
        expr(s"cast(conv(substring(md5($payloadCol), 1, 2), 16, 10) as int) + 1"))
      .withColumn("height",
        expr(s"cast(conv(substring(md5($payloadCol), 3, 2), 16, 10) as int) + 1"))
      .withColumn("n_frames",
        expr(s"cast(conv(substring(md5($payloadCol), 5, 1), 16, 10) as int) + 1"))

  /**
   * Perceptual hash (aHash) of a media payload over the stubbed decode:
   * 32 deterministic fake "pixels" (bytes of two salted payload digests
   * — the codec seam; a real decoder substitutes downsampled gray
   * pixels), hash bit i set iff pixel_i exceeds the pixel mean. The
   * mean compare is INTEGER-exact (pixel·32 > Σ pixels — no division),
   * so the hash is engine-portable; near-dup detection composes with
   * [[TextDedup.hammingPairs]] exactly like SimHash (same 32-bit,
   * banded-pigeonhole shape). This is the standard image near-dup
   * pipeline (aHash/pHash family) with the pixel source stubbed.
   *
   * Scale shape: ONE codegen'd projection per row — the payload is
   * read, hashed, and DROPPED before anything wide; only (id, phash)
   * longs ever shuffle.
   */
  def perceptualHash(df: DataFrame, idCol: String,
                     payloadCol: String): DataFrame =
    perceptualHashWide(df, idCol, payloadCol, 32)

  /** `bits`-wide perceptual hash (the [[perceptualHash]] formulas at any
    * width up to 60): more fake "pixels" from more salted digests
    * (pixel i reads byte i%16 of digest `_px{i/16}`), bit i set iff
    * pixel_i·bits > Σ pixels — still integer-exact and engine-portable.
    * The width knob exists for the SAME reason as
    * [[TextDedup.simHashWide]]: a wider hash widens each pigeonhole
    * band slice, so the downstream [[TextDedup.hammingPairs]] join
    * keeps a collision-driven bucket space at corpus scale (q374 gates
    * the 60-bit ⇒ 2¹⁵-buckets-per-band configuration end-to-end; the
    * 32-bit default saturates its 256-value slices on ~10⁵ images).
    * `bits ≤ 60` keeps every `1L << i` term sign-free in BIGINT. */
  def perceptualHashWide(df: DataFrame, idCol: String,
                         payloadCol: String, bits: Int): DataFrame = {
    require(bits >= 4 && bits <= 60, s"bits=$bits out of range (4..60)")
    // Staged projections, NOT one flat expression tree (r18 verdict
    // item 4): inlining the `bits`-term pixel total into every bit term
    // compiles O(bits²) md5 subtrees (60 bits ⇒ ~3600 — a ~10 MiB task
    // binary and a >10 s janino constant that dominated q374/q377
    // regardless of data size). Each stage materializes its value as an
    // attribute the next stage references cheaply; the producers are
    // non-cheap, so CollapseProject provably keeps the stage boundaries
    // and generated code stays LINEAR in bits. Values are arithmetic-
    // identical to the flat form (same md5/conv/substring terms).
    val nDigests = (bits + 15) / 16
    // stage 1: one md5 per 16-pixel digest block, computed once each
    val digests = df.select(col(idCol),
      array((0 until nDigests).map(b =>
        expr(s"md5(concat($payloadCol, cast('_px$b' as binary)))")): _*)
        .as("graft_pxd"))
    // stage 2: pixel array + pixel total over digest-attribute refs
    val pixels = (0 until bits).map { i =>
      val (b, j) = (i / 16, i % 16)
      expr(s"cast(conv(substring(graft_pxd[$b], ${2 * j + 1}, 2), " +
        "16, 10) as bigint)")
    }
    val px = digests.select(col(idCol), array(pixels: _*).as("graft_px"),
      pixels.reduce(_ + _).as("graft_pxs"))
    // stage 3: bit fold — element_at and the total are attribute refs
    val bitTerms = (0 until bits).map { i =>
      when(element_at(col("graft_px"), i + 1) * bits > col("graft_pxs"),
        lit(1L << i)).otherwise(lit(0L))
    }
    px.select(col(idCol), bitTerms.reduce(_ + _).as("phash"))
  }

  /** Frame sampling plan for video-like media: every `stride`-th frame
    * index up to n_frames — an explode over a sequence, the row-generation
    * pattern a real frame extractor plugs into. */
  def sampleFrames(meta: DataFrame, idCol: String, stride: Int): DataFrame =
    meta.select(col(idCol), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize plan: fit (width, height) into a (maxW, maxH) box preserving
    * aspect ratio, never upscaling — the exact-integer metadata arithmetic
    * (floor of the min scale) a real pixel resampler plugs into. A narrow
    * projection; the payload column is untouched and never shuffled. */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"),
      lit(1.0))
    meta
      .withColumn("out_width",
        greatest(floor(col("width") * scale), lit(1L)).cast("int"))
      .withColumn("out_height",
        greatest(floor(col("height") * scale), lit(1L)).cast("int"))
  }

  /**
   * Magic-byte integrity audit: does each binary payload's leading
   * bytes match the signature its CLAIMED type promises (JPEG FF D8 FF,
   * PNG 89 50 4E 47, …)? The corrupt-file / mislabeled-asset detector
   * every media-ingest pipeline runs before spending decode time —
   * truncated downloads, HTML error pages saved as .jpg, and
   * extension-renamed files all fail here (libmagic's check, expressed
   * columnar).
   *
   * `magics` maps claimed type → expected leading bytes. The check is
   * one codegen'd projection: hex(substring(payload)) equality per
   * claimed type — payload bytes never leave the scan task, no UDF.
   * Claimed types absent from `magics` report NULL (unknown), never a
   * false verdict.
   */
  def magicByteAudit(df: DataFrame, idCol: String, payloadCol: String,
                     claimedCol: String,
                     magics: Map[String, Array[Byte]]): DataFrame = {
    require(magics.nonEmpty && magics.size <= 64,
      s"magics size ${magics.size} out of range [1, 64]")
    require(magics.values.forall(m => m.nonEmpty && m.length <= 16),
      "magic signatures must be 1..16 bytes")
    val ok = magics.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(true))) { case (acc, (t, m)) =>
        acc.when(col(claimedCol) === t,
          hex(substring(col(payloadCol), 1, m.length)) ===
            lit(m.map("%02X".format(_)).mkString))
      }
      .otherwise(lit(null).cast("boolean"))
    df.select(col(idCol), col(claimedCol), ok.as("magic_ok"),
      length(col(payloadCol)).cast(LongType).as("byte_len"))
  }
}
