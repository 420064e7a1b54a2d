package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * Decode is REAL for images (ImageHeaders + JDK ImageIO pixel decode →
  * aHash) and for WAV audio ([[AudioWav]], its own operator); only
  * codec-bound media (video, compressed audio) falls back to the
  * deterministic STUB below. Everything around the stub — the schema
  * contract, the binary column representation, batch-shaped per-partition
  * processing, partition sizing — is real and is what matters on a
  * cluster: decode cost dominates, so the operator must (a) never collect
  * bytes to the driver, (b) process whole partitions per task, (c) emit
  * small typed features instead of re-shuffling raw bytes.
  */
object Multimodal {

  /** Typed feature row emitted per media blob. `phash` is the 64-bit
    * perceptual average-hash (0 when no pixel decode happened).
    */
  case class MediaFeature(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      checksum: Long,
      phash: Long)

  /** Media decode. REAL for images: container dimensions from
    * [[ImageHeaders]] (fast header parse), then an actual pixel decode
    * through the JDK's own ImageIO (PNG/JPEG/GIF/BMP ship with the JVM —
    * no external codec) feeding the [[aHash]] perceptual fingerprint.
    * Non-image media (video/audio — codecs genuinely absent here) falls
    * back to the deterministic STUB below; on a cluster that fallback is
    * the only code to replace, the Spark-side plumbing stays identical.
    * A corrupt image keeps its header dimensions with phash 0 (drop-the-
    * feature, never fail the task).
    */
  /** Decompression-bomb guard: a hostile header can declare arbitrary
    * dimensions (e.g. 60000×60000 → ImageIO allocates w*h*4 bytes, and the
    * resulting OutOfMemoryError is an Error — NOT caught by NonFatal — so
    * it would kill the executor). Pixel decode is skipped, keeping header
    * dims with phash 0, whenever the DECLARED pixel count exceeds this.
    */
  private val MaxDecodePixels = 50L * 1000 * 1000

  // Per-blob in-memory streams never benefit from ImageIO's disk cache;
  // avoid the per-call temp-file churn on executors.
  javax.imageio.ImageIO.setUseCache(false)

  /** The one checksum polynomial (base-31 over unsigned bytes) shared by
    * q41 blob checksums and q42 frame checksums.
    */
  private[ops] def crc31(b: Array[Byte], off: Int, len: Int): Long = {
    var crc = 0L
    var i = off
    val end = off + len
    while (i < end) { crc = crc * 31 + (b(i) & 0xff); i += 1 }
    crc
  }

  def decodeMedia(id: Long, declaredType: String, blob: Array[Byte]): MediaFeature = {
    val crc = crc31(blob, 0, blob.length)
    ImageHeaders.parse(blob) match {
      case Some(info) =>
        val ph =
          if (info.width.toLong * info.height > MaxDecodePixels) 0L
          else
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
              if (img == null) 0L else aHash(img)
            } catch { case scala.util.control.NonFatal(_) => 0L }
        MediaFeature(id, s"image/${info.format}", blob.length.toLong,
          info.width, info.height, crc, ph)
      case None => stubDecode(id, declaredType, blob, crc)
    }
  }

  /** 64-bit average-hash perceptual fingerprint: downscale to 8×8
    * grayscale, bit i set iff pixel i is brighter than the mean. Hamming
    * distance over these is the standard large-scale image near-dup
    * signal (cheap, robust to re-encoding and mild edits) — pairs with
    * [[Dedup.bucketPairs]]-style blocking exactly like q32's simhash.
    */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try g.drawImage(img, 0, 0, 8, 8, null) finally g.dispose()
    val gray = new Array[Double](64)
    var sum = 0.0
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      gray(i) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      sum += gray(i)
      i += 1
    }
    val mean = sum / 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (gray(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Near-duplicate pairs over ANY 64-bit media fingerprint (image aHash,
    * audio energy contour): the exact q32 shape applied to media — 16-bit
    * bands of the fingerprint block candidates through the capped
    * [[Dedup.bucketPairs]] (bounded fan-out, nothing quadratic),
    * `bit_count` verifies hamming on candidates only. Input:
    * (doc_id, kind, fp); `kind` is part of the bucket key, so an image
    * and an audio clip never pair even on a fingerprint collision. Rows
    * with fp 0 (stub / corrupt decodes) are excluded.
    *
    * Recall bound: exact-match banding GUARANTEES a shared band only for
    * hamming ≤ 3 (pigeonhole over 4 bands); pairs at 4..maxHamming are
    * found only when their differing bits happen to cluster, so above 3
    * this is approximate blocking (the standard LSH trade), not an exact
    * threshold join.
    */
  def mediaNearDupPairs(feats: DataFrame, maxHamming: Int = 8): DataFrame = {
    // Materialized (q31-sigs precedent): the fingerprint frame feeds THREE
    // consumers (banding + both join-back sides), and upstream is
    // typically a per-blob DECODE pipeline — without the lineage break it
    // would re-decode every image/clip once per consumer (AQE replans
    // consumers independently; ReuseExchange is not reliable here).
    val fp = Materialize(feats.filter(col("fp") =!= 0L)
      .select(col("doc_id"), col("kind"), col("fp")))
    val banded = fp.select(col("doc_id"), col("kind"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "key")))
    val pairs = Dedup.bucketPairs(banded, Seq("kind", "band", "key"), cap = 200)
    pairs
      .join(fp.select(col("doc_id").as("a"), col("kind"), col("fp").as("fa")), "a")
      .join(fp.select(col("doc_id").as("b"), col("fp").as("fb")), "b")
      .select(col("kind"), col("a"), col("b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[mediaNearDupPairs]] over a [[MediaFeature]]-shaped frame's aHash. */
  def imageNearDupPairs(features: DataFrame, maxHamming: Int = 8): DataFrame =
    mediaNearDupPairs(
      features.select(col("doc_id"), lit("image").as("kind"),
        col("phash").as("fp")),
      maxHamming)
      .select(col("a"), col("b"), col("hamming"))

  /** Deterministic 8×8 high-contrast grayscale PNG for planted-near-dup
    * specs and the q58 driver query: the pixel pattern comes from
    * `groupSeed` (splitmix64 per pixel — ~half bright), and ONE
    * salt-chosen pixel is inverted. 8×8 maps one pixel to one [[aHash]]
    * cell and keeps every cell ~105 gray levels from the mean, so two
    * images of the same group are hamming ≤ 2 apart (each one's inverted
    * pixel) and different groups are unrelated — no marginal bits.
    */
  def synthImage(groupSeed: Long, salt: Long): Array[Byte] = {
    def mix(v: Long): Long = {
      var x = v + 0x9E3779B97F4A7C15L
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val v = if ((mix(groupSeed * 64 + i) & 1L) == 1L) 230 else 20
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val p = (mix(salt) & 0x3fL).toInt
    val inv = 250 - (img.getRGB(p % 8, p / 8) & 0xff)
    img.setRGB(p % 8, p / 8, (inv << 16) | (inv << 8) | inv)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** STUB decode: stands in for a full media codec. Deterministic fake —
    * derives "dimensions" from blob bytes.
    */
  private def stubDecode(id: Long, mediaType: String, blob: Array[Byte],
                         crc: Long): MediaFeature =
    MediaFeature(
      doc_id = id,
      media_type = mediaType,
      n_bytes = blob.length.toLong,
      width = math.abs((crc % 1920).toInt) + 1,
      height = math.abs((crc % 1080).toInt) + 1,
      checksum = crc,
      phash = 0L)

  /** One sampled frame of a media blob. */
  case class FrameSample(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Frame extraction, every `FrameStride`-th frame kept. REAL for GIF
    * containers (image-descriptor block walk, [[ImageHeaders.gifFrames]])
    * and for MP4 containers ([[Mp4Boxes.videoFrames]] — the stbl sample
    * tables give every frame's byte range and keyframe flag, and the
    * checksum covers the frame's ACTUAL mdat bytes). Other blobs fall
    * back to STUB fixed-size chunks standing in for codec keyframes.
    * Partitioning and fan-out shape are the contract either way: one task
    * per partition, frames emitted lazily (flatMap), never collected.
    */
  private val FrameBytes  = 32
  private val FrameStride = 4

  def sampleFrames(id: Long, blob: Array[Byte]): Iterator[FrameSample] = {
    val mp4 = Mp4Boxes.videoFrames(blob)
    val gifs = if (mp4.nonEmpty) Seq.empty else ImageHeaders.gifFrames(blob)
    if (mp4.nonEmpty)
      mp4.iterator.collect {
        case f if f.index % FrameStride == 0 =>
          FrameSample(id, f.index, f.size, crc31(blob, f.offset.toInt, f.size))
      }
    else if (gifs.nonEmpty)
      gifs.iterator.collect {
        case f if f.index % FrameStride == 0 =>
          FrameSample(id, f.index, f.dataBytes,
            // geometry-stamped checksum: deterministic, no pixel decode
            ((f.width.toLong * 31 + f.height) * 31 + f.left) * 31 + f.top)
      }
    else blob.grouped(FrameBytes).zipWithIndex.collect {
      case (fb, i) if i % FrameStride == 0 =>
        FrameSample(id, i, fb.length, crc31(fb, 0, fb.length))
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Frame sampling over a "video" blob: per-partition batch iteration,
    // every FrameStride-th frame kept, small typed features out. Docs
    // with even ids synthesize a REAL MP4 container from their text bytes
    // in-pipeline (the sandbox documents table has no media column), so
    // the ISO-BMFF sample-table walk runs inside the driver gate; odd ids
    // stay raw blobs exercising the codec-opaque fallback.
    "q42_frame_sample" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        // a NULL text has no media to sample frames from: drop the row
        // (the flatMap contract), never NPE the task on blob.nonEmpty
        .filter(col("blob").isNotNull)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, blob) =>
          val media =
            if (id % 2 == 0 && blob.nonEmpty)
              Mp4Boxes.writeMp4(blob.grouped(48).toSeq,
                keyframes1 = Some(Seq(1)), chunksOf = 3)
            else blob
          sampleFrames(id, media)
        })
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_bytes"), col("checksum"))
    }),
    // Media near-dup blocking end to end: every doc synthesizes a REAL
    // blob in-pipeline (even ids: PNG through the actual pixel-decode →
    // aHash path; odd ids: WAV through the actual PCM decode → energy
    // fingerprint, with a per-doc GAIN so planted dups are amplitude
    // variants, not byte copies), groups of 16 consecutive ids plant the
    // duplicates, and the banded fingerprints flow through the same
    // capped bucketPairs as q31/q32/q34.
    "q58_media_neardup" -> ((s, dir) => {
      import s.implicits._
      val feats = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.flatMap { id =>
          val gid = id >> 4
          if (id % 2 == 0) {
            val f = decodeMedia(id, "image/png", synthImage(gid, id))
            if (f.phash != 0L) Iterator.single((id, "image", f.phash))
            else Iterator.empty
          } else
            AudioWav.features(id,
              AudioWav.sineWav(seed = gid, gain = 0.3 + (id % 8) * 0.08))
              .iterator.filter(_.afp != 0L).map(f => (id, "audio", f.afp))
        })
        .toDF("doc_id", "kind", "fp")
      mediaNearDupPairs(feats)
    }),
    // documents.text reinterpreted as a media blob (binary col) + metadata
    // struct; features extracted per-partition in batches.
    "q41_multimodal" -> ((s, dir) => {
      import s.implicits._
      val blobs = Tables.documents(s, dir)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("blob"),
          struct(
            lit("image/stub").as("content_type"),
            col("source").as("origin"),
            col("n_chars").as("declared_size")).as("meta"))
      // batch-shaped decode: one task per partition, no driver involvement
      val feats = blobs
        .select(col("doc_id"), col("meta.content_type"), col("blob"))
        // NULL blob ⇒ no feature row (same drop-the-row contract as the
        // corrupt-decode path), never an executor NPE inside crc31
        .filter(col("blob").isNotNull)
        .as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, ct, blob) => decodeMedia(id, ct, blob) })
      feats.toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("checksum"), col("phash"))
    })
  )

  def oracles: Map[String, String] = Map()
}
