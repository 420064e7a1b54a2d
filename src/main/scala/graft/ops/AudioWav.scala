package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL audio decode for WAV/RIFF containers — the audio analogue of round
  * 4's image work: no external codec needed, the container format is a
  * bounds-checked chunk walk and PCM is arithmetic. Anything that is not a
  * parseable PCM WAV simply yields no feature row (drop-the-feature,
  * never fail the task — the ImageHeaders contract).
  *
  * Features per blob: sample rate / channels / duration plus the standard
  * cheap audio signals (RMS energy, zero-crossing count) and `afp`, a
  * 64-bit energy-contour fingerprint (bit i = window i louder than window
  * i-1). `afp` is amplitude-invariant and pairs with the same 16-bit-band
  * blocking as q32's simhash and the image aHash —
  * [[Multimodal.imageNearDupPairs]] accepts it as the `phash` column
  * unchanged.
  *
  * Scale posture: decode runs per-partition inside `mapPartitions`, blobs
  * never leave their input partition, only small typed features come out.
  */
object AudioWav {

  final case class WavInfo(audioFormat: Int, channels: Int, sampleRate: Int,
                           bitsPerSample: Int, dataOffset: Int, dataBytes: Int)

  final case class AudioFeature(doc_id: Long, sample_rate: Int, channels: Int,
                                duration_ms: Long, rms: Double,
                                zero_cross: Long, afp: Long)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  /** RIFF/WAVE chunk walk. Returns None for anything malformed: wrong
    * magic, truncated chunks, unsupported encoding (only PCM 8/16-bit),
    * nonsensical fmt values. Never throws on arbitrary bytes.
    */
  def parse(blob: Array[Byte]): Option[WavInfo] = {
    if (blob.length < 44) return None
    if (!(blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' && blob(3) == 'F' &&
          blob(8) == 'W' && blob(9) == 'A' && blob(10) == 'V' && blob(11) == 'E'))
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= blob.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(blob, off + 4)
      // Long arithmetic: a hostile size near Int.MaxValue overflows the
      // Int sum to negative and would pass the bound check
      if (size < 0 || off + 8L + size > blob.length) return None
      val isFmt = blob(off) == 'f' && blob(off + 1) == 'm' &&
        blob(off + 2) == 't' && blob(off + 3) == ' '
      val isData = blob(off) == 'd' && blob(off + 1) == 'a' &&
        blob(off + 2) == 't' && blob(off + 3) == 'a'
      if (isFmt && size >= 16)
        fmt = Some((le16(blob, off + 8), le16(blob, off + 10),
          le32(blob, off + 12), le16(blob, off + 22)))
      else if (isData)
        data = Some((off + 8, size))
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size + (size & 1)
    }
    for {
      (audioFormat, channels, rate, bits) <- fmt
      (dataOff, dataBytes) <- data
      if audioFormat == 1 && (bits == 8 || bits == 16) &&
        channels >= 1 && channels <= 8 &&
        rate >= 1000 && rate <= 384000
    } yield WavInfo(audioFormat, channels, rate, bits, dataOff, dataBytes)
  }

  /** Mono-mixed samples normalized to [-1, 1]. 16-bit PCM is signed LE;
    * 8-bit PCM is unsigned biased at 128 (the WAV convention).
    */
  def samples(blob: Array[Byte], info: WavInfo): Array[Double] = {
    val bytesPerSample = info.bitsPerSample / 8
    val frameBytes = bytesPerSample * info.channels
    val nFrames = info.dataBytes / frameBytes
    val out = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0.0
      var c = 0
      while (c < info.channels) {
        val o = info.dataOffset + f * frameBytes + c * bytesPerSample
        acc += (if (info.bitsPerSample == 16) le16(blob, o).toShort / 32768.0
                else ((blob(o) & 0xff) - 128) / 128.0)
        c += 1
      }
      out(f) = acc / info.channels
      f += 1
    }
    out
  }

  /** 64-bit energy-contour fingerprint: 64 equal windows; bit 0 = first
    * window above the mean energy, bit i (i≥1) = window i louder than
    * window i-1. Scaling every sample by a constant scales every energy by
    * its square, so the fingerprint is amplitude-invariant. 0 when the
    * clip is shorter than 64 samples (no contour to speak of).
    */
  def fingerprint(s: Array[Double]): Long = {
    if (s.length < 64) return 0L
    val win = s.length / 64
    val e = new Array[Double](64)
    var i = 0
    while (i < 64) {
      var acc = 0.0
      var j = i * win
      val end = j + win
      while (j < end) { acc += s(j) * s(j); j += 1 }
      e(i) = acc
      i += 1
    }
    val mean = e.sum / 64.0
    var h = if (e(0) > mean) 1L else 0L
    i = 1
    while (i < 64) { if (e(i) > e(i - 1)) h |= 1L << i; i += 1 }
    h
  }

  /** Full per-blob feature extraction; None for non-WAV bytes. */
  def features(id: Long, blob: Array[Byte]): Option[AudioFeature] =
    parse(blob).map { info =>
      val s = samples(blob, info)
      var sq = 0.0
      var zc = 0L
      var lastSign = 0 // sign of the last NONZERO sample: a sample that
      var i = 0        // quantizes to exactly 0 must not hide a crossing
      while (i < s.length) {
        sq += s(i) * s(i)
        val sign = java.lang.Double.compare(s(i), 0.0).sign
        if (sign != 0) {
          if (lastSign != 0 && sign != lastSign) zc += 1
          lastSign = sign
        }
        i += 1
      }
      val rms = if (s.length == 0) 0.0 else math.sqrt(sq / s.length)
      val durMs = if (info.sampleRate == 0) 0L
                  else math.round(1000.0 * s.length / info.sampleRate)
      AudioFeature(id, info.sampleRate, info.channels, durMs, rms, zc,
        fingerprint(s))
    }

  /** PCM-16 mono WAV encoder for synthesis and tests: a sine carrier with
    * a seeded piecewise amplitude envelope (a steady tone has a flat
    * energy contour, which makes the fingerprint degenerate — real audio
    * varies, so the synthetic blobs must too).
    */
  def sineWav(seed: Long, ms: Int = 80, rate: Int = 8000,
              freqHz: Double = 440.0, gain: Double = 1.0): Array[Byte] = {
    val n = rate * ms / 1000
    val segments = 16
    val segLen = math.max(1, n / segments)
    // splitmix64-finalized envelope in [0.2, 1.0] per segment. A plain
    // LCG of (seed, seg) is a mod-1 sawtooth whose up/down CONTOUR is
    // nearly seed-independent — every seed then fingerprints alike.
    def env(seg: Int): Double = {
      var x = seed + 0x9E3779B97F4A7C15L * (seg + 1)
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31
      0.2 + 0.8 * (((x >>> 16) & 0xffff).toDouble / 65535.0)
    }
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = env(math.min(segments - 1, i / segLen)) * gain
      val v = math.max(-1.0, math.min(1.0,
        a * math.sin(2 * math.Pi * freqHz * i / rate)))
      val s = math.round(v * 32767).toInt
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + data.length); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(rate)
    w32(rate * 2); w16(2); w16(16)
    out.write("data".getBytes); w32(data.length); out.write(data, 0, data.length)
    out.toByteArray
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Audio feature extraction end to end. The sandbox's documents table
    // has no audio column, so each doc deterministically synthesizes its
    // WAV blob in-pipeline (tone + envelope derived from doc fields) and
    // the REAL decoder runs on real WAV bytes — on a cluster only the
    // blob column changes. Non-decodable blobs drop out (flatMap), they
    // never fail the task.
    "q51_audio_features" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.flatMap { case (id, nChars) =>
          val blob = sineWav(seed = id, freqHz = 200.0 + (id % 20) * 40.0,
            gain = 0.25 + (nChars % 100) / 200.0)
          features(id, blob)
        })
        .toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("duration_ms"), col("rms"), col("zero_cross"), col("afp"))
    }))

  // Feature values depend on synthesized PCM waveforms — not expressible
  // in DuckDB SQL; rows-only + AudioWavSpec (decode math pinned against
  // closed-form sine expectations).
  def oracles: Map[String, String] = Map()
}
