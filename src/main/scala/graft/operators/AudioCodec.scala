package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** REAL audio codec for the uncompressed format that needs no native
  * library — RIFF/WAVE with 16-bit little-endian PCM (the interchange
  * format every audio toolchain reads). The audio sibling of
  * [[ImageCodec]]: it upgrades the multimodal column's AUDIO decode tier
  * from "stub" to "real decode for container-safe PCM, stub only for
  * codec formats (MP3/FLAC/Opus stay the declared container
  * limitation)". Pure JVM, executor-safe, no shared state — usable
  * straight inside the batched `mapPartitions` pipeline
  * ([[Multimodal.decodeBatched]]'s sanctioned tier).
  */
object AudioCodec {

  /** Interleaved 16-bit PCM. `samples.length` counts individual channel
    * samples (frames × channels). */
  final case class RawAudio(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    require(channels >= 1, "at least one channel")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def readLe16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  /** Canonical 44-byte-header WAV: RIFF + `fmt ` (PCM, format tag 1) +
    * `data`. */
  def encodeWav(a: RawAudio): Array[Byte] = {
    val dataBytes = a.samples.length * 2
    val byteRate = a.sampleRate * a.channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
    out.put("RIFF".getBytes(US_ASCII)).put(le32(36 + dataBytes))
      .put("WAVE".getBytes(US_ASCII))
      .put("fmt ".getBytes(US_ASCII)).put(le32(16))
      .put(le16(1)) // PCM
      .put(le16(a.channels)).put(le32(a.sampleRate)).put(le32(byteRate))
      .put(le16(a.channels * 2)) // block align
      .put(le16(16)) // bits per sample
      .put("data".getBytes(US_ASCII)).put(le32(dataBytes))
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      out.put((s & 0xff).toByte).put(((s >> 8) & 0xff).toByte)
      i += 1
    }
    out.array()
  }

  /** Strict RIFF walker: verifies the RIFF/WAVE magic, then iterates the
    * chunk list (chunks pad to even length per the RIFF grammar — a
    * parser that assumes the 44-byte canonical layout breaks on files
    * with LIST/INFO chunks). Requires one PCM16 `fmt ` chunk before the
    * `data` chunk; fails loud on anything else — a malformed blob must
    * never decode quietly. */
  def decodeWav(bytes: Array[Byte]): RawAudio = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, US_ASCII) == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val cid = new String(bytes, pos, 4, US_ASCII)
      val sz = readLe32(bytes, pos + 4)
      require(sz >= 0 && pos + 8 + sz <= bytes.length,
        s"chunk $cid overruns the buffer")
      cid match {
        case "fmt " =>
          require(sz >= 16, "fmt chunk too short")
          require(readLe16(bytes, pos + 8) == 1,
            "only PCM (format tag 1) supported")
          channels = readLe16(bytes, pos + 10)
          sampleRate = readLe32(bytes, pos + 12)
          require(readLe16(bytes, pos + 22) == 16,
            "only 16-bit PCM supported")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(sz % 2 == 0, "odd PCM16 data size")
          val n = sz / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = readLe16(bytes, pos + 8 + 2 * i).toShort
            i += 1
          }
        case _ => () // LIST/INFO/fact chunks skip
      }
      pos += 8 + sz + (sz & 1) // RIFF pads chunks to even offsets
    }
    require(samples != null, "no data chunk")
    RawAudio(sampleRate, channels, samples)
  }

  /** Exact per-frame features over fixed-width windows (mono): energy
    * Σs² (BIGINT-exact), zero crossings (sign-change count within the
    * frame), and the peak |s| — the integer feature set a VAD /
    * silence-trim pipeline computes, no float drift anywhere. Frames
    * beyond the last full window drop (no-new-content tail rule, as in
    * chunking). */
  def frameFeatures(a: RawAudio, frame: Int): Seq[(Int, Long, Int, Int)] = {
    require(a.channels == 1, "frame features expect mono input")
    (0 until a.samples.length / frame).map { f =>
      var energy = 0L
      var crossings = 0
      var peak = 0
      var i = f * frame
      val end = i + frame
      while (i < end) {
        val s = a.samples(i).toInt
        energy += s.toLong * s
        if (i > f * frame) {
          val prev = a.samples(i - 1).toInt
          if ((prev < 0 && s >= 0) || (prev >= 0 && s < 0)) crossings += 1
        }
        if (math.abs(s) > peak) peak = math.abs(s)
        i += 1
      }
      (f, energy, crossings, peak)
    }
  }
}
