package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF/PCM) codec — the audio leg of the multimodal
  * column story, next to [[Png]]/[[ImageIoCodec]] for images. Scope:
  * 16-bit little-endian PCM, any sample rate and channel count — the
  * shape speech/audio training corpora actually store. Encode exists
  * for fixtures; decode parses the RIFF chunk list (fmt + data,
  * ancillary chunks like LIST/fact skipped), so real-world files with
  * metadata chunks decode too.
  *
  * PCM samples are integers, so every downstream statistic is
  * integer-exact — q91's waveform fixtures are generated from pure
  * integer arithmetic and their sample sums replay bit-for-bit in the
  * DuckDB oracle, the same discipline as q85/q90's pixel sums.
  */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int,
                         samples: Array[Short])

  /** Encode PCM16 samples as a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, channels: Int,
             samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0,
      s"bad format: rate=$sampleRate channels=$channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not divide into $channels channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a WAV: walk the RIFF chunks, require PCM16, return the
    * interleaved samples. Throws IllegalArgumentException on
    * non-WAV/unsupported content (magic-sniff first in mixed
    * corpora — RIFF maps to [[Multimodal.sniffFormat]]'s "riff"). */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes != null && bytes.length >= 44, "too short for a WAV")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4)
      buf.get(b)
      new String(b, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF container")
    buf.getInt // riff size
    require(tag4() == "WAVE", "RIFF container is not WAVE")
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtSeen = false
    var samples: Array[Short] = null
    while (samples == null && buf.remaining() >= 8) {
      val tag = tag4()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"truncated '$tag' chunk")
      tag match {
        case "fmt " =>
          // the 6 fields below span 16 bytes; a shorter declared
          // chunk would misparse the next chunk's bytes as format
          // fields instead of failing cleanly
          require(len >= 16, s"fmt chunk too short: $len bytes")
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort & 0xFFFF
          channels = buf.getShort & 0xFFFF
          sampleRate = buf.getInt
          buf.getInt   // byte rate
          buf.getShort // block align
          bits = buf.getShort & 0xFFFF
          require(audioFormat == 1, s"only PCM supported, got format $audioFormat")
          require(bits == 16, s"only 16-bit supported, got $bits")
          fmtSeen = true
          buf.position(fmtEnd)
        case "data" =>
          require(fmtSeen, "data chunk before fmt chunk")
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => // ancillary chunk (LIST, fact, ...) — skip
          buf.position(buf.position() + len + (len & 1)) // chunks are word-aligned
      }
    }
    require(samples != null, "missing data chunk")
    Audio(sampleRate, channels, samples)
  }
}

/** [[MediaDecoder]] over WAV: [rate, channels, n_frames, mean |s|,
  * RMS, min, max, 0] — the audio twin of the image decoders. */
final class WavDecoder extends MediaDecoder {
  val dim = 8
  def features(bytes: Array[Byte]): Array[Float] = {
    val a = Wav.decode(bytes)
    var sumAbs = 0L
    var sumSq = 0.0
    var mn = Int.MaxValue
    var mx = Int.MinValue
    a.samples.foreach { s =>
      sumAbs += math.abs(s.toInt)
      sumSq += s.toDouble * s
      if (s < mn) mn = s
      if (s > mx) mx = s
    }
    val n = math.max(a.samples.length, 1)
    Array(a.sampleRate.toFloat, a.channels.toFloat,
      (a.samples.length / a.channels).toFloat,
      (sumAbs.toDouble / n).toFloat, math.sqrt(sumSq / n).toFloat,
      mn.toFloat, mx.toFloat, 0.0f)
  }
}
