package graft

import graft.multimodal.{Wav, WavDecoder}
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM WAV codec: hand-computed round-trips, ancillary-chunk
  * tolerance, unsupported-shape rejection, decoder features. */
class WavSpec extends AnyFunSuite {

  private val samples = Array[Short](0, 1000, -1000, 32767, -32768, 42)

  test("encode → decode round-trips samples, rate and channels") {
    val a = Wav.decode(Wav.encode(16000, 2, samples))
    assert(a.sampleRate == 16000 && a.channels == 2)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("ancillary LIST chunk between fmt and data is skipped") {
    val bytes = Wav.encode(8000, 1, samples)
    // splice a LIST chunk after the fmt chunk (offset 12 + 24 = 36)
    val info = "INFOengine".getBytes("US-ASCII")
    val chunk = java.nio.ByteBuffer.allocate(8 + info.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(info.length).put(info)
    val spliced = bytes.take(36) ++ chunk.array() ++ bytes.drop(36)
    // RIFF size field is now stale, which decode ignores (chunk walk)
    val a = Wav.decode(spliced)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("non-WAV, truncated and non-PCM content are rejected") {
    intercept[IllegalArgumentException](Wav.decode("not audio at all".getBytes))
    val good = Wav.encode(8000, 1, samples)
    intercept[IllegalArgumentException](Wav.decode(good.take(good.length - 4)))
    // flip the audio-format field to 3 (IEEE float) — unsupported
    val bad = good.clone()
    bad(20) = 3
    intercept[IllegalArgumentException](Wav.decode(bad))
  }

  test("WavDecoder features carry rate, frames and exact amplitude stats") {
    val f = new WavDecoder().features(Wav.encode(8000, 1,
      Array[Short](100, -200, 300)))
    assert(f(0) == 8000.0f && f(1) == 1.0f && f(2) == 3.0f)
    assert(f(3) == 200.0f) // mean |s|
    assert(f(5) == -200.0f && f(6) == 300.0f)
  }
}
