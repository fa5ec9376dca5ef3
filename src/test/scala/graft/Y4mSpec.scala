package graft

import graft.multimodal.{Y4m, Y4mDecoder}
import org.scalatest.funsuite.AnyFunSuite

/** The Y4M video codec: round-trips, O(1) frame access, header
  * validation, decoder features. */
class Y4mSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int) = {
    def plane(k: Int) = Array.tabulate(w * h)(i => ((i * k + seed) % 256).toByte)
    (plane(3), plane(5), plane(7))
  }

  test("encode → decode round-trips dims, frame count and every plane") {
    val frames = (0 until 3).map(f => frame(4, 3, f * 11))
    val v = Y4m.decode(Y4m.encode(4, 3, frames))
    assert(v.width == 4 && v.height == 3 && v.nFrames == 3)
    for (f <- 0 until 3) {
      val (y, u, c) = v.frame(f)
      val (wy, wu, wc) = frames(f)
      assert(y.toSeq == wy.toSeq && u.toSeq == wu.toSeq && c.toSeq == wc.toSeq)
    }
  }

  test("header is real YUV4MPEG2 text") {
    val bytes = Y4m.encode(6, 2, Seq(frame(6, 2, 0)))
    val header = new String(bytes.takeWhile(_ != '\n'.toByte), "US-ASCII")
    assert(header == "YUV4MPEG2 W6 H2 F25:1 Ip A1:1 C444")
  }

  test("malformed input is rejected: wrong magic, truncation, frame range") {
    intercept[IllegalArgumentException](Y4m.decode("MPEG4???? W1 H1\n".getBytes))
    val good = Y4m.encode(4, 3, Seq(frame(4, 3, 0), frame(4, 3, 1)))
    intercept[IllegalArgumentException](Y4m.decode(good.take(good.length - 5)))
    intercept[IllegalArgumentException](Y4m.decode(good).frame(2))
  }

  test("Y4mDecoder features carry dims, frame count and first-frame means") {
    val y = Array.fill(8)(100.toByte)
    val u = Array.fill(8)(50.toByte)
    val c = Array.fill(8)(25.toByte)
    val f = new Y4mDecoder().features(Y4m.encode(4, 2, Seq((y, u, c), (y, u, c))))
    assert(f.toSeq == Seq(4.0f, 2.0f, 2.0f, 100.0f, 50.0f, 25.0f, 0.0f, 0.0f))
  }
}
