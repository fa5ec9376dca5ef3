package graft

import graft.multimodal.{ImageIoCodec, ImageIoDecoder, Multimodal, Png}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JDK-reader decode path: lossless BMP round-trips, JPEG decodes
  * within a bounded error (lossy by design), and the hand-rolled PNG
  * encoder's output is readable by the JDK's independent PNG reader
  * with identical pixels. */
class ImageIoSpec extends AnyFunSuite {

  private def pattern(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = ((i * 37 + 11) % 256).toByte; i += 1 }
    px
  }

  test("BMP encode → decode is lossless") {
    val px = pattern(9, 7)
    val img = ImageIoCodec.decodeRgb(ImageIoCodec.encodeBmp(9, 7, px))
    assert(img.width == 9 && img.height == 7 && img.channels == 3)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("BMP bytes sniff as bmp") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val bytes = ImageIoCodec.encodeBmp(4, 4, pattern(4, 4))
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val fmt = Seq(bytes).toDF("media")
      .select(Multimodal.sniffFormat(col("media"))).as[String].head()
    assert(fmt == "bmp")
  }

  test("cross-codec: the hand-rolled PNG encoder is readable by the JDK reader, pixels identical") {
    val px = pattern(6, 5)
    val ours = Png.encode(6, 5, px)
    val viaJdk = ImageIoCodec.decodeRgb(ours)
    assert(viaJdk.pixels.toSeq == px.toSeq)
    // and the two decoders agree on the same bytes
    assert(viaJdk.pixels.toSeq == Png.decode(ours).pixels.toSeq)
  }

  test("JPEG decodes with bounded reconstruction error (lossy, spec-gated)") {
    // a smooth gradient compresses well; error should be small
    val w = 16; val h = 16
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = ((x * 8 + y * 4 + c * 2) % 256).toByte
    val img = ImageIoCodec.decodeRgb(ImageIoCodec.encodeJpeg(w, h, px))
    assert(img.width == w && img.height == h)
    val mae = px.indices.map(i =>
      math.abs((px(i) & 0xFF) - (img.pixels(i) & 0xFF))).sum.toDouble / px.length
    assert(mae < 16.0, s"mean abs error $mae too large for a smooth gradient")
  }

  test("ImageIoDecoder features match PngDecoder's on the same PNG") {
    val px = pattern(5, 4)
    val bytes = Png.encode(5, 4, px)
    val a = new ImageIoDecoder().features(bytes).toSeq
    val b = new graft.multimodal.PngDecoder().features(bytes).toSeq
    assert(a == b)
  }

  test("garbage bytes are rejected") {
    intercept[IllegalArgumentException](
      ImageIoCodec.decodeRgb("definitely not an image".getBytes))
  }
}
