package graft

import graft.multimodal.{MediaFeatures, Multimodal, Png, PngDecoder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM PNG codec: hand-computed pixel checks, every decode
  * filter branch through real deflate round-trips, unsupported-shape
  * rejection, and the MediaDecoder integration over Spark. */
class PngSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, ch: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + 7) % 256).toByte; i += 1 }
    px
  }

  test("decode reverses encode for a hand-computed 2x2 RGB image") {
    // pixels laid out row-major RGB: (r g b) = (10 20 30) (40 50 60)
    //                                          (70 80 90) (100 110 120)
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val img = Png.decode(Png.encode(2, 2, px))
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(img.pixels.toSeq == px.toSeq)
    // spot-check: bottom-right pixel green channel is 110
    assert((img.pixels(1 * 6 + 1 * 3 + 1) & 0xFF) == 110)
  }

  test("encoded bytes are a real PNG: signature sniffs as png") {
    val bytes = Png.encode(4, 3, gradient(4, 3, 3))
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    // the relational magic-byte sniff agrees
    val spark = SparkSpec.spark
    import spark.implicits._
    val fmt = Seq(bytes).toDF("media")
      .select(Multimodal.sniffFormat(col("media"))).as[String].head()
    assert(fmt == "png")
  }

  test("all five scanline filters decode back to the original pixels") {
    val px = gradient(7, 5, 3) // odd width exercises partial predictors
    for (f <- 0 to 4) {
      val img = Png.decode(Png.encode(7, 5, px, channels = 3, filterType = f))
      assert(img.pixels.toSeq == px.toSeq, s"filter $f round-trip failed")
    }
  }

  test("gray, gray+alpha and RGBA color types round-trip") {
    for (ch <- Seq(1, 2, 4)) {
      val px = gradient(5, 4, ch)
      val img = Png.decode(Png.encode(5, 4, px, channels = ch, filterType = 4))
      assert(img.channels == ch && img.width == 5 && img.height == 4)
      assert(img.pixels.toSeq == px.toSeq, s"$ch-channel round-trip failed")
    }
  }

  test("ancillary chunks (tEXt) are skipped, pixels unaffected") {
    val px = gradient(3, 3, 3)
    val bytes = Png.encode(3, 3, px)
    // splice a tEXt chunk (with a correct CRC) between IHDR and IDAT:
    // signature(8) + IHDR chunk (8 + 13 + 4) = offset 33
    val text = "Comment\u0000hand-built".getBytes("ISO-8859-1")
    val chunk = new java.io.ByteArrayOutputStream()
    chunk.write(java.nio.ByteBuffer.allocate(4).putInt(text.length).array())
    val typ = "tEXt".getBytes("US-ASCII")
    chunk.write(typ)
    chunk.write(text)
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(text)
    chunk.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    val spliced = bytes.take(33) ++ chunk.toByteArray ++ bytes.drop(33)
    val img = Png.decode(spliced)
    assert(img.width == 3 && img.height == 3)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("non-PNG and truncated input are rejected, not mis-decoded") {
    intercept[IllegalArgumentException](Png.decode("not a png at all".getBytes))
    val good = Png.encode(4, 4, gradient(4, 4, 3))
    intercept[IllegalArgumentException](Png.decode(good.take(good.length - 8)))
  }

  test("hostile IHDR is rejected before any allocation (untrusted binary)") {
    val good = Png.encode(4, 4, gradient(4, 4, 3))
    // IHDR chunk: signature(8) + len(4)@8 + type(4)@12 + width(4)@16
    // + height(4)@20. Our decoder skips CRCs, so byte patches reach it.
    val shortIhdr = good.clone()
    shortIhdr(11) = 12 // declared IHDR length 12 (must be 13)
    val e1 = intercept[IllegalArgumentException](Png.decode(shortIhdr))
    assert(e1.getMessage.contains("IHDR"))
    val hugeWidth = good.clone()
    hugeWidth(16) = 0x40; hugeWidth(17) = 0; hugeWidth(18) = 0; hugeWidth(19) = 0
    val e2 = intercept[IllegalArgumentException](Png.decode(hugeWidth))
    assert(e2.getMessage.contains("decode cap"),
      s"expected the raster cap to fire, got: ${e2.getMessage}")
  }

  test("PngDecoder features carry dims and exact channel means") {
    // 1x2 RGB: (0 100 200), (50 150 250) -> means (25, 125, 225)
    val px = Array[Byte](0, 100, 200.toByte, 50, 150.toByte, 250.toByte)
    val f = new PngDecoder().features(Png.encode(2, 1, px))
    assert(f(0) == 2.0f && f(1) == 1.0f && f(2) == 3.0f)
    assert(f(3) == 25.0f && f(4) == 125.0f && f(5) == 225.0f)
    assert(f(7) == 125.0f) // overall mean
  }

  test("MediaFeatures.extract with PngDecoder decodes distributed") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rows = (0L until 8L).map { id =>
      val (w, h, px) = PipelineQueries.pngPattern(id)
      (id, Png.encode(w, h, px), w)
    }
    val df = rows.map { case (id, b, _) => (id, b) }.toDF("media_id", "media")
    val feats = MediaFeatures.extract(df, "media_id", "media", new PngDecoder())
      .select(col("media_id"), element_at(col("features"), 1).as("w"))
      .as[(Long, Float)].collect().toMap
    rows.foreach { case (id, _, w) => assert(feats(id) == w.toFloat) }
  }
}
