package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Second real decode path: the JDK's built-in `javax.imageio`
  * readers (PNG, JPEG, BMP, GIF — all in the stock `java.desktop`
  * module, headless-safe, no external dependency). Complements the
  * hand-rolled [[Png]] codec: [[Png]] proves the byte-level decode
  * story; this adapter proves format DISPATCH over a mixed-container
  * corpus — one decoder object handles whatever the magic-byte sniff
  * routed to it. BMP is lossless, so BMP-encoded fixtures round-trip
  * exactly and sit under the oracle gate next to PNG (q90); JPEG is
  * lossy by design and therefore spec-gated (bounded reconstruction
  * error), never hash-compared.
  */
object ImageIoCodec {

  /** Lossless BMP encode of an RGB raster (fixture side of q90). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encode(width, height, rgb, "bmp")

  /** Lossy JPEG encode (spec fixtures only — never oracle-compared). */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encode(width, height, rgb, "jpg")

  private def encode(width: Int, height: Int, rgb: Array[Byte],
                     format: String): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"pixel buffer is ${rgb.length} bytes, expected ${width * height * 3}")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var i = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y,
          ((rgb(i) & 0xFF) << 16) | ((rgb(i + 1) & 0xFF) << 8) | (rgb(i + 2) & 0xFF))
        i += 3
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no ImageIO writer for format '$format'")
    out.toByteArray
  }

  /** Decode any ImageIO-supported container to an interleaved-RGB
    * [[Png.Image]] (3 channels, row-major) — the common raster shape
    * both decode paths emit, so downstream pixel statistics are
    * format-agnostic. */
  def decodeRgb(bytes: Array[Byte]): Png.Image = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "no ImageIO reader recognized the content")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        out(i) = ((p >> 16) & 0xFF).toByte
        out(i + 1) = ((p >> 8) & 0xFF).toByte
        out(i + 2) = (p & 0xFF).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    Png.Image(w, h, 3, out)
  }
}

/** [[MediaDecoder]] over the JDK readers — the SAME
  * [[RasterFeatures]] layout as [[PngDecoder]], so the two real
  * decoders are drop-in swappable in [[MediaFeatures.extract]]. */
final class ImageIoDecoder extends MediaDecoder {
  val dim = RasterFeatures.dim
  def features(bytes: Array[Byte]): Array[Float] =
    RasterFeatures.of(ImageIoCodec.decodeRgb(bytes))
}
