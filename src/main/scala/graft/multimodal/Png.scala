package graft.multimodal

import java.nio.ByteBuffer

/** Pure-JVM PNG codec (java.util.zip only — no native codecs): the
  * REAL decode path behind [[MediaDecoder]], turning the multimodal
  * binary-column story from plumbing into an operator. The reference
  * has no media handling at all; this covers the brief's multimodal
  * requirement with an honest, testable decoder instead of the
  * hash-stub ([[DecodeStub]] remains for formats without a JVM
  * decoder).
  *
  * Scope: non-interlaced 8-bit PNGs, color types 0 (gray),
  * 2 (RGB), 4 (gray+alpha), 6 (RGBA) — the shapes ML fixture
  * pipelines actually emit. Decode handles ALL five scanline filters
  * (None/Sub/Up/Average/Paeth); the encoder can emit any single
  * filter type per image, which is how PngSpec drives every decode
  * branch through real deflate round-trips.
  */
object Png {

  /** Decoded raster: `pixels` is row-major, `channels` interleaved,
    * one byte per sample. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private val SIG: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Decode-side allocation cap (bytes of raw raster incl. filter
    * bytes) for untrusted binary columns — see the bound in
    * [[decode]]. */
  val MaxRasterBytes: Long = 1L << 30

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(s"unsupported channel count $n")
  }

  /** Encode an 8-bit raster as a valid PNG. `filterType` applies that
    * filter to EVERY scanline (0 = None is the fast path; 1-4 exist
    * so tests can exercise each decode branch through a genuine
    * compressed file). */
  def encode(width: Int, height: Int, pixels: Array[Byte],
             channels: Int = 3, filterType: Int = 0): Array[Byte] = {
    val stride = width * channels
    require(pixels.length == height * stride,
      s"pixel buffer is ${pixels.length} bytes, expected ${height * stride}")
    require(filterType >= 0 && filterType <= 4, s"bad filter type $filterType")
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val rowIn = y * stride
      val rowOut = y * (1 + stride)
      raw(rowOut) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(rowIn + x) & 0xFF
        val left = if (x >= channels) pixels(rowIn + x - channels) & 0xFF else 0
        val up = if (y > 0) pixels(rowIn - stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= channels) pixels(rowIn - stride + x - channels) & 0xFF else 0
        val enc = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(rowOut + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zipped.write(tmp, 0, n)
    }
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(zipped.size() + 64)
    out.write(SIG, 0, SIG.length)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put(colorType(channels).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zipped.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
                         typ: String, data: Array[Byte]): Unit = {
    out.write(ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(tb)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }

  /** Decode a PNG: chunk walk (ancillary chunks skipped), IDAT
    * concatenation, inflate, per-scanline unfilter. Throws
    * IllegalArgumentException on non-PNG bytes or unsupported shapes
    * (callers batching over a mixed corpus sniff the magic first —
    * [[Multimodal.sniffFormat]]). */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes != null && bytes.length > SIG.length + 12 &&
      SIG.indices.forall(i => bytes(i) == SIG(i)), "not a PNG")
    var pos = SIG.length
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = ByteBuffer.wrap(bytes, pos, 4).getInt
      // overflow-safe bound: a hostile length near Int.MaxValue would
      // wrap `pos + 8 + len + 4` negative and slip past a naive check
      require(len >= 0 && len <= bytes.length - pos - 12,
        s"truncated chunk at offset $pos")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      typ match {
        case "IHDR" =>
          // spec: IHDR data is exactly 13 bytes; a short chunk would
          // otherwise surface as BufferUnderflowException below
          // instead of the documented IllegalArgumentException
          require(len == 13, s"bad IHDR length $len (expected 13)")
          val b = ByteBuffer.wrap(bytes, dataOff, len)
          width = b.getInt
          height = b.getInt
          val bitDepth = b.get() & 0xFF
          val ct = b.get() & 0xFF
          b.get() // compression (always 0)
          b.get() // filter method (always 0)
          val interlace = b.get() & 0xFF
          require(bitDepth == 8, s"only 8-bit PNGs supported, got bit depth $bitDepth")
          require(interlace == 0, "interlaced PNGs not supported")
          channels = ct match {
            case 0 => 1
            case 2 => 3
            case 4 => 2
            case 6 => 4
            case other => throw new IllegalArgumentException(
              s"unsupported color type $other (palette PNGs not supported)")
          }
          seenIhdr = true
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk (tEXt, pHYs, ...) — skip
      }
      pos = dataOff + len + 4 // + CRC
    }
    require(seenIhdr, "missing IHDR")
    require(done, "truncated PNG: missing IEND")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    // untrusted-binary allocation cap, checked in LONG arithmetic
    // BEFORE any buffer is sized: a hostile IHDR with width ~2^30
    // would overflow `width * channels` to a negative stride (or
    // allocate gigabytes) without this bound. 1 GiB of raster covers
    // any realistic media row; raise MaxRasterBytes if a corpus
    // legitimately exceeds it.
    // the two-factor product cannot overflow Long (each factor < 2^31),
    // and bounding it BEFORE the ×channels keeps the full expression in
    // range — near-Int.MaxValue dims with channels ≥ 3 would wrap the
    // three-factor product negative and sail past the cap
    require(width.toLong * height <= MaxRasterBytes / channels &&
        width.toLong * height * channels + height <= MaxRasterBytes,
      s"raster ${width}x$height x$channels exceeds the " +
        s"$MaxRasterBytes-byte decode cap for untrusted binary columns")

    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // needsDictionary: FDICT-flagged zlib streams (never valid in
      // PNG) would otherwise return n=0 forever and busy-spin here
      require(!inflater.needsDictionary(),
        "IDAT stream requires a preset dictionary (invalid for PNG)")
      require(n > 0 || !inflater.needsInput(), "truncated IDAT stream")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"IDAT inflated to $off bytes, expected ${raw.length}")

    // unfilter in place into the output raster; predictors reference
    // RECONSTRUCTED bytes (the already-unfiltered neighbors)
    val out = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val filter = raw(y * (1 + stride)) & 0xFF
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val left = if (x >= channels) out(rowOut + x - channels) & 0xFF else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= channels) out(rowOut - stride + x - channels) & 0xFF else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(
            s"bad scanline filter $other at row $y")
        }
        out(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, channels, out)
  }

  /** PNG's Paeth predictor: the neighbor closest to left+up−upleft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }
}

/** Shared decoded-raster feature layout for the REAL decoders:
  * [width, height, channels, mean(c0..c3) (0-padded), overall mean] —
  * one implementation, so "drop-in swappable" decoders cannot drift
  * apart (ImageIoSpec pins their equality on shared bytes). */
private[multimodal] object RasterFeatures {
  val dim = 8
  def of(img: Png.Image): Array[Float] = {
    val ch = img.channels
    val n = img.width.toLong * img.height
    val sums = new Array[Long](ch)
    var total = 0L
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i) & 0xFF
      sums(i % ch) += v
      total += v
      i += 1
    }
    val out = new Array[Float](dim)
    out(0) = img.width.toFloat
    out(1) = img.height.toFloat
    out(2) = ch.toFloat
    var c = 0
    while (c < ch && c < 4) { out(3 + c) = (sums(c).toDouble / n).toFloat; c += 1 }
    out(7) = (total.toDouble / (n * ch)).toFloat
    out
  }
}

/** The REAL [[MediaDecoder]] over the hand-rolled codec: decodes PNG
  * pixels and emits the shared [[RasterFeatures]] layout — swap for
  * [[DecodeStub]] in [[MediaFeatures.extract]] and the same
  * distributed plumbing now computes real pixel statistics. */
final class PngDecoder extends MediaDecoder {
  val dim = RasterFeatures.dim
  def features(bytes: Array[Byte]): Array[Float] =
    RasterFeatures.of(Png.decode(bytes))
}
