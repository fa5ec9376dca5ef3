package graft.multimodal

/** Pure-JVM Y4M (YUV4MPEG2) codec — the VIDEO leg of the multimodal
  * column story. Y4M is the standard uncompressed interchange format
  * of the video toolchain (ffmpeg/x264/mpv pipe it): a text header
  * (`YUV4MPEG2 W.. H.. F.. C444`), then `FRAME` markers each followed
  * by raw Y, U, V planes. Codec-free by design, which makes it the
  * honest exact-decode video container for this environment (the JDK
  * ships no video codecs, and its GIF writer is not even lossless) —
  * and a real format a production pipeline genuinely stores
  * intermediates in.
  *
  * Scope: C444 (one byte per plane per pixel, no chroma subsampling),
  * any frame count. Frame access is O(1) — header + fixed frame
  * stride — so [[Multimodal.sampleFrames]]'s (id, frame_idx) plan
  * rows decode ONLY their frame, never the whole clip (q92). Frame
  * bytes are integers, so per-frame statistics replay exactly in the
  * oracle, like q85/q90/q91.
  */
object Y4m {

  final case class Video(width: Int, height: Int, nFrames: Int,
                         bytes: Array[Byte], dataOff: Int) {
    private val planeSize = width * height
    private val frameStride = 6 + 3 * planeSize // "FRAME\n" + Y U V

    /** The i-th frame's Y, U, V planes (each width×height bytes). */
    def frame(i: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
      require(i >= 0 && i < nFrames, s"frame $i out of 0..${nFrames - 1}")
      val base = dataOff + i.toLong * frameStride
      val marker = new String(bytes, base.toInt, 5, "US-ASCII")
      require(marker == "FRAME", s"bad frame marker at offset $base")
      val p = base.toInt + 6
      (java.util.Arrays.copyOfRange(bytes, p, p + planeSize),
        java.util.Arrays.copyOfRange(bytes, p + planeSize, p + 2 * planeSize),
        java.util.Arrays.copyOfRange(bytes, p + 2 * planeSize, p + 3 * planeSize))
    }
  }

  /** Encode frames (each (y, u, v) planes of width×height bytes). */
  def encode(width: Int, height: Int,
             frames: Seq[(Array[Byte], Array[Byte], Array[Byte])]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val planeSize = width * height
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (6 + 3 * planeSize))
    out.write(header, 0, header.length)
    frames.foreach { case (y, u, v) =>
      Seq(y, u, v).foreach(p => require(p.length == planeSize,
        s"plane is ${p.length} bytes, expected $planeSize"))
      out.write("FRAME\n".getBytes("US-ASCII"), 0, 6)
      out.write(y, 0, planeSize)
      out.write(u, 0, planeSize)
      out.write(v, 0, planeSize)
    }
    out.toByteArray
  }

  /** Parse the stream header and index the frames. */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes != null && bytes.length > 10 &&
      new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2", "not a Y4M stream")
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "unterminated Y4M header")
    val header = new String(bytes, 0, nl, "US-ASCII")
    val params = header.split(' ').drop(1)
    def param(prefix: Char): Option[String] =
      params.find(p => p.nonEmpty && p.head == prefix).map(_.tail)
    val width = param('W').map(_.toInt).getOrElse(
      throw new IllegalArgumentException("Y4M header missing W"))
    val height = param('H').map(_.toInt).getOrElse(
      throw new IllegalArgumentException("Y4M header missing H"))
    val colorspace = param('C').getOrElse("420")
    require(colorspace == "444", s"only C444 supported, got C$colorspace")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val frameStride = 6L + 3L * width * height
    val dataLen = bytes.length - (nl + 1)
    require(dataLen % frameStride == 0,
      s"truncated Y4M: $dataLen bytes is not a whole number of frames")
    Video(width, height, (dataLen / frameStride).toInt, bytes, nl + 1)
  }
}

/** [[MediaDecoder]] over Y4M: [w, h, n_frames, mean Y/U/V of frame 0,
  * 0] — bounded features from the FIRST frame (thumbnail semantics),
  * so feature cost is one frame regardless of clip length. */
final class Y4mDecoder extends MediaDecoder {
  val dim = 8
  def features(bytes: Array[Byte]): Array[Float] = {
    val v = Y4m.decode(bytes)
    val (y, u, c) = v.frame(0)
    def mean(p: Array[Byte]): Float = {
      var s = 0L
      p.foreach(b => s += (b & 0xFF))
      (s.toDouble / p.length).toFloat
    }
    Array(v.width.toFloat, v.height.toFloat, v.nFrames.toFloat,
      mean(y), mean(u), mean(c), 0.0f, 0.0f)
  }
}
