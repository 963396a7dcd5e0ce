package graft.multimodal

/** Real, dependency-free media codecs.
  *
  * This is the substance behind Multimodal's decode/resize/frame-sample
  * surface. Two layers:
  *   - pure byte parsing for formats that are plain header+array layouts:
  *     BMP (24bpp uncompressed) and WAV (PCM16);
  *   - the JDK's `javax.imageio` (part of every standard JDK — no extra
  *     dependency) for JPEG/PNG via [[decodeImageIO]].
  * Only formats that genuinely need an absent codec (video: MP4) remain
  * declared byte-level stubs; `sniff` recognizes magic bytes so the
  * dispatch is honest about which path ran.
  *
  * Everything here is driver-free per-partition code: codecs are static
  * pure functions called inside `mapPartitions`, no state, no natives.
  * All header fields are treated as untrusted input — corrupt payloads
  * decode to None (stub fallback), never to a thrown task failure.
  */
object MediaCodecs {

  // ---- little-endian primitive readers/writers ----------------------------
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def w16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def w32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  /** Content sniffing by magic bytes — metadata can lie; payloads don't. */
  def sniff(b: Array[Byte]): String =
    if (isBmp(b)) "image/bmp"
    else if (isWav(b)) "audio/wav"
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "image/png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "image/jpeg"
    else "application/octet-stream"

  // ---- BMP: 24bpp uncompressed (BITMAPINFOHEADER) -------------------------

  /** Decoded image: RGB triples, row-major, top-down. */
  final case class BmpImage(width: Int, height: Int, rgb: Array[Byte])

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  /** Decode a 24bpp uncompressed BMP (the self-describing subset; returns
    * None for palettes/compression/other depths — those go through ImageIO
    * or the stub). Header fields are untrusted: pixelOff and the size math
    * are validated in Long before any allocation or indexing, so a crafted
    * header returns None instead of throwing (and failing the task). */
  def decodeBmp(b: Array[Byte]): Option[BmpImage] = {
    if (!isBmp(b)) return None
    val pixelOff = i32(b, 10)
    val hdrSize = i32(b, 14)
    if (hdrSize < 40) return None
    val width = i32(b, 18)
    val heightRaw = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (bpp != 24 || compression != 0 || width <= 0 ||
      heightRaw == 0 || heightRaw == Int.MinValue) return None
    val height = math.abs(heightRaw)
    val topDown = heightRaw < 0
    val strideL = ((width.toLong * 3) + 3) & ~3L // rows pad to 4 bytes
    if (pixelOff < 54 || pixelOff.toLong + strideL * height > b.length) return None
    val rowStride = strideL.toInt // fits: bounded by b.length above
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y // BMP default is bottom-up
      var x = 0
      while (x < width) {
        val s = pixelOff + srcRow * rowStride + x * 3
        val d = (y * width + x) * 3
        // BMP stores BGR
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(BmpImage(width, height, rgb))
  }

  /** Encode RGB top-down pixels as a bottom-up 24bpp BMP. */
  def encodeBmp(img: BmpImage): Array[Byte] = {
    val rowStride = ((img.width * 3) + 3) & ~3
    val pixelBytes = rowStride * img.height
    val out = new Array[Byte](54 + pixelBytes)
    out(0) = 'B'; out(1) = 'M'
    w32(out, 2, out.length); w32(out, 10, 54)
    w32(out, 14, 40); w32(out, 18, img.width); w32(out, 22, img.height)
    w16(out, 26, 1); w16(out, 28, 24); w32(out, 34, pixelBytes)
    var y = 0
    while (y < img.height) {
      val dstRow = img.height - 1 - y
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = 54 + dstRow * rowStride + x * 3
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode JPEG/PNG through the JDK's `javax.imageio` into the same RGB
    * carrier as [[decodeBmp]], so resize/encode downstream is shared code.
    * Only sniffed JPEG/PNG payloads attempt the (comparatively expensive)
    * ImageIO reader; anything ImageIO rejects returns None → stub fallback. */
  def decodeImageIO(b: Array[Byte]): Option[BmpImage] = {
    val m = sniff(b)
    if (m != "image/jpeg" && m != "image/png") return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) None
        else {
          val px = img.getRGB(0, 0, w, h, null, 0, w) // packed ARGB, row-major
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            rgb(i * 3) = ((p >> 16) & 0xff).toByte
            rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
            rgb(i * 3 + 2) = (p & 0xff).toByte
            i += 1
          }
          Some(BmpImage(w, h, rgb))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Unified still-image decode: the zero-copy-ish BMP byte parser first
    * (cheapest, and never touches ImageIO), then the JDK ImageIO path for
    * JPEG/PNG. None ⇒ not a decodable image (stub path). */
  def decodeImage(b: Array[Byte]): Option[BmpImage] =
    decodeBmp(b).orElse(decodeImageIO(b))

  /** Nearest-neighbor resize — a real thumbnail, not a byte stride. */
  def resizeBmp(img: BmpImage, w: Int, h: Int): BmpImage = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w + x) * 3
        rgb(d) = img.rgb(s); rgb(d + 1) = img.rgb(s + 1); rgb(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    BmpImage(w, h, rgb)
  }

  // ---- WAV: RIFF/PCM16 ----------------------------------------------------

  /** Decoded audio: interleaved 16-bit samples. */
  final case class WavAudio(channels: Int, sampleRate: Int, samples: Array[Short]) {
    def durationMs: Long =
      if (sampleRate == 0 || channels == 0) 0
      else samples.length.toLong * 1000 / (sampleRate.toLong * channels)
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decode a PCM16 WAV by walking its RIFF chunks (fmt then data).
    * Chunk lengths are untrusted input: a negative length is rejected (it
    * would stall or rewind the walk) and the offset advances in Long so a
    * huge declared length can't overflow into a negative index — corrupt
    * payloads return None (→ byte-stub fallback) instead of hanging or
    * throwing in the executor task. */
  def decodeWav(b: Array[Byte]): Option[WavAudio] = {
    if (!isWav(b)) return None
    var off = 12L
    var channels = 0; var rate = 0; var bits = 0; var fmt = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val len = i32(b, o + 4)
      if (len < 0) return None // corrupt: a chunk can't be negative-sized
      if (id == "fmt " && off + 8 + 16 <= b.length) {
        fmt = u16(b, o + 8); channels = u16(b, o + 10)
        rate = i32(b, o + 12); bits = u16(b, o + 22)
      } else if (id == "data") {
        dataOff = o + 8; dataLen = math.max(0, math.min(len, b.length - dataOff))
      }
      off += 8L + len + (len & 1) // chunks are word-aligned
    }
    if (fmt != 1 || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = u16(b, dataOff + i * 2).toShort; i += 1 }
    Some(WavAudio(channels, rate, samples))
  }

  /** Encode interleaved PCM16 samples as a canonical 44-byte-header WAV —
    * the inverse of [[decodeWav]] (round-trip spec'd in MultimodalSpec). */
  def encodeWav(a: WavAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    w32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    w32(out, 16, 16); w16(out, 20, 1); w16(out, 22, a.channels)
    w32(out, 24, a.sampleRate)
    w32(out, 28, a.sampleRate * a.channels * 2) // byte rate
    w16(out, 32, a.channels * 2); w16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    w32(out, 40, dataLen)
    var i = 0
    while (i < a.samples.length) { w16(out, 44 + i * 2, a.samples(i) & 0xffff); i += 1 }
    out
  }

  /** Encode RGB top-down pixels as PNG through the JDK ImageIO writer.
    * PNG is lossless, so [[decodeImageIO]] round-trips the pixels exactly —
    * the image-side inverse that lets fixtures exercise the ImageIO decode
    * path without shipping binary blobs. */
  def encodePng(img: BmpImage): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        bi.setRGB(x, y,
          ((img.rgb(s) & 0xff) << 16) | ((img.rgb(s + 1) & 0xff) << 8) | (img.rgb(s + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** Mean absolute amplitude — a real audio feature. */
  def meanAbsAmplitude(a: WavAudio): Double =
    if (a.samples.isEmpty) 0.0
    else {
      var s = 0.0; var i = 0
      while (i < a.samples.length) { s += math.abs(a.samples(i).toInt); i += 1 }
      s / a.samples.length
    }
}
