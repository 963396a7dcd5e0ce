package graft.multimodal

/** Real, dependency-free media codecs.
  *
  * This is the substance behind Multimodal's decode/resize/frame-sample
  * surface. Two layers:
  *   - pure byte parsing for formats that are plain header+array layouts:
  *     BMP (24bpp uncompressed), WAV (PCM16), and the MP4/ISO-BMFF
  *     container (box tree + sample tables — the demuxer layer);
  *   - the JDK's `javax.imageio` (part of every standard JDK — no extra
  *     dependency) for JPEG/PNG via [[decodeImageIO]].
  * The only remaining stub layer is the video codec INSIDE an MP4 sample
  * (H.264 etc., genuinely absent from the JDK): container metadata and
  * per-frame byte ranges are decoded for real, the frame payloads stay
  * opaque. `sniff` recognizes magic bytes so dispatch is honest about
  * which path ran.
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

  // big-endian (network order) readers/writers — ISO-BMFF is big-endian
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o) & 0xffffffffL) << 32) | (be32(b, o + 4) & 0xffffffffL)
  private def wbe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >> 24).toByte; b(o + 1) = (v >> 16).toByte
    b(o + 2) = (v >> 8).toByte; b(o + 3) = v.toByte
  }

  /** Content sniffing by magic bytes — metadata can lie; payloads don't. */
  def sniff(b: Array[Byte]): String =
    if (isBmp(b)) "image/bmp"
    else if (isWav(b)) "audio/wav"
    else if (isMp4(b)) "video/mp4"
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

  // ---- MP4 / ISO-BMFF (ISO/IEC 14496-12 box layout) -----------------------

  /** Container-level MP4 metadata — everything a demuxer knows without a
    * codec: movie duration, track count/kinds, the video track's declared
    * dimensions, and the byte ranges of its samples (each sample is one
    * encoded video frame, addressed by the stsz/stsc/stco sample table). */
  final case class Mp4Meta(brand: String, durationMs: Long, nTracks: Int,
      width: Int, height: Int, hasVideo: Boolean, hasAudio: Boolean,
      sampleRanges: Vector[(Int, Int)])

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Walk the ISO-BMFF box tree: ftyp brand, mvhd duration, per-trak tkhd
    * dimensions + hdlr handler, and the first video track's full sample
    * table (stsz sizes × stsc chunk runs × stco/co64 chunk offsets expanded
    * to per-sample byte ranges). All sizes/counts/offsets are untrusted:
    * bounds run in Long, box counts and sample counts are capped, and any
    * violation returns None (stub fallback) — never a thrown task failure.
    * No codec: this is the demuxer layer; sample PAYLOADS stay opaque. */
  def decodeMp4(b: Array[Byte]): Option[Mp4Meta] = {
    if (!isMp4(b)) return None
    var corrupt = false
    // sibling-box walk over [start, end); f sees (type, payloadStart, payloadEnd)
    def boxes(start: Int, end: Int)(f: (String, Int, Int) => Unit): Unit = {
      var off = start.toLong
      var n = 0
      while (!corrupt && off + 8 <= end) {
        n += 1
        if (n > 4096) { corrupt = true; return } // runaway sibling list
        val o = off.toInt
        val sz = be32(b, o) & 0xffffffffL
        var hdr = 8L
        val size =
          if (sz == 0) end - off // "extends to end of enclosing box"
          else if (sz == 1) {    // 64-bit largesize
            if (off + 16 > end) { corrupt = true; return }
            hdr = 16L; be64(b, o + 8)
          } else sz
        if (size < hdr || off + size > end) { corrupt = true; return }
        f(new String(b, o + 4, 4, "US-ASCII"), (off + hdr).toInt, (off + size).toInt)
        off += size
      }
    }
    // sample table of one trak: stsz/stsc/stco(co64) → per-sample (off, len)
    def parseStbl(s: Int, e: Int): Vector[(Int, Int)] = {
      val maxN = 1 << 16 // fixture/feature cap, far above any sane clip
      var sizes: Array[Int] = null
      var chunkOff: Array[Long] = null
      var runs: Array[(Int, Int)] = null // (first_chunk, samples_per_chunk)
      boxes(s, e) { (t, ps, pe) =>
        t match {
          case "stsz" if pe - ps >= 12 =>
            val uniform = be32(b, ps + 4)
            val count = be32(b, ps + 8)
            if (count < 0 || count > maxN) corrupt = true
            else if (uniform != 0) sizes = Array.fill(count)(uniform)
            else if (ps + 12 + count.toLong * 4 > pe) corrupt = true
            else sizes = Array.tabulate(count)(i => be32(b, ps + 12 + i * 4))
          case "stco" if pe - ps >= 8 =>
            val count = be32(b, ps + 4)
            if (count < 0 || count > maxN || ps + 8 + count.toLong * 4 > pe) corrupt = true
            else chunkOff = Array.tabulate(count)(i => be32(b, ps + 8 + i * 4) & 0xffffffffL)
          case "co64" if pe - ps >= 8 =>
            val count = be32(b, ps + 4)
            if (count < 0 || count > maxN || ps + 8 + count.toLong * 8 > pe) corrupt = true
            else chunkOff = Array.tabulate(count)(i => be64(b, ps + 8 + i * 8))
          case "stsc" if pe - ps >= 8 =>
            val count = be32(b, ps + 4)
            if (count < 0 || count > maxN || ps + 8 + count.toLong * 12 > pe) corrupt = true
            else runs = Array.tabulate(count)(i =>
              (be32(b, ps + 8 + i * 12), be32(b, ps + 8 + i * 12 + 4)))
          case _ => ()
        }
      }
      if (corrupt || sizes == null || chunkOff == null || runs == null) return Vector.empty
      val out = Vector.newBuilder[(Int, Int)]
      var si = 0; var ci = 0
      while (ci < chunkOff.length && si < sizes.length && !corrupt) {
        // samples-per-chunk of chunk ci+1 = last run with first_chunk <= ci+1
        var spc = 0; var k = 0
        while (k < runs.length && runs(k)._1 <= ci + 1) { spc = runs(k)._2; k += 1 }
        var base = chunkOff(ci)
        var j = 0
        while (j < spc && si < sizes.length && !corrupt) {
          val len = sizes(si)
          if (len < 0 || base < 0 || base + len > b.length) corrupt = true
          else { out += ((base.toInt, len)); base += len; si += 1 }
          j += 1
        }
        ci += 1
      }
      if (corrupt) Vector.empty else out.result()
    }
    var brand = ""
    var durationMs = -1L
    var nTracks = 0
    var width = -1; var height = -1
    var hasVideo = false; var hasAudio = false
    var videoSamples: Vector[(Int, Int)] = Vector.empty
    boxes(0, b.length) { (t, ps, pe) =>
      t match {
        case "ftyp" if pe - ps >= 4 => brand = new String(b, ps, 4, "US-ASCII").trim
        case "moov" => boxes(ps, pe) { (t2, p2, e2) =>
          t2 match {
            case "mvhd" if e2 - p2 >= 20 =>
              val v = b(p2) & 0xff
              val (ts, dur) =
                if (v == 1 && e2 - p2 >= 32) (be32(b, p2 + 20), be64(b, p2 + 24))
                else (be32(b, p2 + 12), be32(b, p2 + 16) & 0xffffffffL)
              if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000)
                durationMs = dur * 1000 / ts
            case "trak" =>
              nTracks += 1
              var handler = ""
              var tw = -1; var th = -1
              var stbl: Vector[(Int, Int)] = Vector.empty
              boxes(p2, e2) { (t3, p3, e3) =>
                t3 match {
                  case "tkhd" =>
                    val wOff = if ((b(p3) & 0xff) == 1) 88 else 76
                    if (e3 - p3 >= wOff + 8) {
                      tw = be32(b, p3 + wOff) >>> 16 // 16.16 fixed point
                      th = be32(b, p3 + wOff + 4) >>> 16
                    }
                  case "mdia" => boxes(p3, e3) { (t4, p4, e4) =>
                    t4 match {
                      case "hdlr" if e4 - p4 >= 12 =>
                        handler = new String(b, p4 + 8, 4, "US-ASCII")
                      case "minf" => boxes(p4, e4) { (t5, p5, e5) =>
                        if (t5 == "stbl") stbl = parseStbl(p5, e5)
                      }
                      case _ => ()
                    }
                  }
                  case _ => ()
                }
              }
              if (handler == "vide") {
                hasVideo = true
                if (tw > 0 && th > 0) { width = tw; height = th }
                if (videoSamples.isEmpty) videoSamples = stbl
              } else if (handler == "soun") hasAudio = true
            case _ => ()
          }
        }
        case _ => ()
      }
    }
    if (corrupt || nTracks == 0) None
    else Some(Mp4Meta(brand, durationMs, nTracks, width, height,
      hasVideo, hasAudio, videoSamples))
  }

  /** Build a minimal, structurally valid MP4: `ftyp` + `mdat` holding the
    * frame payloads + `moov` (mvhd at timescale 1000, a video trak whose
    * stsz/stsc/stco sample table addresses the mdat frames, optionally an
    * audio trak). The inverse fixture for [[decodeMp4]] — any conforming
    * demuxer agrees on the layout, so specs exercise the real demux path
    * without shipping binary blobs. */
  def encodeMp4(width: Int, height: Int, durationMs: Long,
                frames: Array[Array[Byte]], withAudio: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && durationMs >= 0 && frames.nonEmpty)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val out = new Array[Byte](8 + payload.map(_.length).sum)
      wbe32(out, 0, out.length)
      var i = 0
      while (i < 4) { out(4 + i) = typ(i).toByte; i += 1 }
      var o = 8
      payload.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
      out
    }
    def be(vs: Int*): Array[Byte] = {
      val a = new Array[Byte](vs.length * 4)
      vs.zipWithIndex.foreach { case (v, i) => wbe32(a, i * 4, v) }
      a
    }
    val matrix = be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) // identity
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be(0), "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", frames.flatten.toArray)
    val mdatPayloadOff = ftyp.length + 8
    val mvhd = box("mvhd", be(0, 0, 0, 1000, durationMs.toInt, 0x10000),
      Array[Byte](1, 0, 0, 0), be(0, 0), matrix, be(0, 0, 0, 0, 0, 0), be(3))
    // tkhd v0: vf, creation, modification, track_ID, reserved, duration,
    // reserved×2, layer/alternate, volume/reserved — 40 bytes before matrix
    def tkhd(trackId: Int, w: Int, h: Int) =
      box("tkhd", be(7 /* flags: enabled+in-movie */, 0, 0, trackId, 0,
        durationMs.toInt, 0, 0, 0, 0), matrix, be(w << 16, h << 16))
    // mdhd v0 tail: language "und" (0x55c4) packed high, pre_defined 0
    def mdhd = box("mdhd", be(0, 0, 0, 1000, durationMs.toInt), be(0x55c40000))
    def hdlr(kind: String) =
      box("hdlr", be(0, 0), kind.getBytes("US-ASCII"), be(0, 0, 0), Array[Byte](0))
    def stblOf(fs: Array[Array[Byte]]) = box("stbl",
      box("stsd", be(0, 0)),
      box("stts", be(0, 1, fs.length, 1)),
      box("stsc", be(0, 1, 1, fs.length, 1)),
      box("stsz", be(0, 0, fs.length) ++ be(fs.map(_.length).toIndexedSeq: _*)),
      box("stco", be(0, 1, mdatPayloadOff)))
    val emptyStbl = box("stbl",
      box("stsd", be(0, 0)), box("stts", be(0, 0)),
      box("stsc", be(0, 0)), box("stsz", be(0, 0, 0)), box("stco", be(0, 0)))
    val videoTrak = box("trak", tkhd(1, width, height),
      box("mdia", mdhd, hdlr("vide"), box("minf", stblOf(frames))))
    val audioTrak = box("trak", tkhd(2, 0, 0),
      box("mdia", mdhd, hdlr("soun"), box("minf", emptyStbl)))
    val moov =
      if (withAudio) box("moov", mvhd, videoTrak, audioTrak)
      else box("moov", mvhd, videoTrak)
    ftyp ++ mdat ++ moov
  }
}
