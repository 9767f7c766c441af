package graft.media

/** Real, dependency-free codecs for the self-describing media formats the
  * engine supports natively: PPM/PGM images (binary P6/P5), uncompressed
  * 24-bit BMP, PCM-16 WAV audio, and a PPM-stream video container
  * (concatenated P6 frames — the format `ffmpeg -f image2pipe -vcodec ppm`
  * emits). Decoders are total: malformed input yields `None`, never throws —
  * at 100 TB corrupt payloads are a certainty, and a poison row must not
  * kill an executor.
  *
  * All parsing is per-row and allocation-light; the Spark side batches these
  * through `mapPartitions` so codec work never shuffles.
  */
object Codecs {

  /** Decoded raster: row-major top-down pixels, interleaved channels
    * (channels = 3 → RGB byte triples, 1 → grayscale). */
  final case class MImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    def pixel(y: Int, x: Int, c: Int): Int =
      pixels((y * width + x) * channels + c) & 0xFF
  }

  /** Decoded PCM audio: interleaved s16 samples. */
  final case class MAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Best-effort container sniff from magic bytes. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 2) "unknown"
    else if (bytes(0) == 'P' && bytes(1) == '6') "image/ppm"
    else if (bytes(0) == 'P' && bytes(1) == '5') "image/pgm"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "audio/wav"
    else "unknown"
  }

  // ------------------------------------------------------------------
  // PPM / PGM (binary P6 / P5)
  // ------------------------------------------------------------------

  object Ppm {
    /** Encode as binary PPM (P6, channels=3) or PGM (P5, channels=1) with a
      * canonical single-space header and maxval 255. */
    def encode(img: MImage): Array[Byte] = {
      require(img.channels == 1 || img.channels == 3,
        s"PPM/PGM supports 1 or 3 channels, got ${img.channels}")
      val magic = if (img.channels == 3) "P6" else "P5"
      val header = s"$magic\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    /** Encode with a comment line after the magic — decoders must skip
      * `#`-comments per the netpbm spec; used to exercise that path. */
    def encodeWithComment(img: MImage, comment: String): Array[Byte] = {
      require(img.channels == 1 || img.channels == 3)
      val magic = if (img.channels == 3) "P6" else "P5"
      val header = s"$magic\n#$comment\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    def decode(bytes: Array[Byte]): Option[MImage] =
      decodeFrom(bytes, 0).map(_._1)

    /** Parse one image starting at `off`; returns the image and the offset
      * one past its pixel data (for concatenated frame streams). Handles
      * arbitrary whitespace and `#`-comments in the header. */
    def decodeFrom(bytes: Array[Byte], off: Int): Option[(MImage, Int)] = {
      if (bytes == null || off < 0 || bytes.length - off < 2) return None
      if (bytes(off) != 'P') return None
      val channels = bytes(off + 1) match {
        case '6' => 3
        case '5' => 1
        case _ => return None
      }
      var p = off + 2
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // netpbm token scan: skip whitespace and #-to-EOL comments, then
      // read one decimal token
      def nextInt(): Option[Int] = {
        while (p < bytes.length &&
          (isWs(bytes(p)) || bytes(p) == '#')) {
          if (bytes(p) == '#') {
            while (p < bytes.length && bytes(p) != '\n') p += 1
          } else p += 1
        }
        if (p >= bytes.length || bytes(p) < '0' || bytes(p) > '9') return None
        var v = 0L
        while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
          v = v * 10 + (bytes(p) - '0')
          if (v > Int.MaxValue) return None
          p += 1
        }
        Some(v.toInt)
      }
      for {
        w <- nextInt()
        h <- nextInt()
        maxv <- nextInt()
        if w > 0 && h > 0 && maxv == 255
        // exactly one whitespace byte separates maxval from raster data
        if p < bytes.length && isWs(bytes(p))
        n = w.toLong * h * channels
        if n <= Int.MaxValue && bytes.length - (p + 1) >= n
      } yield {
        val px = java.util.Arrays.copyOfRange(bytes, p + 1, p + 1 + n.toInt)
        (MImage(w, h, channels, px), p + 1 + n.toInt)
      }
    }
  }

  /** Video-as-PPM-stream: back-to-back binary P6/P5 frames. */
  object PpmStream {
    def encode(frames: Seq[MImage]): Array[Byte] = {
      val parts = frames.map(Ppm.encode)
      val out = new Array[Byte](parts.map(_.length).sum)
      var o = 0
      parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
      out
    }

    /** Parse every frame; `None` if any frame is malformed or trailing
      * garbage remains (a truncated tail means a corrupt video). */
    def decode(bytes: Array[Byte]): Option[Vector[MImage]] = {
      if (bytes == null) return None
      val acc = Vector.newBuilder[MImage]
      var off = 0
      var n = 0
      while (off < bytes.length) {
        Ppm.decodeFrom(bytes, off) match {
          case Some((img, next)) => acc += img; off = next; n += 1
          case None => return None
        }
      }
      if (n == 0) None else Some(acc.result())
    }
  }

  // ------------------------------------------------------------------
  // BMP (uncompressed 24-bit BI_RGB, BITMAPINFOHEADER)
  // ------------------------------------------------------------------

  object Bmp {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }

    def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

    /** Encode a 3-channel image as a bottom-up 24-bit BMP with 4-byte row
      * padding (the standard layout). */
    def encode(img: MImage): Array[Byte] = {
      require(img.channels == 3, "BMP encoder is 24-bit RGB only")
      val rs = rowSize(img.width)
      val dataSize = rs * img.height
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, out.length) // file size
      putI32(out, 10, 54) // pixel data offset
      putI32(out, 14, 40) // BITMAPINFOHEADER size
      putI32(out, 18, img.width)
      putI32(out, 22, img.height) // positive → bottom-up
      putU16(out, 26, 1) // planes
      putU16(out, 28, 24) // bpp
      putI32(out, 30, 0) // BI_RGB (uncompressed)
      putI32(out, 34, dataSize)
      var y = 0
      while (y < img.height) {
        val srcRow = img.height - 1 - y // bottom-up
        var x = 0
        while (x < img.width) {
          val s = (srcRow * img.width + x) * 3
          val d = 54 + y * rs + x * 3
          out(d) = img.pixels(s + 2) // B
          out(d + 1) = img.pixels(s + 1) // G
          out(d + 2) = img.pixels(s) // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** Decode an uncompressed 24-bit BMP (top-down or bottom-up) into a
      * top-down RGB raster. */
    def decode(bytes: Array[Byte]): Option[MImage] = {
      if (bytes == null || bytes.length < 54) return None
      if (bytes(0) != 'B' || bytes(1) != 'M') return None
      val dataOff = i32(bytes, 10)
      val hdrSize = i32(bytes, 14)
      if (hdrSize < 40) return None
      val w = i32(bytes, 18)
      val hRaw = i32(bytes, 22)
      val bottomUp = hRaw > 0
      val h = math.abs(hRaw)
      val bpp = u16(bytes, 28)
      val compression = i32(bytes, 30)
      if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
      val rs = rowSize(w)
      if (dataOff < 54 || bytes.length - dataOff < rs.toLong * h) return None
      if (w.toLong * h * 3 > Int.MaxValue) return None
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = if (bottomUp) h - 1 - y else y
        var x = 0
        while (x < w) {
          val s = dataOff + srcRow * rs + x * 3
          val d = (y * w + x) * 3
          px(d) = bytes(s + 2) // R ← stored BGR
          px(d + 1) = bytes(s + 1) // G
          px(d + 2) = bytes(s) // B
          x += 1
        }
        y += 1
      }
      Some(MImage(w, h, 3, px))
    }
  }

  // ------------------------------------------------------------------
  // WAV (RIFF container, PCM signed 16-bit little-endian)
  // ------------------------------------------------------------------

  object Wav {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }

    def encode(audio: MAudio): Array[Byte] = {
      val dataSize = audio.samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + dataSize)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16) // fmt chunk size
      putU16(out, 20, 1) // PCM
      putU16(out, 22, audio.channels)
      putI32(out, 24, audio.sampleRate)
      putI32(out, 28, audio.sampleRate * audio.channels * 2) // byte rate
      putU16(out, 32, audio.channels * 2) // block align
      putU16(out, 34, 16) // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, dataSize)
      var i = 0
      while (i < audio.samples.length) {
        putU16(out, 44 + 2 * i, audio.samples(i) & 0xFFFF)
        i += 1
      }
      out
    }

    /** Chunk-walking decoder: accepts extra chunks (LIST/INFO/fact) in any
      * position, requires PCM s16. */
    def decode(bytes: Array[Byte]): Option[MAudio] = {
      if (bytes == null || bytes.length < 44) return None
      if (sniff(bytes) != "audio/wav") return None
      var off = 12
      var channels = -1
      var rate = -1
      var samples: Array[Short] = null
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val size = i32(bytes, off + 4)
        if (size < 0 || off + 8 + size > bytes.length) return None
        id match {
          case "fmt " =>
            if (size < 16) return None
            val fmt = u16(bytes, off + 8)
            val bps = u16(bytes, off + 8 + 14)
            if (fmt != 1 || bps != 16) return None
            channels = u16(bytes, off + 8 + 2)
            rate = i32(bytes, off + 8 + 4)
          case "data" =>
            val n = size / 2
            val s = new Array[Short](n)
            var i = 0
            while (i < n) {
              s(i) = ((bytes(off + 8 + 2 * i) & 0xFF) |
                (bytes(off + 9 + 2 * i) << 8)).toShort
              i += 1
            }
            samples = s
          case _ => () // skip unknown chunk
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (channels <= 0 || rate <= 0 || samples == null) None
      else Some(MAudio(rate, channels, samples))
    }
  }

  // ------------------------------------------------------------------
  // Transforms over decoded rasters / audio
  // ------------------------------------------------------------------

  /** Nearest-neighbor downsample by an integer factor: output dims are
    * ceil(in/factor), output pixel (Y,X) = source (Y*factor, X*factor). */
  def resizeNearest(img: MImage, factor: Int): MImage = {
    require(factor >= 1)
    if (factor == 1) return img
    val ow = (img.width + factor - 1) / factor
    val oh = (img.height + factor - 1) / factor
    val out = new Array[Byte](ow * oh * img.channels)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        var c = 0
        while (c < img.channels) {
          out((y * ow + x) * img.channels + c) =
            img.pixels(((y * factor) * img.width + x * factor) *
              img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    MImage(ow, oh, img.channels, out)
  }

  /** Decimate audio by an integer factor (every factor-th sample, per
    * channel-frame); the sample rate divides accordingly. */
  def decimate(audio: MAudio, factor: Int): MAudio = {
    require(factor >= 1)
    if (factor == 1) return audio
    val frames = audio.samples.length / audio.channels
    val of = (frames + factor - 1) / factor
    val out = new Array[Short](of * audio.channels)
    var i = 0
    while (i < of) {
      var c = 0
      while (c < audio.channels) {
        out(i * audio.channels + c) =
          audio.samples(i * factor * audio.channels + c)
        c += 1
      }
      i += 1
    }
    MAudio(audio.sampleRate / factor, audio.channels, out)
  }
}
