package graft.media

import graft.media.Codecs.{MAudio, MImage}

/** Deterministic synthetic media fixtures: payload bytes are a pure
  * function of a row id via wrapping-Long linear mixes + the splitmix64
  * finalizer, so an external oracle (DuckDB, the driver's correctness gate)
  * can regenerate every pixel/sample with integer arithmetic and verify the
  * codecs end-to-end — any header, padding, channel-order, or row-order
  * parse bug breaks the position-weighted checksums downstream.
  *
  * Formats rotate by id so one corpus exercises every decoder arm:
  * id%3==0 → BMP (bottom-up BGR, padded rows), 1 → PPM P6 (with a header
  * comment when id is odd), 2 → PGM P5 (grayscale).
  */
object MediaGen {
  // mix multipliers (public splitmix/xxhash-family constants)
  final val A = 0x9E3779B97F4A7C15L // golden-ratio increment
  final val B = 0xC2B2AE3D27D4EB4FL
  final val C = 0x165667B19E3779F9L
  final val D = 0x27D4EB2F165667C5L

  /** splitmix64 finalizer — identical to the DuckDB oracle macro `g_av`. */
  def avalanche(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def imgWidth(id: Long): Int = 4 + (id % 5).toInt // 4..8
  def imgHeight(id: Long): Int = 3 + (id % 4).toInt // 3..6
  def imgChannels(id: Long): Int = if (id % 3 == 2) 1 else 3
  def nFrames(id: Long): Int = 2 + (id % 3).toInt // 2..4
  def wavRate(id: Long): Int = 8000 + 1000 * (id % 5).toInt
  def wavSamples(id: Long): Int = 64 + (id % 64).toInt

  /** One raster byte: frame f, position (y,x), channel c of image id. */
  def pixelByte(id: Long, f: Int, y: Int, x: Int, c: Int): Int =
    (avalanche(id * A + f * B + y * C + x * D + c) & 0xFF).toInt

  /** One s16 audio sample of clip id. */
  def sample(id: Long, i: Int): Short =
    ((avalanche(id * A + i * D + 9973L) & 0xFFFF) - 32768).toShort

  def image(id: Long, frame: Int = 0): MImage = {
    val w = imgWidth(id); val h = imgHeight(id); val ch = imgChannels(id)
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) = pixelByte(id, frame, y, x, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    MImage(w, h, ch, px)
  }

  /** Single-image payload in the id's rotating format. A sparse set of ids
    * (id%97==0) yields a deliberately truncated payload to exercise the
    * corrupt-row path. */
  def imagePayload(id: Long): Array[Byte] = {
    val full = id % 3 match {
      case 0 => Codecs.Bmp.encode(image(id))
      case 1 =>
        if (id % 2 == 1) Codecs.Ppm.encodeWithComment(image(id), " synthetic")
        else Codecs.Ppm.encode(image(id))
      case _ => Codecs.Ppm.encode(image(id)) // P5 via channels=1
    }
    if (id % 97 == 0) java.util.Arrays.copyOfRange(full, 0, 7) else full
  }

  /** Multi-frame video payload: nFrames(id) concatenated P6 frames (frames
    * of a video share dims, so channels are forced to 3 here). */
  def videoPayload(id: Long): Array[Byte] = {
    val w = imgWidth(id); val h = imgHeight(id)
    val frames = (0 until nFrames(id)).map { f =>
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            px((y * w + x) * 3 + c) = pixelByte(id, f, y, x, c).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      MImage(w, h, 3, px)
    }
    Codecs.PpmStream.encode(frames)
  }

  /** Mono PCM-16 WAV payload. */
  def wavPayload(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val s = new Array[Short](n)
    var i = 0
    while (i < n) { s(i) = sample(id, i); i += 1 }
    Codecs.Wav.encode(MAudio(wavRate(id), 1, s))
  }
}
