package graft.media

import org.scalatest.funsuite.AnyFunSuite
import graft.media.Codecs._

/** Pure-JVM codec tests: golden byte layouts, round-trips, malformed-input
  * totality. No Spark session needed. */
class CodecsSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int): MImage = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) = f(y, x, c).toByte
    MImage(w, h, ch, px)
  }

  // ---------------- PPM / PGM ----------------

  test("ppm: golden P6 bytes with comment and irregular whitespace parse") {
    // 2x2 RGB, known pixels, comment line + tabs/CR in header
    val raster = Array[Byte](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120)
    val header = "P6\n# a comment\n 2\t2\r\n255\n".getBytes("US-ASCII")
    val bytes = header ++ raster
    val got = Ppm.decode(bytes).get
    assert(got.width == 2 && got.height == 2 && got.channels == 3)
    assert(got.pixels.toSeq == raster.toSeq)
    assert(got.pixel(1, 0, 2) == 90)
  }

  test("ppm: canonical encode → decode round-trips P6 and P5") {
    val rgb = img(5, 3, 3)((y, x, c) => y * 50 + x * 10 + c)
    val gray = img(4, 6, 1)((y, x, _) => y * 16 + x)
    for (i <- Seq(rgb, gray)) {
      val back = Ppm.decode(Ppm.encode(i)).get
      assert(back == i.copy(pixels = back.pixels))
      assert(back.pixels.toSeq == i.pixels.toSeq)
    }
    // comment variant
    val back2 = Ppm.decode(Ppm.encodeWithComment(rgb, " synthetic")).get
    assert(back2.pixels.toSeq == rgb.pixels.toSeq)
  }

  test("ppm: malformed inputs return None, never throw") {
    val good = Ppm.encode(img(3, 3, 3)((_, _, _) => 1))
    assert(Ppm.decode(null).isEmpty)
    assert(Ppm.decode(Array[Byte]()).isEmpty)
    assert(Ppm.decode("P7\n1 1\n255\nx".getBytes).isEmpty) // unknown magic
    assert(Ppm.decode("P6\n2 2\n254\n".getBytes ++ new Array[Byte](12)).isEmpty) // maxval != 255
    assert(Ppm.decode(java.util.Arrays.copyOfRange(good, 0, good.length - 1)).isEmpty) // truncated raster
    assert(Ppm.decode("P6\n0 2\n255\n".getBytes).isEmpty) // zero dim
    assert(Ppm.decode("P6\n2 2\n255".getBytes).isEmpty) // missing ws after maxval
  }

  test("ppm stream: concatenated frames parse with exact boundaries") {
    val frames = (0 until 3).map(f => img(3, 2, 3)((y, x, c) => f * 40 + y * 10 + x * 3 + c))
    val bytes = PpmStream.encode(frames)
    val got = PpmStream.decode(bytes).get
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, e) => assert(g.pixels.toSeq == e.pixels.toSeq) }
    // trailing garbage = corrupt video
    assert(PpmStream.decode(bytes ++ Array[Byte](1, 2, 3)).isEmpty)
    // truncated mid-frame = corrupt
    assert(PpmStream.decode(java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 2)).isEmpty)
  }

  // ---------------- BMP ----------------

  test("bmp: golden byte layout — little-endian header, bottom-up BGR, row padding") {
    // 3x2 RGB: row size = 3*3=9 → padded to 12
    val i = img(3, 2, 3)((y, x, c) => (y * 3 + x) * 10 + c)
    val b = Bmp.encode(i)
    assert(b.length == 54 + 2 * 12)
    assert(b(0) == 'B' && b(1) == 'M')
    // width=3, height=2 little-endian at offsets 18/22
    assert((b(18) & 0xFF) == 3 && b(19) == 0 && (b(22) & 0xFF) == 2)
    assert((b(28) & 0xFF) == 24) // bpp
    // first stored row is the BOTTOM image row (y=1), and stored BGR:
    // image pixel (1,0) = (30,31,32) → stored bytes 32,31,30 at offset 54
    assert((b(54) & 0xFF) == 32 && (b(55) & 0xFF) == 31 && (b(56) & 0xFF) == 30)
    // padding bytes present at end of each stored row
    assert(b(54 + 9) == 0 && b(54 + 10) == 0 && b(54 + 11) == 0)
    val back = Bmp.decode(b).get
    assert(back.width == 3 && back.height == 2)
    assert(back.pixels.toSeq == i.pixels.toSeq) // RGB order restored, rows re-flipped
  }

  test("bmp: top-down (negative height) variant decodes") {
    val i = img(2, 2, 3)((y, x, c) => y * 100 + x * 10 + c)
    val b = Bmp.encode(i)
    // flip to top-down: negate height, un-reverse rows
    b(22) = (-2 & 0xFF).toByte; b(23) = (-1).toByte; b(24) = (-1).toByte; b(25) = (-1).toByte
    val rs = Bmp.rowSize(2)
    val row0 = java.util.Arrays.copyOfRange(b, 54, 54 + rs)
    val row1 = java.util.Arrays.copyOfRange(b, 54 + rs, 54 + 2 * rs)
    System.arraycopy(row1, 0, b, 54, rs)
    System.arraycopy(row0, 0, b, 54 + rs, rs)
    val back = Bmp.decode(b).get
    assert(back.pixels.toSeq == i.pixels.toSeq)
  }

  test("bmp: malformed inputs return None") {
    val good = Bmp.encode(img(3, 2, 3)((_, _, _) => 7))
    assert(Bmp.decode(null).isEmpty)
    assert(Bmp.decode(java.util.Arrays.copyOfRange(good, 0, 53)).isEmpty)
    assert(Bmp.decode(java.util.Arrays.copyOfRange(good, 0, good.length - 1)).isEmpty)
    val bad8bpp = good.clone(); bad8bpp(28) = 8
    assert(Bmp.decode(bad8bpp).isEmpty)
    val badComp = good.clone(); badComp(30) = 1 // BI_RLE8
    assert(Bmp.decode(badComp).isEmpty)
  }

  // ---------------- WAV ----------------

  test("wav: golden header layout and s16 round-trip incl. negatives") {
    val a = MAudio(16000, 1, Array[Short](0, 1, -1, 32767, -32768, 1000))
    val b = Wav.encode(a)
    assert(b.length == 44 + 12)
    assert(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE")
    assert(new String(b, 12, 4) == "fmt " && new String(b, 36, 4) == "data")
    assert((b(20) & 0xFF) == 1) // PCM
    assert(((b(24) & 0xFF) | ((b(25) & 0xFF) << 8) | ((b(26) & 0xFF) << 16)) == 16000)
    // -1 stored little-endian at sample index 2 → 0xFF 0xFF
    assert((b(48) & 0xFF) == 0xFF && (b(49) & 0xFF) == 0xFF)
    val back = Wav.decode(b).get
    assert(back.sampleRate == 16000 && back.channels == 1)
    assert(back.samples.toSeq == a.samples.toSeq)
  }

  test("wav: chunk walker skips unknown chunks (LIST before data)") {
    val a = MAudio(8000, 2, Array[Short](5, -5, 6, -6))
    val b = Wav.encode(a)
    // splice a LIST chunk (odd size → word-align padding) between fmt and data
    val listChunk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++ "abc".getBytes ++ Array[Byte](0)
    val spliced = b.slice(0, 36) ++ listChunk ++ b.slice(36, b.length)
    // fix RIFF size field
    val newSize = spliced.length - 8
    spliced(4) = newSize.toByte; spliced(5) = (newSize >> 8).toByte
    spliced(6) = (newSize >> 16).toByte; spliced(7) = (newSize >> 24).toByte
    val back = Wav.decode(spliced).get
    assert(back.sampleRate == 8000 && back.channels == 2)
    assert(back.samples.toSeq == a.samples.toSeq)
  }

  test("wav: malformed inputs return None") {
    val good = Wav.encode(MAudio(8000, 1, Array[Short](1, 2, 3)))
    assert(Wav.decode(null).isEmpty)
    assert(Wav.decode(java.util.Arrays.copyOfRange(good, 0, 43)).isEmpty)
    assert(Wav.decode(java.util.Arrays.copyOfRange(good, 0, good.length - 2)).isEmpty) // truncated data chunk
    val badFmt = good.clone(); badFmt(20) = 3 // IEEE float
    assert(Wav.decode(badFmt).isEmpty)
  }

  // ---------------- transforms ----------------

  test("resizeNearest: exact NN semantics, odd dims, gray and rgb") {
    val i = img(5, 3, 3)((y, x, c) => y * 16 + x * 4 + c)
    val r = Codecs.resizeNearest(i, 2)
    assert(r.width == 3 && r.height == 2) // ceil(5/2), ceil(3/2)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3)
      assert(r.pixel(y, x, c) == i.pixel(y * 2, x * 2, c))
    val g = img(4, 4, 1)((y, x, _) => y * 4 + x)
    val rg = Codecs.resizeNearest(g, 3)
    assert(rg.width == 2 && rg.height == 2)
    assert(rg.pixel(1, 1, 0) == g.pixel(3, 3, 0))
    assert(Codecs.resizeNearest(i, 1) eq i)
  }

  test("decimate: every factor-th frame per channel, rate divides") {
    val a = MAudio(16000, 2, Array[Short](1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
    val d = Codecs.decimate(a, 2)
    assert(d.sampleRate == 8000 && d.channels == 2)
    assert(d.samples.toSeq == Seq[Short](1, 2, 5, 6, 9, 10))
  }

  // ---------------- synthetic generator ↔ codec coherence ----------------

  test("mediagen: every format arm encodes then decodes to the generated raster") {
    for (id <- 1L to 30L) {
      val payload = MediaGen.imagePayload(id)
      if (id % 97 == 0) assert(Media.decodeImage(payload).isEmpty)
      else {
        val got = Media.decodeImage(payload).get
        val want = MediaGen.image(id)
        assert(got.width == want.width && got.height == want.height &&
          got.channels == want.channels, s"id=$id")
        assert(got.pixels.toSeq == want.pixels.toSeq, s"id=$id")
      }
    }
  }

  test("mediagen: video stream parses to nFrames frames with per-frame pixels") {
    for (id <- Seq(3L, 4L, 5L)) {
      val frames = PpmStream.decode(MediaGen.videoPayload(id)).get
      assert(frames.length == MediaGen.nFrames(id))
      frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.pixel(0, 0, 0) == MediaGen.pixelByte(id, f, 0, 0, 0))
        assert(fr.pixel(fr.height - 1, fr.width - 1, 2) ==
          MediaGen.pixelByte(id, f, fr.height - 1, fr.width - 1, 2))
      }
    }
  }

  test("mediagen: wav round-trips samples and rate; describe() parses real meta") {
    val id = 12L
    val a = Wav.decode(MediaGen.wavPayload(id)).get
    assert(a.sampleRate == MediaGen.wavRate(id))
    assert(a.samples.length == MediaGen.wavSamples(id))
    assert(a.samples(5) == MediaGen.sample(id, 5))
    assert(Media.describe(MediaGen.wavPayload(id)) ==
      Media.MediaMeta("audio/wav", 0, 0, 0, MediaGen.wavRate(id)))
    val vid = 7L
    assert(Media.describe(MediaGen.videoPayload(vid)) ==
      Media.MediaMeta("video/ppm-stream", MediaGen.imgWidth(vid),
        MediaGen.imgHeight(vid), MediaGen.nFrames(vid), 0))
    assert(Media.describe(MediaGen.imagePayload(97L)).format == "corrupt")
  }
}
