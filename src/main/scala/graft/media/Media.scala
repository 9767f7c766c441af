package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.media.Codecs.{MAudio, MImage}

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Design: media payloads are opaque `binary` columns plus a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms (`mapPartitions` over the Dataset — the
  * Scala analog of Python's `mapInPandas` batches), so the heavy codec work
  * never shuffles and composes with any upstream partitioning
  * (e.g. repartition by size bucket before decode to balance skewed blobs).
  *
  * Codecs are REAL: PPM/PGM and uncompressed 24-bit BMP images, PCM-16 WAV
  * audio, and PPM-stream video (concatenated frames) are parsed byte-for-
  * byte by [[Codecs]] — headers, comments, BMP bottom-up BGR row padding,
  * RIFF chunk walking and all. Decoders are total: corrupt payloads yield
  * `ok=false` rows (null dims/features), never executor-killing throws.
  */
object Media {

  /** Typed metadata carried alongside every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  final case class MediaMeta(format: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int)
  final case class MediaRow(media_id: Long, payload: Array[Byte],
      meta: MediaMeta)
  final case class FeatureRow(media_id: Long, format: String, n_bytes: Int,
      ok: Boolean, width: Option[Int], height: Option[Int],
      checksum: Option[Long], features: Option[Array[Double]])
  final case class FrameRow(media_id: Long, frame_index: Int, src_frame: Int,
      width: Int, height: Int, checksum: Long, frame_bytes: Array[Byte])
  final case class AudioStatsRow(media_id: Long, ok: Boolean,
      sample_rate: Option[Int], n_samples: Option[Int],
      sum_abs: Option[Long], n_cross: Option[Long])
  final case class AudioFpRow(media_id: Long, ok: Boolean,
      n_frames: Option[Int], fingerprint: Option[Long])
  final case class SceneRow(media_id: Long, ok: Boolean,
      n_frames: Option[Int], n_scenes: Option[Int],
      sum_diff: Option[Long], max_diff: Option[Long])

  /** Dispatch to the right image decoder from the magic bytes. */
  def decodeImage(payload: Array[Byte]): Option[MImage] =
    Codecs.sniff(payload) match {
      case "image/ppm" | "image/pgm" => Codecs.Ppm.decode(payload)
      case "image/bmp" => Codecs.Bmp.decode(payload)
      case _ => None
    }

  /** Parse real metadata out of a payload: dims for images, frame count for
    * PPM streams, sample rate for WAV. Unparseable → format "corrupt". */
  def describe(payload: Array[Byte]): MediaMeta = Codecs.sniff(payload) match {
    case f @ ("image/ppm" | "image/pgm") =>
      Codecs.PpmStream.decode(payload) match {
        case Some(frames) if frames.length > 1 =>
          MediaMeta("video/ppm-stream", frames.head.width,
            frames.head.height, frames.length, 0)
        case Some(frames) =>
          MediaMeta(f, frames.head.width, frames.head.height, 1, 0)
        case None => MediaMeta("corrupt", 0, 0, 0, 0)
      }
    case "image/bmp" => Codecs.Bmp.decode(payload) match {
      case Some(img) => MediaMeta("image/bmp", img.width, img.height, 1, 0)
      case None => MediaMeta("corrupt", 0, 0, 0, 0)
    }
    case "audio/wav" => Codecs.Wav.decode(payload) match {
      case Some(a) =>
        MediaMeta("audio/wav", 0, 0, 0, a.sampleRate)
      case None => MediaMeta("corrupt", 0, 0, 0, 0)
    }
    case _ => MediaMeta("corrupt", 0, 0, 0, 0)
  }

  /** Wrap an arbitrary (id, binary) DataFrame into the canonical media
    * schema, parsing REAL metadata from each payload's header. */
  def asMediaTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    df.select(col(idCol).cast(LongType).as("media_id"),
        col(binCol).cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaRow(id, payload, describe(payload))
      })
      .toDF()
  }

  /** Position-weighted pixel checksum: Σ (y·w+x+1)·(r+2g+3b), grayscale
    * v counted as r=g=b=v. Order-independent (safe to aggregate any way)
    * yet position- and channel-sensitive — a flipped BMP row order, skipped
    * padding byte, or RGB/BGR swap changes it. */
  def imageChecksum(img: MImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val wgt = (y.toLong * img.width + x + 1)
        var v = 0L
        if (img.channels == 3) {
          v = (img.pixel(y, x, 0) + 2L * img.pixel(y, x, 1)
            + 3L * img.pixel(y, x, 2))
        } else {
          v = 6L * img.pixel(y, x, 0)
        }
        sum += wgt * v
        x += 1
      }
      y += 1
    }
    sum
  }

  /** 8-dim content features from a decoded raster, all derived from
    * integer sums (bit-reproducible by an external oracle): 2×2 grid
    * luminance means, per-channel means, aspect ratio. */
  def imageFeatures(img: MImage): Array[Double] = {
    val lumSum = new Array[Long](4)
    val cnt = new Array[Long](4)
    val chSum = new Array[Long](3)
    var y = 0
    while (y < img.height) {
      val cy = y * 2 / img.height
      var x = 0
      while (x < img.width) {
        val cell = cy * 2 + (x * 2 / img.width)
        if (img.channels == 3) {
          val r = img.pixel(y, x, 0); val g = img.pixel(y, x, 1)
          val b = img.pixel(y, x, 2)
          lumSum(cell) += r + g + b
          chSum(0) += r; chSum(1) += g; chSum(2) += b
        } else {
          val v = img.pixel(y, x, 0)
          lumSum(cell) += 3L * v
          chSum(0) += v; chSum(1) += v; chSum(2) += v
        }
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = img.width.toLong * img.height
    Array(
      lumSum(0).toDouble / (3.0 * cnt(0)),
      lumSum(1).toDouble / (3.0 * cnt(1)),
      lumSum(2).toDouble / (3.0 * cnt(2)),
      lumSum(3).toDouble / (3.0 * cnt(3)),
      chSum(0).toDouble / n,
      chSum(1).toDouble / n,
      chSum(2).toDouble / n,
      img.width.toDouble / img.height)
  }

  /** 64-bit perceptual average-hash of a decoded raster: NN-sample an 8×8
    * luminance grid (src pixel (y·H/8, x·W/8), lum = r+g+b, gray counted
    * ×3), set bit (y·8+x) iff 64·lum > Σlum (strict — integer-only, so an
    * external oracle reproduces it bit-for-bit). Near-duplicate images
    * differ in few bits (hamming via `bit_count(a ^ b)`). */
  def imagePhash(img: MImage): Long = {
    val lum = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sy = y * img.height / 8
        val sx = x * img.width / 8
        val v =
          if (img.channels == 3)
            (img.pixel(sy, sx, 0) + img.pixel(sy, sx, 1) +
              img.pixel(sy, sx, 2)).toLong
          else 3L * img.pixel(sy, sx, 0)
        lum(y * 8 + x) = v
        total += v
        x += 1
      }
      y += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (64L * lum(i) > total) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Decode + perceptual-hash every image payload: (media_id, ok, phash).
    * The multimodal near-dup primitive — join on hamming-banded phash
    * chunks exactly like SimHash text dedup. */
  def imagePhashes(media: DataFrame): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        decodeImage(payload) match {
          case Some(img) => (id, true, Some(imagePhash(img)))
          case None => (id, false, None)
        }
      }
    }.toDF("media_id", "ok", "phash")
  }

  /** L2 norm of a feature vector in fixed index order (reproducible). */
  def featureNorm(f: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < f.length) { s += f(i) * f(i); i += 1 }
    math.sqrt(s)
  }

  /** Decode + feature-extract: partition-local batches, one row per media
    * row; parse failures keep the row with ok=false and null features. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        val nBytes = if (payload == null) 0 else payload.length
        decodeImage(payload) match {
          case Some(img) =>
            FeatureRow(id, Codecs.sniff(payload), nBytes, ok = true,
              Some(img.width), Some(img.height), Some(imageChecksum(img)),
              Some(imageFeatures(img)))
          case None =>
            FeatureRow(id, Codecs.sniff(payload), nBytes, ok = false,
              None, None, None, None)
        }
      }
    }.toDF()
  }

  /** Real nearest-neighbor downsample by `factor`: decode (any supported
    * image format), resize, re-encode as canonical PPM/PGM — so this also
    * transcodes BMP inputs. Corrupt rows pass through with a null payload
    * and format "corrupt". Partition-local, no shuffle. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        decodeImage(payload) match {
          case Some(img) =>
            val out = Codecs.resizeNearest(img, factor)
            val enc = Codecs.Ppm.encode(out)
            MediaRow(id, enc, MediaMeta(
              if (out.channels == 3) "image/ppm" else "image/pgm",
              out.width, out.height, 1, 0))
          case None =>
            MediaRow(id, null, MediaMeta("corrupt", 0, 0, 0, 0))
        }
      }
    }.toDF()
  }

  /** Frame-sample a PPM-stream video into ≤ `framesPerVideo` evenly-strided
    * real frames: parse every frame boundary, emit one row per kept frame
    * with its decoded dims + checksum + re-encoded single-frame bytes.
    * Partition-local, no shuffle. */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    require(framesPerVideo >= 1)
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        Codecs.PpmStream.decode(payload) match {
          case Some(frames) =>
            val n = frames.length
            val stride = math.max(1, (n + framesPerVideo - 1) / framesPerVideo)
            (0 until framesPerVideo).iterator
              .map(_ * stride).takeWhile(_ < n).zipWithIndex
              .map { case (src, i) =>
                val img = frames(src)
                FrameRow(id, i, src, img.width, img.height,
                  imageChecksum(img), Codecs.Ppm.encode(img))
              }
          case None => Iterator.empty
        }
      }
    }.toDF()
  }

  /** Decode WAV audio and compute per-clip stats: sample count, Σ|s|, and
    * sign-change (zero-crossing) count — all integer, oracle-checkable. */
  def audioStats(media: DataFrame): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        Codecs.Wav.decode(payload) match {
          case Some(a) =>
            var sumAbs = 0L
            var cross = 0L
            var i = 0
            while (i < a.samples.length) {
              sumAbs += math.abs(a.samples(i).toLong)
              if (i > 0 &&
                (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) cross += 1
              i += 1
            }
            AudioStatsRow(id, ok = true, Some(a.sampleRate),
              Some(a.samples.length), Some(sumAbs), Some(cross))
          case None =>
            AudioStatsRow(id, ok = false, None, None, None, None)
        }
      }
    }.toDF()
  }

  /** Per-clip acoustic fingerprint for audio near-dup detection
    * (Haitsma–Kalker-style delta-sign bits, time-domain only so the kernel
    * stays integer-exact and oracle-checkable): the PCM stream is framed
    * into consecutive `frameSize`-sample frames (full frames only), each
    * frame's energy is the integer Σ|s|, and bit i−1 of the fingerprint is
    * set iff energy[i] > energy[i−1] (first 64 deltas). Delta SIGNS are
    * invariant under positive gain (Σ|s| scales linearly), so re-levelled
    * copies of a clip fingerprint identically; feed the result to
    * [[graft.ops.Dedup.hammingPairs]] for banded near-dup pairs — the
    * multimodal analog of simhash dedup. Partition-local, no shuffle;
    * corrupt payloads yield ok=false with NULL fields. */
  def audioFingerprints(media: DataFrame, frameSize: Int = 8): DataFrame = {
    require(frameSize >= 1)
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        Codecs.Wav.decode(payload) match {
          case Some(a) =>
            val nf = a.samples.length / frameSize
            val e = new Array[Long](nf)
            var f = 0
            while (f < nf) {
              var s = 0L
              var i = f * frameSize
              val end = i + frameSize
              while (i < end) { s += math.abs(a.samples(i).toLong); i += 1 }
              e(f) = s
              f += 1
            }
            var fp = 0L
            var i = 1
            while (i < nf && i - 1 < 64) {
              if (e(i) > e(i - 1)) fp |= 1L << (i - 1)
              i += 1
            }
            AudioFpRow(id, ok = true, Some(nf), Some(fp))
          case None => AudioFpRow(id, ok = false, None, None)
        }
      }
    }.toDF()
  }

  /** Shot/scene-change detection over PPM-stream video: consecutive frames
    * are compared by integer raster distance Σ|a−b| over every byte, and a
    * scene boundary is declared where that distance exceeds
    * `threshold × n_bytes` (i.e. mean per-byte change > `threshold`, kept
    * as pure Long arithmetic so an external oracle reproduces it exactly).
    * Returns per video: frame count, scene count (= boundaries + 1; the
    * shot-sampling prior for frame extraction), total and max consecutive
    * distance (a motion-intensity signal). Partition-local mapPartitions —
    * the decode-heavy work never shuffles; corrupt payloads → ok=false. */
  def sceneChanges(media: DataFrame, threshold: Int = 64): DataFrame = {
    require(threshold >= 0)
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        Codecs.PpmStream.decode(payload) match {
          case Some(frames) if frames.nonEmpty =>
            var sumD = 0L
            var maxD = 0L
            var scenes = 1
            var f = 1
            while (f < frames.length) {
              val a = frames(f - 1).pixels
              val b = frames(f).pixels
              var d = 0L
              var i = 0
              val n = math.min(a.length, b.length)
              while (i < n) {
                d += math.abs((a(i) & 0xFF) - (b(i) & 0xFF)); i += 1
              }
              sumD += d
              if (d > maxD) maxD = d
              if (d > threshold.toLong * n) scenes += 1
              f += 1
            }
            SceneRow(id, ok = true, Some(frames.length), Some(scenes),
              Some(sumD), Some(maxD))
          case _ => SceneRow(id, ok = false, None, None, None, None)
        }
      }
    }.toDF()
  }

  /** Decimate WAV payloads by `factor` (every factor-th sample), re-encoded
    * as PCM-16 WAV with the divided sample rate. Partition-local. */
  def resampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1)
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        Codecs.Wav.decode(payload) match {
          case Some(a) =>
            val out = Codecs.decimate(a, factor)
            MediaRow(id, Codecs.Wav.encode(out),
              MediaMeta("audio/wav", 0, 0, 0, out.sampleRate))
          case None =>
            MediaRow(id, null, MediaMeta("corrupt", 0, 0, 0, 0))
        }
      }
    }.toDF()
  }
}
