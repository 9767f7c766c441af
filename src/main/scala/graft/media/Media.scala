package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.TextHash

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
  * STUB NOTE: this container has no image/audio codecs, so
  * [[MediaCodecs.decodeStub]] is a clearly-marked deterministic fake (feature
  * vector derived from the payload's rolling hash). The Spark-side plumbing —
  * schema, metadata, batch shape, partitioning, downstream similarity over
  * the extracted features — is real and tested; swap `decodeStub` for a real
  * codec (e.g. javax.imageio / ffmpeg JNI) to productionize.
  */
object MediaCodecs {
  /** Feature dimension of the stub decoder (kept small; real models emit
    * 512–4096 dims — the plumbing is dimension-agnostic). */
  val FeatureDim = 16

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Real implementation would decode pixels/samples and run a feature
    * extractor; this fake preserves the contract (pure function of bytes,
    * fixed output dim, non-zero norm for non-empty payloads). */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (payload != null && payload.length > 0) {
      var i = 0
      while (i < FeatureDim) {
        val h = TextHash.hashBytes(payload, 0, payload.length, i.toLong)
        out(i) = ((h >> 11).toDouble / (1L << 52).toDouble).toFloat // [-1, 1)
        i += 1
      }
    }
    out
  }

  /** STUB resize: deterministic payload downsample by `factor` (every
    * factor-th byte) — stands in for an image/audio resample; preserves the
    * contract (pure function of bytes, output length = ceil(len/factor)). */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    if (payload == null || payload.length == 0) Array.emptyByteArray
    else {
      val out = new Array[Byte]((payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = payload(i * factor); i += 1 }
      out
    }
  }

  /** STUB frame sampler: returns `n` deterministic "frames" (byte slices) of
    * a video payload — stands in for keyframe extraction. */
  def sampleFramesStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.length == 0 || n <= 0) Seq.empty
    else {
      val stride = math.max(1, payload.length / n)
      (0 until math.min(n, payload.length)).map { i =>
        val from = i * stride
        java.util.Arrays.copyOfRange(payload, from,
          math.min(payload.length, from + stride))
      }
    }
  }
}

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

  /** Wrap an arbitrary (id, binary) DataFrame into the canonical media
    * schema, synthesizing metadata from the payload. */
  def asMediaTable(df: DataFrame, idCol: String, binCol: String,
      format: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(binCol).cast(BinaryType).as("payload"))
      .withColumn("meta", struct(
        lit(format).as("format"),
        lit(0).as("width"), lit(0).as("height"),
        lit(1).as("n_frames"), lit(0).as("sample_rate")))

  /** Decode + feature-extract: partition-local batches, one feature vector
    * per media row. Output: (media_id, format, n_bytes, features). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getStruct(r.fieldIndex("meta"))
        val fmt = if (meta != null) meta.getString(0) else null
        val feats = MediaCodecs.decodeStub(payload)
        (id, fmt, if (payload == null) 0 else payload.length, feats)
      }
    }.toDF("media_id", "format", "n_bytes", "features")
  }

  /** Resize every payload by `factor` (stubbed codec), keeping the media
    * schema — partition-local batch transform, no shuffle; metadata width/
    * height scale down with the payload. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getStruct(r.fieldIndex("meta"))
        val resized = MediaCodecs.resizeStub(payload, factor)
        (id, resized,
          if (meta == null) null
          else (meta.getString(0), meta.getInt(1) / factor, meta.getInt(2) / factor,
            meta.getInt(3), meta.getInt(4)))
      }
    }.toDF("media_id", "payload", "m")
      .select(col("media_id"), col("payload"), struct(
        col("m._1").as("format"), col("m._2").as("width"), col("m._3").as("height"),
        col("m._4").as("n_frames"), col("m._5").as("sample_rate")).as("meta"))
  }

  /** Frame-sample a video media table into one row per sampled frame
    * (media_id, frame_index, frame_bytes) — partition-local, no shuffle. */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    val ds: Dataset[Row] = media
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(r.fieldIndex("media_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        MediaCodecs.sampleFramesStub(payload, framesPerVideo)
          .zipWithIndex.map { case (frame, i) => (id, i, frame) }
      }
    }.toDF("media_id", "frame_index", "frame_bytes")
  }
}
