package graft.media

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spark-level media pipeline tests over real codecs: metadata parsing,
  * feature extraction, resize/transcode, frame sampling, audio stats —
  * all on synthetic deterministic payloads derived from doc ids. */
class MediaOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ids: DataFrame =
    spark.read.parquet(sf("documents")).select("doc_id")

  private lazy val images: DataFrame = Media.asMediaTable(
    ids.as[Long].map(id => (id, MediaGen.imagePayload(id)))
      .toDF("doc_id", "payload"), "doc_id", "payload").cache()

  test("asMediaTable parses real per-format metadata from payload headers") {
    assert(images.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val metas = images.select("media_id", "meta.format", "meta.width",
      "meta.height").collect()
    assert(metas.length > 0)
    metas.foreach { r =>
      val id = r.getLong(0)
      if (id % 97 == 0) assert(r.getString(1) == "corrupt")
      else {
        val expected = id % 3 match {
          case 0 => "image/bmp"
          case 1 => "image/ppm"
          case _ => "image/pgm"
        }
        assert(r.getString(1) == expected, s"id=$id")
        assert(r.getInt(2) == MediaGen.imgWidth(id), s"id=$id")
        assert(r.getInt(3) == MediaGen.imgHeight(id), s"id=$id")
      }
    }
  }

  test("extractFeatures: real decode, partition-invariant, corrupt rows flagged") {
    val f1 = Media.extractFeatures(images).orderBy("media_id").collect()
    val f2 = Media.extractFeatures(images.repartition(7)).orderBy("media_id").collect()
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    f1.foreach { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      if (id % 97 == 0) {
        assert(!r.getBoolean(r.fieldIndex("ok")))
        assert(r.isNullAt(r.fieldIndex("features")))
      } else {
        assert(r.getBoolean(r.fieldIndex("ok")))
        val feats = r.getSeq[Double](r.fieldIndex("features"))
        assert(feats.length == 8)
        val img = MediaGen.image(id)
        assert(feats == Media.imageFeatures(img).toSeq, s"id=$id")
        assert(r.getLong(r.fieldIndex("checksum")) == Media.imageChecksum(img))
        // channel means of RGB arms differ per channel; gray arm equal
        if (id % 3 == 2) assert(feats(4) == feats(5) && feats(5) == feats(6))
      }
    }
  }

  test("resize: NN downsample + transcode to PPM/PGM, dims from real parse") {
    val r = Media.resize(images, 2).orderBy("media_id").collect()
    r.foreach { row =>
      val id = row.getLong(0)
      val meta = row.getStruct(row.fieldIndex("meta"))
      if (id % 97 == 0) {
        assert(meta.getString(0) == "corrupt" && row.isNullAt(1))
      } else {
        val src = MediaGen.image(id)
        val want = Codecs.resizeNearest(src, 2)
        // BMP inputs come back transcoded to PPM
        assert(meta.getString(0) == (if (src.channels == 3) "image/ppm" else "image/pgm"))
        assert(meta.getInt(1) == want.width && meta.getInt(2) == want.height)
        val dec = Codecs.Ppm.decode(row.getAs[Array[Byte]]("payload")).get
        assert(dec.pixels.toSeq == want.pixels.toSeq, s"id=$id")
      }
    }
  }

  test("sampleFrames: real frame boundaries, even stride, checksums") {
    val videos = Media.asMediaTable(
      ids.as[Long].map(id => (id, MediaGen.videoPayload(id)))
        .toDF("doc_id", "payload"), "doc_id", "payload")
    val rows = Media.sampleFrames(videos, 2).orderBy("media_id", "frame_index")
      .collect()
    val byId = rows.groupBy(_.getLong(0))
    byId.foreach { case (id, rs) =>
      val n = MediaGen.nFrames(id)
      val stride = math.max(1, (n + 1) / 2)
      val wantSrc = (0 until 2).map(_ * stride).filter(_ < n)
      assert(rs.map(_.getInt(rs.head.fieldIndex("src_frame"))).toSeq == wantSrc)
      rs.foreach { r =>
        val frames = Codecs.PpmStream.decode(MediaGen.videoPayload(id)).get
        val src = frames(r.getInt(r.fieldIndex("src_frame")))
        assert(r.getLong(r.fieldIndex("checksum")) == Media.imageChecksum(src))
        // frame_bytes is a standalone decodable PPM of that frame
        val rt = Codecs.Ppm.decode(r.getAs[Array[Byte]]("frame_bytes")).get
        assert(rt.pixels.toSeq == src.pixels.toSeq)
      }
    }
  }

  test("imagePhash: bit-exact vs direct computation; near-identical → small hamming") {
    val ph = Media.imagePhashes(images).where(col("ok"))
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph.nonEmpty)
    ph.foreach { case (id, h) =>
      assert(h == Media.imagePhash(MediaGen.image(id)), s"id=$id")
    }
    // flipping ONE pixel of a larger image moves few grid cells → small
    // hamming distance; a different image is far
    val base = MediaGen.image(1L)
    val onePixel = base.copy(pixels = {
      val p = base.pixels.clone(); p(0) = ((p(0) ^ 0x7f).toByte); p
    })
    val dNear = java.lang.Long.bitCount(
      Media.imagePhash(base) ^ Media.imagePhash(onePixel))
    val dFar = java.lang.Long.bitCount(
      Media.imagePhash(base) ^ Media.imagePhash(MediaGen.image(17L)))
    assert(dNear <= 16, s"one-pixel change moved $dNear bits")
    assert(dFar > dNear, s"near=$dNear far=$dFar")
  }

  test("audioStats + resampleAudio: rate, counts, decimation round-trip") {
    val wavs = Media.asMediaTable(
      ids.as[Long].map(id => (id, MediaGen.wavPayload(id)))
        .toDF("doc_id", "payload"), "doc_id", "payload")
    assert(wavs.select("meta.sample_rate").as[Int].collect()
      .zip(wavs.select("media_id").as[Long].collect())
      .forall { case (r, id) => r == MediaGen.wavRate(id) })
    val st = Media.audioStats(wavs).collect()
    st.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1))
      assert(r.getInt(r.fieldIndex("sample_rate")) == MediaGen.wavRate(id))
      assert(r.getInt(r.fieldIndex("n_samples")) == MediaGen.wavSamples(id))
      // recompute reference stats straight from the generator
      val samples = (0 until MediaGen.wavSamples(id)).map(MediaGen.sample(id, _))
      assert(r.getLong(r.fieldIndex("sum_abs")) ==
        samples.map(s => math.abs(s.toLong)).sum)
      assert(r.getLong(r.fieldIndex("n_cross")) ==
        samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)))
    }
    val res = Media.resampleAudio(wavs, 2).collect()
    res.foreach { row =>
      val id = row.getLong(0)
      val a = Codecs.Wav.decode(row.getAs[Array[Byte]]("payload")).get
      assert(a.sampleRate == MediaGen.wavRate(id) / 2)
      assert(a.samples.length == (MediaGen.wavSamples(id) + 1) / 2)
      assert(a.samples.zipWithIndex.forall { case (s, i) =>
        s == MediaGen.sample(id, 2 * i) })
    }
  }
}
