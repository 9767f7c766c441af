package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** TFRecord-compatible record shard sink/source
  * (sources/RecordShards.scala). */
class RecordShardsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_rec_spec").toString

  test("record framing matches the public TFRecord spec by hand") {
    // Known-answer: empty payload. length = 0 (8 zero bytes LE);
    // crc32c of 8 zero bytes = 0x8c28b28a (independently recomputed with
    // the reflected 0x82F63B78 polynomial), masked per the spec:
    // ((c>>>15)|(c<<17)) + 0xa282ead8 = 0x07980329
    val r = RecordShards.record(Array.empty[Byte])
    assert(r.length == 16)
    val bb = java.nio.ByteBuffer.wrap(r)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getLong(0) == 0L)
    assert(bb.getInt(8) == 0x07980329)
    // crc32c of empty data = 0, masked = 0xa282ead8
    assert(bb.getInt(12) == 0xa282ead8)
  }

  test("parseRecords inverts record, multi-record streams, CRC rejects") {
    val payloads = Seq("", "x", "hello world", "a" * 1000)
      .map(_.getBytes(StandardCharsets.UTF_8))
    val stream = payloads.map(RecordShards.record).reduce(_ ++ _)
    val back = RecordShards.parseRecords(stream)
    assert(back.map(new String(_, StandardCharsets.UTF_8)) ==
      payloads.map(new String(_, StandardCharsets.UTF_8)))
    // flip a payload byte → payload-CRC failure
    val corrupt = stream.clone()
    corrupt(12) = (corrupt(12) ^ 1).toByte
    val e = intercept[IllegalArgumentException] {
      RecordShards.parseRecords(corrupt)
    }
    assert(e.getMessage.contains("CRC"))
    // truncate mid-record → truncation failure
    val e2 = intercept[IllegalArgumentException] {
      RecordShards.parseRecords(stream.dropRight(2))
    }
    assert(e2.getMessage.toLowerCase.contains("trunc"))
  }

  test("write/read round-trip: membership, order, and _SUCCESS gating") {
    val dir = tmp()
    val df = (0 until 200)
      .map(i => (f"k$i%04d", s"payload $i".getBytes("UTF-8")))
      .toDF("key", "body")
    RecordShards.write(df, col("key"), col("body"), 4, dir)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/_SUCCESS")))
    val back = RecordShards.read(spark, dir)
      .select(col("shard"), col("pos"),
        col("record").cast("string").as("body"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(back.length == 200)
    // shard = hash bucket contract; pos = key-sorted order within shard
    val wantShard = (0 until 200).map { i =>
      val k = f"k$i%04d"
      val b = k.getBytes(StandardCharsets.UTF_8)
      val h = graft.expr.TextHash.hashBytes(b, 0, b.length, 0L)
      k -> ((h & ((1L << 20) - 1)) % 4).toInt
    }.toMap
    back.foreach { case (sh, _, body) =>
      val i = body.drop("payload ".length).toInt
      assert(sh == wantShard(f"k$i%04d"), s"row $i in shard $sh")
    }
    back.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toList == sorted.indices.toList)
      // key order == payload-index order for this fixture
      val keys = sorted.map(r => f"k${r._3.drop(8).toInt}%04d")
      assert(keys.toList == keys.sorted.toList)
    }
    // uncommitted layout is refused
    Files.delete(java.nio.file.Paths.get(s"$dir/_SUCCESS"))
    val e = intercept[IllegalArgumentException] {
      RecordShards.read(spark, dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("writes are byte-deterministic across partitionings and re-runs") {
    val df17 = (0 until 300)
      .map(i => (s"k$i", s"payload $i".getBytes("UTF-8"))).toDF("k", "b")
      .repartition(17)
    val df3 = df17.repartition(3)
    val d1 = tmp(); val d2 = tmp()
    RecordShards.write(df17, col("k"), col("b"), 5, d1)
    RecordShards.write(df3, col("k"), col("b"), 5, d2)
    (0 until 5).foreach { sh =>
      val a = Files.readAllBytes(
        java.nio.file.Paths.get(f"$d1/shard-$sh%05d.tfrecord"))
      val b = Files.readAllBytes(
        java.nio.file.Paths.get(f"$d2/shard-$sh%05d.tfrecord"))
      assert(java.util.Arrays.equals(a, b), s"shard $sh differs")
    }
  }

  test("empty input commits nShards empty files; stale shards scrubbed") {
    val dir = tmp()
    val df = (0 until 20).map(i => (s"k$i", Array[Byte](i.toByte)))
      .toDF("k", "b")
    RecordShards.write(df, col("k"), col("b"), 6, dir)
    // rewrite with fewer shards: the 6-shard layout must not leak
    val empty = Seq.empty[(String, Array[Byte])].toDF("k", "b")
    RecordShards.write(empty, col("k"), col("b"), 2, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tfrecord"))
    assert(files.length == 2, files.mkString(","))
    assert(RecordShards.read(spark, dir).count() == 0)
    (0 until 2).foreach { sh =>
      assert(Files.size(
        java.nio.file.Paths.get(f"$dir/shard-$sh%05d.tfrecord")) == 0)
    }
  }

  test("writeStream lands each micro-batch as a committed layout") {
    val in = tmp(); val out = tmp(); val ckpt = tmp()
    val docs = (0 until 90)
      .map(i => (f"k$i%04d", s"payload $i".getBytes("UTF-8")))
      .toDF("k", "b")
    docs.coalesce(3).write.parquet(s"$in/members.parquet")
    val stream = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$in/members.parquet")
    val q = RecordShards.writeStream(stream, col("k"), col("b"),
        2, out, Map("checkpointLocation" -> ckpt))
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val batches = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch-")).map(_.toString).sorted
    assert(batches.nonEmpty)
    val all = batches.flatMap(b => RecordShards.read(spark, b)
      .select(col("record").cast("string")).collect().map(_.getString(0)))
    assert(all.length == 90)
    assert(all.toSet == (0 until 90).map(i => s"payload $i").toSet)
  }
}
