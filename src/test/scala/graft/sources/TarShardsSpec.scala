package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard sink/source (sources/TarShards.scala). */
class TarShardsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_tar_spec").toString

  test("tarMember emits a valid ustar block that system tar can list") {
    val m = TarShards.tarMember("sample0.txt",
      "hello tar".getBytes(StandardCharsets.UTF_8))
    assert(m.length == 1024) // header + one padded data block
    val dir = tmp()
    val f = java.nio.file.Paths.get(s"$dir/one.tar")
    Files.write(f, m ++ new Array[Byte](1024))
    // the system tar is an independent implementation — listing it
    // validates header layout, checksum, magic, and size encoding
    val out = new StringBuilder
    val p = new ProcessBuilder("tar", "-tvf", f.toString)
      .redirectErrorStream(true).start()
    scala.io.Source.fromInputStream(p.getInputStream).getLines()
      .foreach(l => out.append(l).append('\n'))
    assert(p.waitFor() == 0, s"tar -tvf failed:\n$out")
    assert(out.toString.contains("sample0.txt"), out.toString)
  }

  test("parseTar inverts tarMember, including empty and multi-block data") {
    val members = Seq(
      "a.txt" -> "alpha".getBytes(StandardCharsets.UTF_8),
      "a.json" -> Array.empty[Byte],
      "b.bin" -> Array.tabulate(1300)(i => (i % 251).toByte))
    val archive = members.flatMap { case (n, d) =>
      TarShards.tarMember(n, d).toSeq }.toArray ++ new Array[Byte](1024)
    val parsed = TarShards.parseTar(archive)
    assert(parsed.map(_._1) == members.map(_._1))
    parsed.zip(members).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want)) }
  }

  test("parseTar rejects a corrupted header") {
    val m = TarShards.tarMember("x.txt", "data".getBytes)
    m(0) = 'y'.toByte // flip a name byte after checksumming
    val e = intercept[IllegalArgumentException](TarShards.parseTar(m))
    assert(e.getMessage.contains("checksum"))
  }

  test("write/read round-trip: every member survives, shard = hash contract") {
    val dir = tmp()
    val df = (0 until 200).flatMap { i =>
      Seq((f"k$i%04d", "txt", s"text $i"), (f"k$i%04d", "json", s"{$i}"))
    }.toDF("key", "ext", "body")
      .withColumn("body", col("body").cast("binary"))
    TarShards.write(df, col("key"), col("ext"), col("body"), 4, dir)
    assert((0 until 4).forall(sh =>
      Files.exists(java.nio.file.Paths.get(f"$dir/shard-$sh%05d.tar"))))
    val back = TarShards.read(spark, dir)
      .select(col("shard"), col("name"),
        col("content").cast("string").as("body"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(back.length == 400)
    // membership: shard must equal the Sampling bucket contract per key
    val wantShard = (0 until 200).map { i =>
      val k = f"k$i%04d"
      val h = {
        val b = k.getBytes(StandardCharsets.UTF_8)
        graft.expr.TextHash.hashBytes(b, 0, b.length, 0L)
      }
      k -> ((h & ((1L << 20) - 1)) % 4).toInt
    }.toMap
    back.foreach { case (sh, name, body) =>
      val key = name.takeWhile(_ != '.')
      assert(sh == wantShard(key), s"$name in shard $sh")
      if (name.endsWith(".txt"))
        assert(body == s"text ${key.drop(1).toInt}")
    }
  }

  test("writes are byte-deterministic across partitionings and re-runs") {
    val df17 = (0 until 300)
      .map(i => (s"k$i", "txt", s"payload $i")).toDF("k", "e", "b")
      .withColumn("b", col("b").cast("binary")).repartition(17)
    val df3 = df17.repartition(3)
    val d1 = tmp(); val d2 = tmp()
    TarShards.write(df17, col("k"), col("e"), col("b"), 5, d1)
    TarShards.write(df3, col("k"), col("e"), col("b"), 5, d2)
    (0 until 5).foreach { sh =>
      val a = Files.readAllBytes(
        java.nio.file.Paths.get(f"$d1/shard-$sh%05d.tar"))
      val b = Files.readAllBytes(
        java.nio.file.Paths.get(f"$d2/shard-$sh%05d.tar"))
      assert(java.util.Arrays.equals(a, b), s"shard $sh differs")
    }
  }

  test("writeStream lands each micro-batch as a complete deterministic layout") {
    val in = tmp(); val out = tmp(); val ckpt = tmp()
    val docs = (0 until 120)
      .map(i => (f"k$i%04d", "txt", s"payload $i".getBytes("UTF-8")))
      .toDF("k", "e", "b")
    docs.coalesce(3).write.parquet(s"$in/members.parquet")
    val stream = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$in/members.parquet")
    val q = TarShards.writeStream(stream, col("k"), col("e"), col("b"),
        2, out, Map("checkpointLocation" -> ckpt))
      .start()
    try { q.processAllAvailable() } finally q.stop()
    // every batch dir is a valid layout; the union of members == input
    val batches = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch-")).map(_.toString).sorted
    assert(batches.nonEmpty)
    val all = batches.flatMap(b => TarShards.read(spark, b)
      .select(col("name"), col("content").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))))
    assert(all.length == 120)
    assert(all.toSet == (0 until 120)
      .map(i => (f"k$i%04d.txt", s"payload $i")).toSet)
  }

  test("commit protocol: _SUCCESS gates read, stale shards are scrubbed") {
    val dir = tmp()
    val df = (0 until 40).map(i => (s"k$i", "txt", s"v$i"))
      .toDF("k", "e", "b").withColumn("b", col("b").cast("binary"))
    // a prior run with MORE shards...
    TarShards.write(df, col("k"), col("e"), col("b"), 6, dir)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/_SUCCESS")))
    // ...must not leak into a rewrite with fewer: exactly 3 remain
    TarShards.write(df, col("k"), col("e"), col("b"), 3, dir)
    val shards = new java.io.File(dir).listFiles()
      .map(_.getName).filter(n => n.startsWith("shard-") && n.endsWith(".tar"))
    assert(shards.length == 3, shards.mkString(","))
    assert(TarShards.read(spark, dir).count() == 40)
    // a layout whose job died before commit is refused
    Files.delete(java.nio.file.Paths.get(s"$dir/_SUCCESS"))
    val e = intercept[IllegalArgumentException] {
      TarShards.read(spark, dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
    // and a marker contradicting the shard files fails the cross-check
    Files.write(java.nio.file.Paths.get(s"$dir/_SUCCESS"),
      """{"nShards":7}""".getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[IllegalArgumentException] {
      TarShards.read(spark, dir)
    }
    assert(e2.getMessage.contains("7"))
  }

  test("empty input still lays out nShards terminator-only archives") {
    val dir = tmp()
    val empty = Seq.empty[(String, String, Array[Byte])].toDF("k", "e", "b")
    TarShards.write(empty, col("k"), col("e"), col("b"), 3, dir)
    assert(TarShards.read(spark, dir).count() == 0)
    (0 until 3).foreach { sh =>
      assert(Files.size(
        java.nio.file.Paths.get(f"$dir/shard-$sh%05d.tar")) == 1024)
    }
  }
}
