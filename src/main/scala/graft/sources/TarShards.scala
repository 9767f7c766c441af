package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the interchange format multimodal
  * training pipelines actually consume (a tar of `<key>.<ext>` members;
  * samples are the groups sharing a key, shards are plain tar files a
  * dataloader streams sequentially).
  *
  * The writer emits POSIX ustar archives from first principles (512-byte
  * headers, octal sizes, checksum-over-spaces, two-zero-block
  * terminator) — no codec dependencies — and is fully DETERMINISTIC:
  * fixed mode/uid/gid/mtime, members sorted by (key, ext), shard
  * membership a pure hash of the key (the [[Shards]] bucket contract).
  * Re-running the pipeline reproduces every shard byte-for-byte, so
  * shard-level checksums are meaningful receipts.
  *
  * Scale shape: ONE shuffle keyed by shard (with the same
  * sortWithinPartitions layout discipline as [[Shards.writeShards]]);
  * each task streams its shards' members straight to the filesystem —
  * nothing aggregates in memory beyond one member. Readers get
  * whole-file streaming via Spark's binaryFile source; keep shards under
  * ~1 GB (the usual WebDataset sizing) — shard COUNT, not shard size, is
  * the scaling axis.
  */
object TarShards {

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
    padded.getBytes(StandardCharsets.US_ASCII)
  }

  /** One ustar member: header block + data padded to 512. Deterministic
    * metadata (mode 0644, uid/gid 0, mtime 0). */
  private[sources] def tarMember(name: String,
      data: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100,
      s"tar member name longer than 100 bytes: $name")
    val header = new Array[Byte](BlockSize)
    System.arraycopy(nameBytes, 0, header, 0, nameBytes.length)
    System.arraycopy(octal(420, 8), 0, header, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, header, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, header, 116, 8) // gid
    System.arraycopy(octal(data.length.toLong, 12), 0, header, 124, 12)
    System.arraycopy(octal(0, 12), 0, header, 136, 12) // mtime
    java.util.Arrays.fill(header, 148, 156, ' '.toByte) // chksum spaces
    header(156) = '0' // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes(StandardCharsets.US_ASCII),
      0, header, 257, 8) // magic + version
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += header(i) & 0xff; i += 1 }
    val ck = java.lang.Long.toOctalString(sum)
    val ckPad = ("0" * (6 - ck.length)) + ck
    System.arraycopy(ckPad.getBytes(StandardCharsets.US_ASCII), 0,
      header, 148, 6)
    header(154) = 0
    header(155) = ' '.toByte
    val padded = (data.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    System.arraycopy(header, 0, out, 0, BlockSize)
    System.arraycopy(data, 0, out, BlockSize, data.length)
    out
  }

  /** Parse a whole tar archive into (name, data) members. Tolerates a
    * missing terminator (EOF ends the archive); checks the stored
    * checksum so corruption fails loudly instead of yielding garbage. */
  private[sources] def parseTar(
      bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var off = 0
    while (off + BlockSize <= bytes.length && bytes(off) != 0) {
      var nameEnd = off
      while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, off, nameEnd - off, StandardCharsets.UTF_8)
      val sizeStr = new String(bytes, off + 124, 12,
        StandardCharsets.US_ASCII).takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(
        if (sizeStr.isEmpty) "0" else sizeStr, 8).toInt
      val storedCk = {
        val s = new String(bytes, off + 148, 8, StandardCharsets.US_ASCII)
          .takeWhile(c => c >= '0' && c <= '7')
        java.lang.Long.parseLong(if (s.isEmpty) "0" else s, 8)
      }
      var sum = 0L
      var i = 0
      while (i < BlockSize) {
        sum += (if (i >= 148 && i < 156) ' '.toByte
                else bytes(off + i)) & 0xff
        i += 1
      }
      require(sum == storedCk,
        s"tar checksum mismatch at offset $off (member '$name')")
      val dataOff = off + BlockSize
      out += name -> java.util.Arrays.copyOfRange(bytes, dataOff,
        dataOff + size)
      off = dataOff + (size + BlockSize - 1) / BlockSize * BlockSize
    }
    out.toSeq
  }

  /** Write rows as WebDataset tar shards `shard-00000.tar … `under `dir`,
    * under the [[ShardCommit]] protocol: prepare scrubs stale shards and
    * markers, tasks stream each shard to an attempt-unique temp name and
    * atomically rename on completion (deterministic bytes make retry
    * races harmless), and `_SUCCESS` — which [[read]] requires — is
    * written only after the driver verifies the complete layout. Tasks
    * fail fast when `dir` is not a mount shared with the driver.
    *
    * @param df      rows to write
    * @param keyCol  sample key (member names become `<key>.<ext>`)
    * @param extCol  member extension (string, e.g. "txt", "json", "jpg")
    * @param dataCol member payload (binary)
    * @param nShards shard count (hash of key → shard, engine-stable)
    */
  def write(df: DataFrame, keyCol: Column, extCol: Column, dataCol: Column,
      nShards: Int, dir: String): Unit = {
    require(nShards >= 1, "nShards must be >= 1")
    ShardCommit.prepare(dir, ".tar")
    val rows = df.select(
        (graft.ops.Sampling.bucket(keyCol) % nShards).cast("int").as("__sh"),
        keyCol.cast("string").as("__k"), extCol.cast("string").as("__e"),
        dataCol.cast("binary").as("__d"))
      .where(col("__k").isNotNull && col("__e").isNotNull)
      .repartition(nShards, col("__sh"))
      .sortWithinPartitions(col("__sh"), col("__k"), col("__e"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      ShardCommit.taskCheck(dir, "TarShards.write")
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      // hash partitioning may co-locate several shard values (or none):
      // stream members, rolling to a new tar whenever the shard changes —
      // the sort guarantees each shard is contiguous
      var cur = -1
      var out: java.io.OutputStream = null
      def finish(): Unit = if (out != null) {
        out.write(new Array[Byte](2 * BlockSize))
        out.close()
        ShardCommit.commitShard(dir, cur, ".tar", attempt)
      }
      def roll(sh: Int): Unit = {
        finish()
        out = java.nio.file.Files.newOutputStream(
          ShardCommit.tmpPath(dir, sh, ".tar", attempt))
        cur = sh
      }
      it.foreach { r =>
        val sh = r.getInt(0)
        if (sh != cur) roll(sh)
        val data = if (r.isNullAt(3)) Array.empty[Byte]
          else r.getAs[Array[Byte]](3)
        out.write(tarMember(s"${r.getString(1)}.${r.getString(2)}", data))
      }
      finish()
    }
    // hash-empty shards still exist as terminator-only archives (trainers
    // index by shard number); _SUCCESS lands last
    ShardCommit.finish(dir, nShards, ".tar", "TarShards.write",
      new Array[Byte](2 * BlockSize))
  }

  /** Streaming variant of [[write]]: each micro-batch lands as its own
    * complete WebDataset layout under `dir/batch-<id>/` (append-only —
    * re-writing a tar member in place is not a thing; trainers consume
    * batch directories in order, or a compaction job re-shards). The
    * per-batch write keeps [[write]]'s determinism AND its commit
    * protocol, so replaying a batch after a failure reproduces its
    * directory byte-for-byte and a killed batch leaves no `_SUCCESS` —
    * consumers that honor the marker get exactly-once output from
    * at-least-once execution.
    *
    * Caller starts/stops the returned query (set checkpointLocation via
    * `options`). */
  def writeStream(df: DataFrame, keyCol: Column, extCol: Column,
      dataCol: Column, nShards: Int, dir: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    df.writeStream.options(options)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        write(batch, keyCol, extCol, dataCol, nShards,
          f"$dir/batch-$batchId%05d")
      }
  }

  /** Read tar shards back: (shard, name, content) — one row per member.
    * Whole-file reads via binaryFile (shards sized ~≤1 GB by contract).
    * Refuses a directory without [[write]]'s `_SUCCESS` marker (a
    * partially failed job's output is indistinguishable from a complete
    * layout by file inspection alone) and cross-checks the shard count
    * the marker recorded. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ShardCommit.checkRead(dir, ".tar", "TarShards.read")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "shard-*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        parseTar(bytes).map { case (n, d) => (shard, n, d) }
      }
      .toDF("shard", "name", "content")
  }
}
