package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord-compatible length-prefixed record shards — the OTHER loader
  * format big training pipelines consume (alongside [[TarShards]]'
  * WebDataset tars): a flat stream of
  *
  *   uint64-LE length | masked-crc32c(length bytes) | payload |
  *   masked-crc32c(payload)
  *
  * records, per the public TFRecord framing (mask(crc) =
  * ((crc >> 15) | (crc << 17)) + 0xa282ead8, CRC-32C/Castagnoli —
  * `java.util.zip.CRC32C`). Files written here load in any TFRecord
  * reader; [[read]] verifies both CRCs per record, so truncation or
  * bit-rot fails loudly instead of yielding garbage tensors.
  *
  * Same determinism and scale contract as [[TarShards]]: shard membership
  * is a pure hash of the key ([[Shards]] bucket grid), records sort by
  * key within a shard, ONE shuffle keyed by shard, each task streams
  * records straight to the filesystem under the [[ShardCommit]] protocol
  * (temp names + atomic rename, `_SUCCESS` gating reads). Re-runs
  * reproduce every shard byte-for-byte.
  */
object RecordShards {

  private val Ext = ".tfrecord"

  /** TFRecord's masked CRC-32C (public spec). */
  private[sources] def maskedCrc(bytes: Array[Byte], off: Int,
      len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Frame one payload: length + masked length-CRC + data + data-CRC. */
  private[sources] def record(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + 4 + data.length + 4)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(data.length.toLong)
    bb.putInt(maskedCrc(out, 0, 8))
    bb.put(data)
    bb.putInt(maskedCrc(data, 0, data.length))
    out
  }

  /** Parse a whole shard back into payloads, verifying both CRCs and the
    * framing (a length running past EOF means truncation). */
  private[sources] def parseRecords(
      bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 0
    while (off < bytes.length) {
      require(off + 12 <= bytes.length,
        s"truncated record header at offset $off")
      val len = bb.getLong(off)
      require(len >= 0 && off + 12 + len + 4 <= bytes.length,
        s"record at offset $off claims $len bytes past EOF (truncation?)")
      require(bb.getInt(off + 8) == maskedCrc(bytes, off, 8),
        s"length-CRC mismatch at offset $off")
      val data = java.util.Arrays.copyOfRange(bytes, off + 12,
        off + 12 + len.toInt)
      require(bb.getInt(off + 12 + len.toInt) ==
          maskedCrc(data, 0, data.length),
        s"payload-CRC mismatch at offset $off")
      out += data
      off += 12 + len.toInt + 4
    }
    out.toSeq
  }

  /** Write rows as TFRecord shards `shard-00000.tfrecord …` under `dir`
    * (commit protocol, determinism, and cluster-mode caveats: see
    * [[ShardCommit]] / [[TarShards.write]]).
    *
    * @param df      rows to write
    * @param keyCol  shard/order key (hash → shard; records sort by key)
    * @param dataCol record payload (binary)
    * @param nShards shard count
    */
  def write(df: DataFrame, keyCol: Column, dataCol: Column,
      nShards: Int, dir: String): Unit = {
    require(nShards >= 1, "nShards must be >= 1")
    ShardCommit.prepare(dir, Ext)
    val rows = df.select(
        (graft.ops.Sampling.bucket(keyCol) % nShards).cast("int").as("__sh"),
        keyCol.cast("string").as("__k"),
        dataCol.cast("binary").as("__d"))
      .where(col("__k").isNotNull)
      .repartition(nShards, col("__sh"))
      .sortWithinPartitions(col("__sh"), col("__k"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      ShardCommit.taskCheck(dir, "RecordShards.write")
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var cur = -1
      var out: java.io.OutputStream = null
      def finish(): Unit = if (out != null) {
        out.close()
        ShardCommit.commitShard(dir, cur, Ext, attempt)
      }
      def roll(sh: Int): Unit = {
        finish()
        out = java.nio.file.Files.newOutputStream(
          ShardCommit.tmpPath(dir, sh, Ext, attempt))
        cur = sh
      }
      it.foreach { r =>
        val sh = r.getInt(0)
        if (sh != cur) roll(sh)
        val data = if (r.isNullAt(2)) Array.empty[Byte]
          else r.getAs[Array[Byte]](2)
        out.write(record(data))
      }
      finish()
    }
    // an empty TFRecord shard is an empty file
    ShardCommit.finish(dir, nShards, Ext, "RecordShards.write",
      Array.empty[Byte])
  }

  /** Streaming variant, mirroring [[TarShards.writeStream]]: each
    * micro-batch lands as a complete committed layout under
    * `dir/batch-<id>/`; determinism + `_SUCCESS` give consumers
    * exactly-once output from at-least-once execution. */
  def writeStream(df: DataFrame, keyCol: Column, dataCol: Column,
      nShards: Int, dir: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    df.writeStream.options(options)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        write(batch, keyCol, dataCol, nShards, f"$dir/batch-$batchId%05d")
      }
  }

  /** Read record shards back: (shard, pos, record) — `pos` is the
    * record's 0-based position within its shard (the write order, i.e.
    * key-sorted). Whole-file reads via binaryFile; requires [[write]]'s
    * `_SUCCESS`. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ShardCommit.checkRead(dir, Ext, "RecordShards.read")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"shard-*$Ext").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = "shard-(\\d+)\\.tfrecord".r.findFirstMatchIn(path)
          .map(_.group(1).toInt).getOrElse(-1)
        parseRecords(bytes).zipWithIndex.map { case (d, i) =>
          (shard, i, d)
        }
      }
      .toDF("shard", "pos", "record")
  }
}
