package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Commit protocol shared by the shard-file sinks ([[TarShards]],
  * [[RecordShards]]) — a partially failed job must never be mistaken for
  * a complete layout, and stale shards from a prior run with a different
  * nShards must never leak into a re-read:
  *
  *  1. [[prepare]]: scrub every `shard-*<ext>*` artifact and marker from
  *     the directory, then drop a `_STARTED` marker;
  *  2. tasks [[taskCheck]] that the directory (with `_STARTED`) is
  *     visible — the sinks write through java.nio, so in cluster mode the
  *     path must be a mount shared between driver and executors; without
  *     one, data would land on executor-local disks while the driver sees
  *     placeholders — then stream each shard to an attempt-unique temp
  *     name and [[commitShard]] it with an ATOMIC_MOVE. Shard bytes are a
  *     deterministic function of the data, so a speculative or retried
  *     attempt produces identical bytes and the last rename winning is
  *     harmless;
  *  3. [[finish]]: fill hash-empty shards, scrub orphaned attempt temps
  *     (a task killed mid-write never reaches commitShard; its temp is
  *     superseded by the retry's committed rename), verify exactly
  *     nShards files, and only then write `_SUCCESS` (recording
  *     nShards). [[checkRead]] refuses a directory without it.
  */
private[sources] object ShardCommit {
  val StartedMarker = "_STARTED"
  val SuccessMarker = "_SUCCESS"

  def shardName(sh: Int, ext: String): String = f"shard-$sh%05d$ext"

  def prepare(dir: String, ext: String): Unit = {
    val dirPath = Paths.get(dir)
    Files.createDirectories(dirPath)
    withDirListing(dir) { it =>
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if ((n.startsWith("shard-") && n.contains(ext)) ||
            n == StartedMarker || n == SuccessMarker)
          Files.delete(p)
      }
    }
    Files.write(dirPath.resolve(StartedMarker), Array.empty[Byte])
  }

  def taskCheck(dir: String, sink: String): Unit =
    if (!Files.exists(Paths.get(dir, StartedMarker)))
      throw new IllegalStateException(
        s"$sink: $dir (with its $StartedMarker marker) is not visible " +
          "from this task — the sink needs a filesystem shared between " +
          "driver and executors (local mode, NFS, or a fuse-mounted " +
          "object store)")

  def tmpPath(dir: String, sh: Int, ext: String,
      attempt: Long): java.nio.file.Path =
    Paths.get(s"$dir/${shardName(sh, ext)}.tmp-$attempt")

  def commitShard(dir: String, sh: Int, ext: String, attempt: Long): Unit =
    Files.move(tmpPath(dir, sh, ext, attempt),
      Paths.get(dir, shardName(sh, ext)),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

  /** `Files.list` holds a directory file descriptor until the stream is
    * closed — iterate under try/finally so finish() can't leak one per
    * call. */
  private def withDirListing[A](dir: String)(
      f: java.util.Iterator[java.nio.file.Path] => A): A = {
    val s = Files.list(Paths.get(dir))
    try f(s.iterator()) finally s.close()
  }

  def finish(dir: String, nShards: Int, ext: String, sink: String,
      emptyShard: Array[Byte]): Unit = {
    // Scrub orphaned attempt temps BEFORE the empty-shard fill, so "the
    // committed shard exists" still distinguishes the two temp origins:
    // a temp whose shard-NNNNN was committed is a killed/speculative
    // attempt superseded by its retry's atomic rename (scrub, logged);
    // a temp whose shard was NEVER committed means a writer died and no
    // retry landed — that is a failed job, not housekeeping, so fail
    // loudly instead of deleting the only evidence.
    var scrubbed = 0
    withDirListing(dir) { tmpIt =>
      while (tmpIt.hasNext) {
        val p = tmpIt.next()
        val n = p.getFileName.toString
        val tmpAt = n.indexOf(s"$ext.tmp-")
        if (tmpAt >= 0) {
          val committed = Paths.get(dir, n.substring(0, tmpAt + ext.length))
          require(Files.exists(committed),
            s"$sink: orphaned temp $n has no committed ${
              committed.getFileName} — a writer never committed this shard")
          System.err.println(s"[$sink] scrubbing superseded attempt temp $n")
          Files.delete(p)
          scrubbed += 1
        }
      }
    }
    if (scrubbed > 0)
      System.err.println(s"[$sink] scrubbed $scrubbed superseded temp(s)")
    (0 until nShards).foreach { sh =>
      val p = Paths.get(dir, shardName(sh, ext))
      if (!Files.exists(p)) Files.write(p, emptyShard)
    }
    var nFinal = 0
    withDirListing(dir) { it =>
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("shard-") && n.endsWith(ext)) nFinal += 1
      }
    }
    require(nFinal == nShards,
      s"$sink: expected $nShards shard files, found $nFinal")
    Files.delete(Paths.get(dir, StartedMarker))
    Files.write(Paths.get(dir, SuccessMarker),
      s"""{"nShards":$nShards}""".getBytes(StandardCharsets.UTF_8))
  }

  def checkRead(dir: String, ext: String, sink: String): Unit = {
    val marker = Paths.get(dir, SuccessMarker)
    require(Files.exists(marker),
      s"$sink: no $SuccessMarker in $dir — the layout was not committed " +
        "(job failed mid-write, or dir is not this sink's output)")
    val recorded = {
      val s = new String(Files.readAllBytes(marker), StandardCharsets.UTF_8)
      "\"nShards\":(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    }
    var present = 0
    withDirListing(dir) { it =>
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("shard-") && n.endsWith(ext)) present += 1
      }
    }
    recorded.foreach(r => require(r == present,
      s"$sink: $SuccessMarker records $r shards but $present shard " +
        s"files are present in $dir"))
  }
}
