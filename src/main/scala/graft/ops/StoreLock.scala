package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Writer protection for the small persisted stores
  * ([[Preference.updatePairStore]], [[SketchStore.updateCms]]) — the
  * read-merge-overwrite lifecycle is only a monoid fold if exactly one
  * writer runs it at a time, and "single writer per store path" was
  * previously a documented contract with no teeth: a second concurrent
  * writer would read the same old state, and the last overwrite would
  * silently drop the other's batch. The [[ShardCommit]] analogue for
  * stores that are REPLACED rather than sharded.
  *
  *  - [[withLock]] makes the contract load-bearing: a `<store>.lock`
  *    file is created with `FileSystem.create(…, overwrite = false)` —
  *    atomic on HDFS and object-store semantics that support
  *    if-none-match; best-effort (exists-then-create) on the raw local
  *    FS — so a second writer FAILS LOUDLY instead of corrupting the
  *    ledger. A crash inside the lock leaves the lock file behind
  *    deliberately: the next writer's error message says a previous
  *    writer died mid-update and the store needs inspection before the
  *    stale lock is removed.
  *  - [[atomicReplace]] closes the other half (the crash-mid-overwrite
  *    window): the merged frame is written COMPLETELY to `<store>.tmp`
  *    before the live store is touched, then swapped in with one
  *    delete + one rename — both metadata operations. The old counts
  *    are never destroyed before their replacement is durable; a crash
  *    between the delete and the rename leaves the full new state in
  *    `<store>.tmp` for manual recovery (rename it over the store
  *    path), which the lock file left behind points the operator at.
  */
object StoreLock {

  /** The lock file guarding `storePath`. */
  def lockPath(storePath: String): Path = new Path(storePath + ".lock")

  /** Run `body` holding the store's writer lock; releases on ANY exit.
    * Throws `IllegalStateException` if another writer holds it. */
  def withLock[A](spark: SparkSession, storePath: String)(body: => A): A = {
    val lock = lockPath(storePath)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = lock.getParent
    if (parent != null) fs.mkdirs(parent)
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"store $storePath is locked ($lock exists): another writer " +
            "is updating it, or a previous writer died mid-update. If " +
            "no writer is alive, inspect the store (a complete " +
            s"replacement may be waiting at $storePath.tmp), recover, " +
            "then delete the stale lock file.", e)
      }
    out.close()
    try body finally fs.delete(lock, false)
  }

  /** Replace the store at `storePath` with `df`: full durable write to
    * `<store>.tmp`, then delete-old + rename-tmp. Call only while
    * holding [[withLock]]. */
  def atomicReplace(spark: SparkSession, df: DataFrame,
      storePath: String): Unit = {
    val dest = new Path(storePath)
    val tmp = new Path(storePath + ".tmp")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    require(fs.rename(tmp, dest),
      s"rename $tmp -> $dest failed; the new state is intact at $tmp")
  }
}
