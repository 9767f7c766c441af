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
  *    stale lock is removed. An IN-JVM exception releases the lock —
  *    safe, because [[withLock]] first checks for swap orphans (below)
  *    and refuses to run over a half-swapped store.
  *  - [[atomicReplace]] closes the other half (the crash-mid-overwrite
  *    window) with a RENAME-ASIDE swap: the merged frame is written
  *    COMPLETELY to `<store>.tmp` before the live store is touched,
  *    then the live store is renamed ASIDE to `<store>.bak`, the tmp
  *    renamed in, and the bak deleted last — three metadata
  *    operations, and at every instant at least one complete state
  *    (old or new) exists on disk under a well-known name. The live
  *    store is never deleted before its replacement is durable AND
  *    named; a crash between the two renames leaves the OLD state
  *    complete at `<store>.bak` and the NEW state complete at
  *    `<store>.tmp`.
  *  - The remaining failure shape — live store absent but `.bak` or
  *    `.tmp` present — is a swap that died between renames. It is
  *    NEVER treated as a first run: [[withLock]] fails fast with
  *    recovery instructions instead of letting the next update read
  *    "store missing" and silently recreate the ledger from one batch
  *    while the full merged history sits unconsulted in the orphan.
  */
object StoreLock {

  /** The lock file guarding `storePath`. */
  def lockPath(storePath: String): Path = new Path(storePath + ".lock")

  /** Run `body` holding the store's writer lock; releases on ANY exit.
    * Throws `IllegalStateException` if another writer holds it, or if
    * the store is a swap ORPHAN (live store missing but `<store>.bak`
    * or `<store>.tmp` present — a previous [[atomicReplace]] died
    * between renames): running the read-merge-overwrite body then
    * would see "store missing", treat it as a first run, and silently
    * rebuild the ledger from a single batch. */
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
    try {
      requireNotOrphaned(fs, storePath)
      body
    } finally fs.delete(lock, false)
  }

  /** Fail fast if `storePath` is missing while a swap artifact
    * (`<store>.bak` old state, `<store>.tmp` new state) exists — the
    * signature of an [[atomicReplace]] that died between renames. */
  private def requireNotOrphaned(fs: org.apache.hadoop.fs.FileSystem,
      storePath: String): Unit = {
    val dest = new Path(storePath)
    val bak = new Path(storePath + ".bak")
    val tmp = new Path(storePath + ".tmp")
    if (!fs.exists(dest) && (fs.exists(bak) || fs.exists(tmp)))
      throw new IllegalStateException(
        s"store $storePath is missing but a swap artifact exists " +
          s"(old state at $bak: ${fs.exists(bak)}; new state at " +
          s"$tmp: ${fs.exists(tmp)}): a previous writer died " +
          "mid-swap. Recover by renaming the artifact you want " +
          s"(usually $tmp, the complete merged state) to $storePath, " +
          "delete the other, then retry. Refusing to treat this as a " +
          "first run — that would silently drop the accumulated " +
          "ledger.")
  }

  /** Replace the store at `storePath` with `df`: full durable write to
    * `<store>.tmp`, rename live aside to `<store>.bak`, rename tmp in,
    * delete bak. Call only while holding [[withLock]]. At every
    * instant a complete state exists at a well-known path; a crash
    * between the renames is detected by the next [[withLock]]. */
  def atomicReplace(spark: SparkSession, df: DataFrame,
      storePath: String): Unit = {
    val dest = new Path(storePath)
    val tmp = new Path(storePath + ".tmp")
    val bak = new Path(storePath + ".bak")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stale artifacts from a PREVIOUS completed-or-recovered swap are
    // safe to clear only while the live store exists (withLock already
    // refused the orphan case)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(dest) && fs.exists(bak)) fs.delete(bak, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest))
      require(fs.rename(dest, bak),
        s"rename $dest -> $bak failed; the live store is untouched " +
          s"and the new state is intact at $tmp")
    require(fs.rename(tmp, dest),
      s"rename $tmp -> $dest failed; the old state is intact at " +
        s"$bak and the new state at $tmp — recover by renaming one " +
        s"of them to $dest")
    if (fs.exists(bak)) fs.delete(bak, true)
  }
}
