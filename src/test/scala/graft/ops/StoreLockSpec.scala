package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Writer protection for the persisted stores (StoreLock +
  * Preference.updatePairStore / SketchStore.updateCms wiring). */
class StoreLockSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("a second writer fails loudly while the lock is held, and the " +
      "store stays consistent") {
    import spark.implicits._
    val store = tmp("graft_lock") + "/pairs"
    val batch = Seq(("a", "b"), ("a", "b"), ("b", "c"))
      .toDF("w", "l")
    Preference.updatePairStore(spark, batch, col("w"), col("l"), store)
    val before = spark.read.parquet(store).collect().map(_.toSeq).toSet

    // writer A holds the lock; writer B (same protocol) must error
    // without touching the ledger
    val err = StoreLock.withLock(spark, store) {
      intercept[IllegalStateException] {
        Preference.updatePairStore(spark, batch, col("w"), col("l"), store)
      }
    }
    assert(err.getMessage.contains("locked"))
    assert(spark.read.parquet(store).collect().map(_.toSeq).toSet
      == before)

    // lock released on exit: the next update succeeds and folds
    Preference.updatePairStore(spark, batch, col("w"), col("l"), store)
    val after = Preference.loadPairStore(spark, store).get
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    val expect = Preference.pairCounts(batch.unionAll(batch),
      col("w"), col("l")).orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(after == expect)
  }

  test("withLock releases on exception; a stale lock blocks with a " +
      "recovery message") {
    val store = tmp("graft_lock2") + "/cms"
    intercept[RuntimeException] {
      StoreLock.withLock(spark, store) {
        throw new RuntimeException("writer died")
      }
    }
    // released on the exceptional exit: a new writer proceeds
    import spark.implicits._
    SketchStore.updateCms(spark, Seq(1L, 2L).toDF("k"), col("k"), store)
    assert(SketchStore.loadCms(spark, store).isDefined)

    // a lock left behind (simulated dead writer) blocks with guidance
    val fs = StoreLock.lockPath(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(StoreLock.lockPath(store), false).close()
    val e = intercept[IllegalStateException] {
      SketchStore.updateCms(spark, Seq(3L).toDF("k"), col("k"), store)
    }
    assert(e.getMessage.contains("stale lock"))
    fs.delete(StoreLock.lockPath(store), false)
  }

  test("atomicReplace never destroys the old state before the new one " +
      "is durable (tmp-then-swap)") {
    import spark.implicits._
    val store = tmp("graft_lock3") + "/state"
    StoreLock.atomicReplace(spark, Seq(1L).toDF("v"), store)
    assert(spark.read.parquet(store).collect()(0).getLong(0) == 1L)
    // replace: new state lands, no .tmp residue
    StoreLock.atomicReplace(spark, Seq(2L).toDF("v"), store)
    assert(spark.read.parquet(store).collect()(0).getLong(0) == 2L)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + ".tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + ".bak")))
  }

  test("a swap orphan (store missing, .tmp/.bak present) is refused as " +
      "a first run instead of silently recreating the ledger") {
    import spark.implicits._
    val store = tmp("graft_lock4") + "/pairs"
    val batch = Seq(("a", "b"), ("b", "c")).toDF("w", "l")
    Preference.updatePairStore(spark, batch, col("w"), col("l"), store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(store)
    val tmpP = new org.apache.hadoop.fs.Path(store + ".tmp")
    // simulate a swap that died between renames: full merged state at
    // .tmp, live store gone
    assert(fs.rename(dest, tmpP))
    val e = intercept[IllegalStateException] {
      Preference.updatePairStore(spark, batch, col("w"), col("l"), store)
    }
    assert(e.getMessage.contains("died") &&
      e.getMessage.contains("first run"))
    // no lock residue after the refusal, and the orphan is untouched
    assert(!fs.exists(StoreLock.lockPath(store)))
    assert(fs.exists(tmpP))
    // operator recovery per the message: rename the orphan back, retry
    assert(fs.rename(tmpP, dest))
    Preference.updatePairStore(spark, batch, col("w"), col("l"), store)
    val after = Preference.loadPairStore(spark, store).get
      .agg(sum(col("n_a_wins") + col("n_b_wins"))).collect()(0)
      .getLong(0)
    assert(after == 4L) // both batches survived — nothing was dropped

    // the .bak flavor of the same orphan is refused too
    val store2 = tmp("graft_lock5") + "/cms"
    SketchStore.updateCms(spark, Seq(1L).toDF("k"), col("k"), store2)
    val d2 = new org.apache.hadoop.fs.Path(store2)
    assert(fs.rename(d2, new org.apache.hadoop.fs.Path(store2 + ".bak")))
    val e2 = intercept[IllegalStateException] {
      SketchStore.updateCms(spark, Seq(2L).toDF("k"), col("k"), store2)
    }
    assert(e2.getMessage.contains("mid-swap"))
  }
}
