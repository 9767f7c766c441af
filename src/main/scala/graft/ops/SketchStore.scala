package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Persisted-sketch maintenance — the lifecycle that makes sketch-based
  * planning ([[Planner]]) work against HISTORY without rescanning it:
  * each arriving shard/micro-batch folds into a stored Count-Min blob
  * (sketches are monoids: merge = element-wise add), so after any number
  * of increments the stored state is bit-identical to a one-shot sketch
  * of the full corpus. A daily crawl pays O(day) to keep join-size / F2
  * estimates over ALL of history current; the blob itself is
  * depth·width·8 bytes (128 KB at 4×4096) regardless of corpus size.
  *
  * The read-merge-write step materializes the (sketch-sized) old blob on
  * the driver BEFORE writing — never reading and overwriting the same
  * files in one lazy plan — and the merge itself runs through the same
  * [[gf.cms_merge_agg]] the distributed re-aggregation path uses. The
  * single-writer-per-store-path contract (the foreachBatch shape) is
  * enforced by [[StoreLock]]. */
object SketchStore {

  /** The stored blob, if the store exists. One-row, KB–MB scale — the
    * same bounded-collect class as tokenizer vocabularies. */
  def loadCms(spark: SparkSession, path: String): Option[Array[Byte]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(path).collect().headOption
      .map(_.getAs[Array[Byte]]("sketch"))
  }

  /** Fold one batch of keys into the store: new_state = old ⊕ cms(batch).
    * Returns the updated blob. Creates the store on first call. The
    * single-writer contract is ENFORCED ([[StoreLock.withLock]]) and
    * the overwrite is crash-safe ([[StoreLock.atomicReplace]]). */
  def updateCms(spark: SparkSession, batch: DataFrame, key: Column,
      path: String, depth: Int = 4, width: Int = 4096): Array[Byte] =
    StoreLock.withLock(spark, path) {
      val batchSketch = batch.agg(gf.cms_agg(key, depth, width).as("sketch"))
      val merged = loadCms(spark, path) match {
        case None => batchSketch
        case Some(old) =>
          import spark.implicits._
          batchSketch.select(col("sketch"))
            .unionAll(Seq(old).toDF("sketch"))
            .agg(gf.cms_merge_agg(col("sketch")).as("sketch"))
      }
      val blob = merged.collect()(0).getAs[Array[Byte]]("sketch")
      import spark.implicits._
      StoreLock.atomicReplace(spark,
        Seq(blob).toDF("sketch").coalesce(1), path)
      blob
    }
}
