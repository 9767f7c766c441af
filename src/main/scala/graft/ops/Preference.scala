package graft.ops

import org.apache.spark.sql.{DataFrame, Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise-preference strength fitting — the reward-model-free way to
  * turn "A beat B" feedback (human raters, win/loss evals, tournament
  * outcomes between model checkpoints) into a per-item strength score.
  *
  * [[bradleyTerry]] fits the Bradley–Terry model
  * `P(i beats j) = π_i / (π_i + π_j)` by Hunter's MM algorithm
  * (Hunter 2004, "MM algorithms for generalized Bradley-Terry models"):
  * each round sets `π_i ← W_i / Σ_{j≠i} n_ij / (π_i + π_j)` (W_i = i's
  * total wins, n_ij = comparisons between i and j), then renormalizes
  * to Σπ = 1. Fixed iteration count, so the output is a deterministic
  * function of the pair counts.
  *
  * Scale shape: the corpus-sized pair feed collapses in ONE map-side-
  * combined aggregation to the (i, j) comparison matrix, which is
  * bounded by distinct-items² — the number of MODELS/policies/sources
  * being ranked, not the number of judgments. The MM loop then runs on
  * that bounded table driver-side (same contract as vocab/codebook
  * collects); `maxItems` refuses the collect when the item universe is
  * not actually bounded. 100 TB of judgments = one shuffle.
  */
object Preference {

  /** Canonical symmetric comparison counts from a (winner, loser) feed:
    * one row per unordered pair, `(a, b, n_a_wins, n_b_wins)` with
    * a < b. NULL items are refused work (dropped). */
  def pairCounts(df: DataFrame, winnerCol: Column,
      loserCol: Column): DataFrame =
    df.where(winnerCol.isNotNull && loserCol.isNotNull)
      .select(least(winnerCol, loserCol).as("a"),
        greatest(winnerCol, loserCol).as("b"),
        (winnerCol < loserCol).as("__aw"))
      .groupBy("a", "b")
      .agg(sum(col("__aw").cast("long")).as("n_a_wins"),
        sum((!col("__aw")).cast("long")).as("n_b_wins"))

  /** Bradley–Terry strengths after `iters` MM rounds from a uniform
    * start: one row per item — `(item, wins, n_comp, score)` where
    * `score` is π (Σπ = 1 each round), `wins` the item's total wins and
    * `n_comp` its total comparisons. Items that never win take score 0
    * on the first round and stay there (the MM fixed point for W_i = 0);
    * self-pairs (winner = loser) carry no signal and are dropped.
    *
    * Determinism: the driver loop sums each item's denominator in
    * sorted-(i, j) order, so the result is bit-stable under any input
    * partitioning or arrival order. */
  def bradleyTerry(df: DataFrame, winnerCol: Column, loserCol: Column,
      iters: Int = 10, maxItems: Int = 4096): DataFrame =
    bradleyTerryFromCounts(pairCounts(df, winnerCol, loserCol),
      iters, maxItems)

  /** [[bradleyTerry]] from an ALREADY-AGGREGATED canonical pair-count
    * table ([[pairCounts]]' layout: a, b, n_a_wins, n_b_wins) — the fit
    * entry point for a persisted [[updatePairStore]] ledger, where the
    * corpus-sized judgment feed was folded away incrementally. */
  def bradleyTerryFromCounts(counts: DataFrame, iters: Int = 10,
      maxItems: Int = 4096): DataFrame = {
    require(iters >= 1 && iters <= 1000, "iters must be in [1, 1000]")
    val spark = counts.sparkSession
    val pc = counts
      .where(col("a") =!= col("b"))
      .orderBy("a", "b")
      .collect()

    val items = pc.flatMap(r => Seq(r.get(0), r.get(1))).distinct
      .sortBy(_.toString)
    require(items.length <= maxItems,
      s"${items.length} distinct items exceeds maxItems=$maxItems — " +
        "bradleyTerry ranks a bounded item universe (models, sources); " +
        "an unbounded key does not fit the collect contract")
    val idx = items.zipWithIndex.toMap
    val n = items.length
    val wins = new Array[Long](n)
    val comps = new Array[Long](n)
    // adjacency as sorted (neighbor, count) lists per item
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long)])
    pc.foreach { r =>
      val ia = idx(r.get(0)); val ib = idx(r.get(1))
      val aw = r.getLong(2); val bw = r.getLong(3)
      val nij = aw + bw
      wins(ia) = wins(ia) + aw
      wins(ib) = wins(ib) + bw
      comps(ia) = comps(ia) + nij
      comps(ib) = comps(ib) + nij
      adj(ia) += ((ib, nij)); adj(ib) += ((ia, nij))
    }

    var pi = Array.fill(n)(if (n == 0) 0.0 else 1.0 / n)
    var it = 0
    while (it < iters) {
      val u = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (wins(i) == 0L) u(i) = 0.0
        else {
          // adj lists were appended in sorted-(a, b) order per source
          // pair row, which is NOT globally sorted per item — sort here
          var den = 0.0
          adj(i).sortBy(_._1).foreach { case (j, nij) =>
            den += nij.toDouble / (pi(i) + pi(j))
          }
          u(i) = wins(i).toDouble / den
        }
        i += 1
      }
      val tot = u.sum
      pi = if (tot > 0) u.map(_ / tot) else u
      it += 1
    }

    val itemType = counts.select(col("a")).schema.fields(0).dataType
    val schema = StructType(Seq(
      StructField("item", itemType, nullable = false),
      StructField("wins", LongType, nullable = false),
      StructField("n_comp", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    val rows = items.indices.map(i =>
      Row(items(i), wins(i), comps(i), pi(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The stored pair-count ledger, if it exists. */
  def loadPairStore(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None else Some(spark.read.parquet(path))
  }

  /** Fold one batch of judgments into a persisted pair-count ledger —
    * the ratings-update lifecycle: comparison counts are a monoid, so
    * the store after any number of shard updates is row-identical to
    * [[pairCounts]] over the concatenated feed, and
    * [[bradleyTerryFromCounts]] on the store equals the one-shot fit
    * exactly. The merged table (items²-bounded, `maxRows`-guarded)
    * materializes DRIVER-SIDE before the overwrite — the same
    * never-read-what-you-truncate contract as
    * [[SketchStore.updateCms]]. The single-writer contract is ENFORCED
    * ([[StoreLock.withLock]]: a second concurrent writer fails loudly)
    * and the overwrite is crash-safe ([[StoreLock.atomicReplace]]:
    * the old ledger is only dropped after the merged one is fully
    * durable next to it). */
  def updatePairStore(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, winnerCol: Column, loserCol: Column,
      path: String, maxRows: Int = 1000000): Unit =
    StoreLock.withLock(spark, path) {
      val part = pairCounts(batch, winnerCol, loserCol)
      val merged = loadPairStore(spark, path) match {
        case None => part
        case Some(old) => old.unionByName(part)
          .groupBy("a", "b")
          .agg(sum(col("n_a_wins")).as("n_a_wins"),
            sum(col("n_b_wins")).as("n_b_wins"))
      }
      val rows = merged.collect()
      require(rows.length <= maxRows,
        s"${rows.length} pair rows exceeds maxRows=$maxRows — the " +
          "ledger is meant for a bounded item universe")
      StoreLock.atomicReplace(spark, spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), merged.schema),
        path)
    }
}
