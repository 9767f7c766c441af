package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Robust per-group statistics for corpus quality filtering: median/MAD
  * z-scores and quantile band filters, keyed by a grouping column (source,
  * language, shard). The robust pair (median, MAD) is the standard guard
  * against the heavy-tailed score distributions of web corpora, where
  * mean/stddev are dragged by the very outliers being hunted.
  *
  * Two execution paths with one semantics:
  *
  *  - EXACT (`approx = false`): Catalyst's `percentile` aggregate — sorts
  *    each group's values inside the aggregation buffer. Right for
  *    reporting/eval and any group that fits an executor (the inherent
  *    contract of every exact selection); oracle-gated hash-exact
  *    (q112/q113).
  *  - SKETCH (`approx = true`): grouped t-digest quantiles — two corpus
  *    scans (values, then absolute deviations), per-group state is a
  *    digest of ~compression centroids regardless of group size. This is
  *    the 100 TB path: no per-group buffering, map-side combined, the
  *    group count only sizes a broadcast. Oracle-gated in q-space
  *    (q133): each estimate's exact rank must round to its target
  *    quantile (the reference's own tolerance contract,
  *    test_tdigest.py:99-107).
  *
  * Choosing: exact buffers every group value as unaggregated doubles in
  * ONE task's percentile buffer — keep it below ~10^7 rows per group
  * (~100 MB with overhead); beyond that, or when the max group size is
  * unknown (any open-ended corpus), use the sketch path — its per-group
  * state is a few KB at any group size, and its rank error is
  * ~1% (compression 200), the same contract the reference ships.
  *
  * Both paths: two aggregation passes + broadcast joins of the (tiny)
  * per-group stats back onto the corpus — the corpus itself never
  * shuffles.
  */
object Robust {

  /** Consistency factor making MAD estimate σ under normality. */
  val MadScale = 1.4826

  /** Per-group (median, MAD). Returns one row per group:
    * (groupCols…, med, mad). Groups are the distinct values of
    * `groupCols`; NULL values in `valueCol` are ignored by the quantile
    * aggregates on both paths. */
  def medianMad(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      approx: Boolean = false, compression: Double = 200.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(!df.columns.exists(Seq("med", "mad").contains),
      "input may not contain reserved columns med, mad")
    val g = groupCols.map(col)
    val v = valueCol.cast("double")
    val med =
      if (approx)
        df.groupBy(g: _*).agg(gf.tdigest_quantile(
          gf.tdigest(v, lit(1.0), compression), 0.5).as("med"))
      else df.groupBy(g: _*).agg(percentile(v, lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCols)
    val adev = abs(v - col("med"))
    if (approx)
      dev.groupBy(g: _*).agg(first(col("med")).as("med"),
        gf.tdigest_quantile(gf.tdigest(adev, lit(1.0), compression), 0.5)
          .as("mad"))
    else
      dev.groupBy(g: _*).agg(first(col("med")).as("med"),
        percentile(adev, lit(0.5)).as("mad"))
  }

  /** Adds `outCol` = (value − group-median) / (MadScale · MAD) — the
    * robust z-score. NULL when the group's MAD is 0 (a constant group has
    * no scale; flagging everything or nothing there is a policy choice
    * this op refuses to make silently) or the value is NULL. */
  def robustZ(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      outCol: String, approx: Boolean = false,
      compression: Double = 200.0): DataFrame = {
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val stats = medianMad(df, groupCols, valueCol, approx, compression)
    df.join(broadcast(stats), groupCols)
      .withColumn(outCol, when(col("mad") =!= 0.0,
        (valueCol.cast("double") - col("med")) / (lit(MadScale) * col("mad"))))
      .drop("med", "mad")
  }

  /** Rows whose |robust z| exceeds `z` — the outlier report. Constant
    * groups (MAD 0) contribute no outliers. */
  def outliers(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      z: Double, approx: Boolean = false): DataFrame = {
    require(z > 0, "z must be > 0")
    robustZ(df, groupCols, valueCol, "__rz", approx)
      .where(abs(col("__rz")) > z).drop("__rz")
  }

  /** Keeps rows whose value lies inside the group's [lo, hi] quantile band
    * (inclusive) — percentile-based trimming ("drop the shortest 5% and
    * longest 1% per language"). Rows with NULL values are dropped. */
  def quantileBand(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      lo: Double, hi: Double, approx: Boolean = false,
      compression: Double = 200.0): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"need 0 <= lo <= hi <= 1")
    require(!df.columns.exists(Seq("__lo", "__hi", "__sk").contains),
      "input may not contain reserved columns __lo, __hi, __sk")
    val g = groupCols.map(col)
    val v = valueCol.cast("double")
    val bounds =
      if (approx)
        // ONE digest per group, both band edges read from it
        df.groupBy(g: _*).agg(gf.tdigest(v, lit(1.0), compression).as("__sk"))
          .select(g ++ Seq(gf.tdigest_quantile(col("__sk"), lo).as("__lo"),
            gf.tdigest_quantile(col("__sk"), hi).as("__hi")): _*)
      else
        df.groupBy(g: _*).agg(percentile(v, lit(lo)).as("__lo"),
          percentile(v, lit(hi)).as("__hi"))
    df.join(broadcast(bounds), groupCols)
      .where(v >= col("__lo") && v <= col("__hi"))
      .drop("__lo", "__hi")
  }
}
