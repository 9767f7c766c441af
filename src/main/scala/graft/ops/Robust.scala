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

  /** Poisson(1) CDF through k = 7, as fixed shared literals: the weight
    * table of [[poissonBootstrapCI]], and the contract an external engine
    * replays (the same decimal literals parse to the same doubles). Draws
    * beyond 8 have probability < 1.1e-6 per (row, replicate) and are
    * clamped to 8 — a documented truncation, not a bug: it perturbs a
    * replicate mean by at most one extra copy of one row. */
  val PoissonOneCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** Inverse Poisson(1) CDF of a uniform `u` in [0, 1): the bootstrap
    * multiplicity of one row in one replicate. */
  def poissonWeight(u: Column): Column =
    PoissonOneCdf.zipWithIndex.foldRight(lit(8)) { case ((c, k), acc) =>
      when(u < c, k).otherwise(acc)
    }

  /** Per-group bootstrap confidence interval of the mean, by POISSON
    * bootstrap (Chamandy et al. 2012, "Estimating uncertainty for massive
    * data streams" — the bootstrap that works on distributed data): each
    * row enters replicate `b` with multiplicity ~ Poisson(1), drawn by
    * inverse-CDF on a deterministic 64-bit hash of (id, b). Unlike the
    * classic n-out-of-n resample there is NO global draw to coordinate —
    * every (row, replicate) weight is computed row-locally, so the whole
    * procedure is one scan exploded onto the replicate list with map-side
    * combine, shuffling `groups × replicates` partial rows regardless of
    * corpus size.
    *
    * Determinism: u = (hash64("id:b") >>> 11) / 2^53 is an exact dyadic
    * rational, the CDF thresholds are fixed literals, and the replicate
    * sums run through [[gf.exact_sum]] — every replicate mean is
    * bit-identical under any partitioning, and an external engine replays
    * the full procedure from the hash up.
    *
    * CI: nearest-rank order statistics over the replicate means —
    * `ci_lo` = the ⌈(α/2)·B⌉-th smallest, `ci_hi` = the ⌈(1−α/2)·B⌉-th,
    * ties broken by replicate index. A replicate whose total weight is 0
    * (probability ~e^−n) is dropped; `b_used` reports the survivor count
    * the ranks were computed over.
    *
    * Returns one row per group: (groupCols…, n_rows, mean, ci_lo, ci_hi,
    * b_used). The collect_list holding the replicate means is bounded by
    * `replicates` (≤ 128 doubles per group) — driver-independent. */
  def poissonBootstrapCI(df: DataFrame, groupCols: Seq[String],
      idCol: Column, valueCol: Column, replicates: Int = 64,
      alpha: Double = 0.05): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(replicates >= 4 && replicates <= 128,
      "replicates must be in [4, 128]")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val g = groupCols.map(col)
    val rows = df
      .select(g :+ idCol.cast("string").as("__id")
        :+ valueCol.cast("double").as("__v"): _*)
      .where(col("__id").isNotNull && col("__v").isNotNull)
    val u = shiftrightunsigned(gf.hash64(
        concat(col("__id"), lit(":"), col("__b"))), 11)
      .cast("double") / lit(9007199254740992.0)
    val rep = rows
      .select(g ++ Seq(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b")): _*)
      .withColumn("__w", poissonWeight(u))
      .groupBy(g :+ col("__b"): _*)
      .agg(gf.exact_sum(col("__w") * col("__v")).as("__sx"),
        sum(col("__w").cast("long")).as("__sw"))
      .where(col("__sw") > 0)
      .withColumn("__mb", col("__sx") / col("__sw"))
    val ci = rep.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("__mb"), col("__b"))))
          .as("__arr"),
        count(lit(1)).as("b_used"))
      .withColumn("__klo",
        ceil(lit(alpha / 2) * col("b_used")).cast("int"))
      .withColumn("__khi",
        ceil(lit(1.0 - alpha / 2) * col("b_used")).cast("int"))
      .select(g ++ Seq(
        element_at(col("__arr"), col("__klo")).getField("__mb")
          .as("ci_lo"),
        element_at(col("__arr"), col("__khi")).getField("__mb")
          .as("ci_hi"),
        col("b_used")): _*)
    val point = rows.groupBy(g: _*)
      .agg(count(lit(1)).as("n_rows"),
        (gf.exact_sum(col("__v")) / count(lit(1))).as("mean"))
    point.join(ci, groupCols, "left")
      .select(g ++ Seq(col("n_rows"), col("mean"), col("ci_lo"),
        col("ci_hi"), col("b_used")): _*)
  }

  /** [[poissonBootstrapCI]] for a RATIO of sums — the uncertainty band
    * for the metrics that are not row means: tokens-per-document,
    * dup-rate (flagged/total), cost-per-kept-token. Same machinery:
    * each row enters replicate b with Poisson(1) multiplicity from
    * the deterministic (id, b) hash; per replicate the ratio
    * Σw·num / Σw·den; CI from nearest-rank order statistics over the
    * replicate ratios (replicates whose weighted denominator is ≤ 0
    * are dropped — `b_used` reports survivors). Returns one row per
    * group: (groupCols…, n_rows, ratio, ci_lo, ci_hi, b_used) —
    * ratio NULL when the group's denominator sum is 0. NULL
    * id/num/den rows are refused work.
    *
    * Shape identical to the mean version: one scan exploded onto the
    * replicate list, `groups × replicates` partials, ≤128 doubles per
    * group collected. */
  def poissonBootstrapRatioCI(df: DataFrame, groupCols: Seq[String],
      idCol: Column, numCol: Column, denCol: Column,
      replicates: Int = 64, alpha: Double = 0.05): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(replicates >= 4 && replicates <= 128,
      "replicates must be in [4, 128]")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val g = groupCols.map(col)
    val rows = df
      .select(g :+ idCol.cast("string").as("__id")
        :+ numCol.cast("double").as("__num")
        :+ denCol.cast("double").as("__den"): _*)
      .where(col("__id").isNotNull && col("__num").isNotNull &&
        col("__den").isNotNull)
    val u = shiftrightunsigned(gf.hash64(
        concat(col("__id"), lit(":"), col("__b"))), 11)
      .cast("double") / lit(9007199254740992.0)
    val rep = rows
      .select(g ++ Seq(col("__id"), col("__num"), col("__den"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b")): _*)
      .withColumn("__w", poissonWeight(u))
      .groupBy(g :+ col("__b"): _*)
      .agg(gf.exact_sum(col("__w") * col("__num")).as("__sn"),
        gf.exact_sum(col("__w") * col("__den")).as("__sd"))
      .where(col("__sd") > 0)
      .withColumn("__rb", col("__sn") / col("__sd"))
    val ci = rep.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("__rb"), col("__b"))))
          .as("__arr"),
        count(lit(1)).as("b_used"))
      .withColumn("__klo",
        ceil(lit(alpha / 2) * col("b_used")).cast("int"))
      .withColumn("__khi",
        ceil(lit(1.0 - alpha / 2) * col("b_used")).cast("int"))
      .select(g ++ Seq(
        element_at(col("__arr"), col("__klo")).getField("__rb")
          .as("ci_lo"),
        element_at(col("__arr"), col("__khi")).getField("__rb")
          .as("ci_hi"),
        col("b_used")): _*)
    val point = rows.groupBy(g: _*)
      .agg(count(lit(1)).as("n_rows"),
        gf.exact_sum(col("__num")).as("__tn"),
        gf.exact_sum(col("__den")).as("__td"))
      .withColumn("ratio",
        when(col("__td") =!= 0.0, col("__tn") / col("__td")))
    point.join(ci, groupCols, "left")
      .select(g ++ Seq(col("n_rows"), col("ratio"), col("ci_lo"),
        col("ci_hi"), col("b_used")): _*)
  }

  /** Trimmed and winsorized means per group — the robust location
    * estimates for noisy reward/score aggregation (a handful of
    * mislabeled outliers should not move the number): with
    * `k = ⌊n·trim⌋` per side, the trimmed mean drops the k smallest
    * and k largest values, the winsorized mean CLAMPS them to the
    * surviving boundary values instead (computed closed-form as
    * `trimmed_sum + k·lo + k·hi` — no second pass). One window
    * exchange ranks each group (ties totalized by `tieCol`), one
    * aggregation folds both sums through
    * [[graft.api.functions.exact_sum]]. Dyadic `trim` keeps k exact.
    * Returns (groupCols…, n, k_trim, trimmed_mean, winsorized_mean);
    * groups where trimming would eat everything (n ≤ 2k) refuse with
    * NULLs. */
  def trimmedMean(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, tieCol: Column,
      trim: Double = 0.125): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(trim > 0 && trim < 0.5, "trim must be in (0, 0.5)")
    val v = valueCol.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(v, tieCol)
    val ranked = df.where(v.isNotNull)
      .withColumn("__v", v)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)).cast("long"))
      .withColumn("__k",
        floor(col("__n").cast("double") * trim).cast("long"))
    val inBand = col("__rk") > col("__k") &&
      col("__rk") <= col("__n") - col("__k")
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"), max(col("__k")).as("k_trim"),
        graft.api.functions.exact_sum(when(inBand, col("__v"))
          .otherwise(lit(0.0))).as("__ts"),
        count(when(inBand, lit(1))).as("__tn"),
        max(when(col("__rk") === col("__k") + 1, col("__v")))
          .as("__lo"),
        max(when(col("__rk") === col("__n") - col("__k"), col("__v")))
          .as("__hi"))
      .select(groupCols.map(col) ++ Seq(col("n"), col("k_trim"),
        when(col("__tn") > 0, col("__ts") / col("__tn"))
          .as("trimmed_mean"),
        when(col("__tn") > 0,
          (col("__ts") + col("k_trim") * col("__lo") +
            col("k_trim") * col("__hi")) / col("n"))
          .as("winsorized_mean")): _*)
  }

  /** Hill tail-index estimator (Hill 1975) per group — "how heavy is
    * this distribution's upper tail" (document lengths, token counts,
    * domain frequencies — the scaling-law diagnostic): over the k
    * largest values, `α̂ = k / Σ_{i≤k} ln(x_(n−i+1) / x_(n−k))` with
    * `x_(n−k)` the (k+1)-th largest as threshold; smaller α̂ = heavier
    * tail. One window exchange (descending rank per group), the top
    * k+1 rows filter BEFORE aggregation so the fold is k-sized, and
    * `Σ ln(x) − k·ln(thr)` folds through exact_sum. Non-positive
    * values are refused work; groups with n ≤ k refuse with NULLs.
    * Returns (groupCols…, n, k, threshold, alpha_hat). */
  def hillTailIndex(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, tieCol: Column, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(k >= 1, "k must be >= 1")
    val v = valueCol.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(v.desc, tieCol)
    val ranked = df.where(v.isNotNull && v > 0)
      .withColumn("__v", v)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)).cast("long"))
      .where(col("__rk") <= k + 1)
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"),
        graft.api.functions.exact_sum(
          when(col("__rk") <= k, log(col("__v"))).otherwise(lit(0.0)))
          .as("__slog"),
        max(when(col("__rk") === k + 1, col("__v"))).as("threshold"))
      .select(groupCols.map(col) ++ Seq(col("n"), lit(k.toLong).as("k"),
        col("threshold"),
        when(col("n") > k && col("threshold").isNotNull &&
          col("__slog") - lit(k.toDouble) * log(col("threshold")) > 0,
          lit(k.toDouble) /
            (col("__slog") - lit(k.toDouble) * log(col("threshold"))))
          .as("alpha_hat")): _*)
  }

  /** Paired-bootstrap significance test for "model A vs model B on the
    * same examples" (the eval-harness staple, Koehn 2004 for MT): per
    * group, Poisson-bootstrap the PER-EXAMPLE score difference d = A−B
    * with the same hash-derived row-local weights as
    * [[poissonBootstrapCI]] (no global resample — one scan × B
    * replicates, map-side combined), and report how often the
    * resampled mean difference fails to favor A:
    * `(groupCols…, n, mean_diff, b_used, reps_le0, p_sign)` with
    * `p_sign = reps_le0 / b_used` — the bootstrap probability that
    * A's improvement is ≤ 0. Zero-weight replicates drop (b_used
    * receipts). Integer-valued scores keep every replicate mean an
    * exact integer ratio, so the ≤ 0 census is bit-deterministic on
    * any engine. */
  def pairedBootstrapTest(df: DataFrame, groupCols: Seq[String],
      idCol: Column, scoreACol: Column, scoreBCol: Column,
      replicates: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(replicates >= 4 && replicates <= 128,
      "replicates must be in [4, 128]")
    val g = groupCols.map(col)
    val rows = df
      .select(g :+ idCol.cast("string").as("__id")
        :+ (scoreACol.cast("double") - scoreBCol.cast("double"))
          .as("__d"): _*)
      .where(col("__id").isNotNull && col("__d").isNotNull)
    val u = shiftrightunsigned(gf.hash64(
        concat(col("__id"), lit(":"), col("__b"))), 11)
      .cast("double") / lit(9007199254740992.0)
    val rep = rows
      .select(g ++ Seq(col("__id"), col("__d"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b")): _*)
      .withColumn("__w", poissonWeight(u))
      .groupBy(g :+ col("__b"): _*)
      .agg(gf.exact_sum(col("__w") * col("__d")).as("__sx"),
        sum(col("__w").cast("long")).as("__sw"))
      .where(col("__sw") > 0)
      .withColumn("__mb", col("__sx") / col("__sw"))
    val census = rep.groupBy(g: _*)
      .agg(count(lit(1)).as("b_used"),
        sum((col("__mb") <= 0.0).cast("long")).as("reps_le0"))
    val point = rows.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        (gf.exact_sum(col("__d")) / count(lit(1))).as("mean_diff"))
    point.join(census, groupCols, "left")
      .withColumn("p_sign",
        col("reps_le0").cast("double") / col("b_used"))
  }
  /** Distinct-value cell frame (v, f, cum) of one numeric column:
    * per-value count and inclusive cumulative count in value order —
    * the shared reduction of the quantile-normalization pair. One
    * map-side-combined shuffle; the cumulative runs through the
    * distributed two-level prefix sum ([[Packing.withPrefixSumsLong]]),
    * so a corpus-sized cell frame (continuous values) never serializes
    * through a single-task global window. */
  private def cdfCells(df: DataFrame, valueCol: Column): DataFrame = {
    val v = valueCol.cast("double")
    Packing.withPrefixSumsLong(
      df.where(v.isNotNull)
        .groupBy(v.as("__v")).agg(count(lit(1)).as("__f")),
      Seq("__v"), sums = Seq("__f" -> "__cum"))
  }

  /** Exact quantile normalization — the TRUTH arm (the §8.3 pair of
    * [[quantileNormalizeSketch]]): map every distinct source value
    * onto the target distribution by rank. With mid-rank CDF
    * p = (2·cum_before + f + 1)/(2·n_src), the image is the smallest
    * observed target value whose empirical CDF reaches p — i.e. the
    * target value at required rank r = ⌈p·n_tgt⌉ (computed as an exact
    * DECIMAL ceiling; nothing floating until the output). The classic
    * cross-scorer / cross-shard score-alignment pass (quantile
    * normalization in the Bolstad 2003 sense, per-column).
    *
    * Scale shape: both corpora reduce to distinct-value cell frames;
    * the rank lookup is a sort-merge over the UNION of the two cell
    * frames via the distributed forward gap fill
    * ([[Packing.fillAcross]] — range shuffle, partition-local
    * first-non-null windows, broadcast cross-partition chain), never a
    * nested-loop range join and never a single-task global window,
    * even when continuous values make the cell frames corpus-sized.
    * Returns the distinct mapping
    * (value, p, mapped), one row per distinct source value. */
  def quantileNormalizeExact(src: DataFrame, srcCol: Column,
      tgt: DataFrame, tgtCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val s = cdfCells(src, srcCol)
    val t = cdfCells(tgt, tgtCol)
    val nS = s.agg(coalesce(sum(col("__f")), lit(0L)).as("__ns"))
    val nT = t.agg(coalesce(sum(col("__f")), lit(0L)).as("__nt"))
    // required target rank r = ceil(nT·(2·cumBefore + f + 1) / (2·nS))
    // = (a + b − 1) div b with a = nT·(2cb + f + 1), b = 2nS
    val probes = s.crossJoin(broadcast(nS)).crossJoin(broadcast(nT))
      .select(col("__v"), col("__f"), col("__cum"),
        col("__ns"), col("__nt"))
      .withColumn("__a", col("__nt").cast(dec) *
        (lit(2).cast(dec) * (col("__cum") - col("__f")).cast(dec)
          + col("__f").cast(dec) + lit(1).cast(dec)))
      .withColumn("__b", lit(2).cast(dec) * col("__ns").cast(dec))
      .withColumn("__r", call_function("div",
        col("__a") + col("__b") - lit(1).cast(dec), col("__b"))
        .cast("long"))
    // sort-merge: union (probe at key r) with (target cell at key cum);
    // the probe's image is the FIRST target cell at or after its key —
    // target rows sort AFTER probes at equal keys so cum == r matches
    val pu = probes.select(col("__r").cast("long").as("__k"),
      lit(0).as("__ord"), col("__v"), col("__f"), col("__cum"),
      col("__ns"), lit(null).cast("double").as("__tv"))
    val tu = t.select(col("__cum").as("__k"), lit(1).as("__ord"),
      lit(null).cast("double").as("__v"),
      lit(null).cast("long").as("__f"),
      lit(null).cast("long").as("__cum"),
      lit(null).cast("long").as("__ns"), col("__v").as("__tv"))
    Packing.fillAcross(pu.unionByName(tu), Seq("__k", "__ord"),
        "__tv", "__mapped", forward = true)
      .where(col("__ord") === 0)
      .select(col("__v").as("value"),
        ((lit(2.0) * (col("__cum") - col("__f")) + col("__f") + 1)
          / (lit(2.0) * col("__ns"))).as("p"),
        col("__mapped").as("mapped"))
  }

  /** [[quantileNormalizeExact]]'s PRODUCTION twin — the 100 TB arm:
    * one t-digest per side (two KB-scale blobs, broadcast as
    * literals), and every source value maps scan-side through
    * `quantile_tgt(cdf_src(v))` — no cell frames, no union window, no
    * join; cost is ONE side-tagged union aggregation (both digests in
    * a single job) plus a projection.
    * The mapped value is interpolated (t-digest quantiles), not an
    * observed target value — measure agreement against the exact arm
    * in-gate (q216's convention), don't assume it. Returns the same
    * (value, p, mapped) distinct-mapping shape. */
  def quantileNormalizeSketch(src: DataFrame, srcCol: Column,
      tgt: DataFrame, tgtCol: Column,
      compression: Double = 200.0): DataFrame = {
    val sv = srcCol.cast("double")
    val tv = tgtCol.cast("double")
    // ONE job builds both digests: union the sides with a tag and let
    // each tdigest aggregate see only its side (null inputs skipped) —
    // the op's own 100 TB arm should not pay two scan passes
    val row = src.where(sv.isNotNull)
      .select(sv.as("__v"), lit(true).as("__src"))
      .unionByName(tgt.where(tv.isNotNull)
        .select(tv.as("__v"), lit(false).as("__src")))
      .agg(
        gf.tdigest(when(col("__src"), col("__v")), lit(1.0), compression),
        gf.tdigest(when(!col("__src"), col("__v")), lit(1.0), compression))
      .head
    val sBlob = row.getAs[Array[Byte]](0)
    val tBlob = row.getAs[Array[Byte]](1)
    src.where(sv.isNotNull).select(sv.as("value")).distinct()
      .withColumn("p", gf.tdigest_cdf(lit(sBlob), col("value")))
      .withColumn("mapped", gf.tdigest_quantile(lit(tBlob), col("p")))
  }

  /** Empirical percentile rank of each probe row's value against a
    * reference corpus: `cdf(v) = |{ref ≤ v}| / n_ref` — the
    * "where does this score sit in the reference distribution" lookup
    * (and the agreement-receipt primitive for the quantile-
    * normalization pair). Same sort-merge shape as
    * [[quantileNormalizeExact]], backward variant: a probe's rank is
    * the LAST reference cell at or before its value (probes sort
    * after reference cells at equal keys, so ties count as ≤). The
    * probe side joins back by DISTINCT value, so arbitrary probe
    * schemas ride along; NULL probe values get NULL rank. Adds
    * `outCol` to `probes`. */
  def percentileRank(ref: DataFrame, refCol: Column, probes: DataFrame,
      probeCol: Column, outCol: String = "cdf"): DataFrame = {
    require(!probes.columns.contains(outCol),
      s"probes already has a column named $outCol")
    val t = cdfCells(ref, refCol)
    val nT = t.agg(coalesce(sum(col("__f")), lit(0L)).as("__nt"))
    val pv = probes.select(probeCol.cast("double").as("__pk"))
      .where(col("__pk").isNotNull).distinct()
    val ru = t.select(col("__v").as("__k"), lit(0).as("__ord"),
      col("__cum"), lit(null).cast("double").as("__pk"))
    val pu = pv.select(col("__pk").as("__k"), lit(1).as("__ord"),
      lit(null).cast("long").as("__cum"), col("__pk"))
    val ranked = Packing.fillAcross(ru.unionByName(pu),
        Seq("__k", "__ord"), "__cum", "__cfill", forward = false)
      .withColumn("__c", coalesce(col("__cfill"), lit(0L)))
      .where(col("__ord") === 1)
      .crossJoin(broadcast(nT))
      .select(col("__pk"),
        when(col("__nt") > 0,
          col("__c").cast("double") / col("__nt")).as(outCol))
    probes.join(ranked,
      probeCol.cast("double") <=> col("__pk"), "left")
      .drop("__pk")
  }

  /** Theil–Sen slope estimator per group — the ROBUST trend: the
    * median of all pairwise slopes (y_j − y_i)/(x_j − x_i) over pairs
    * with distinct x. Where an OLS slope of quality-over-time follows
    * one bad week, Theil–Sen has a 29% breakdown point; this is the
    * "is this source actually degrading" number a drift dashboard
    * should chart next to [[graft.ops.Drift.ewmaMonitor]] flags. The
    * reported slope is the LOWER median of the slope distribution
    * (smallest s with 2·F(s) ≥ P — deterministic, SQL-reproducible).
    * Returns one row per group `(group, n, n_pairs, slope)` — slope
    * NULL when no pair has distinct x. NULL x/y are refused work.
    *
    * Shape: a per-group self-join materializes the pair frame — pairs
    * are O(m²) in the group size m, so groups are guarded by
    * `maxGroupRows` (fail fast; Theil–Sen is a per-series trend over
    * checkpoints/days, not a corpus regression — at m = 10⁴ that is
    * 5·10⁷ pair rows per group, distributed). The per-group weighted
    * median runs through [[Packing.groupedPrefixSumLong]]'s two-level
    * pass — no global window, no per-group buffering. */
  def theilSen(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column, maxGroupRows: Long = 10000L): DataFrame = {
    val x = xCol.cast("double")
    val y = yCol.cast("double")
    val base = df.where(groupCol.isNotNull && x.isNotNull &&
        y.isNotNull)
      .select(groupCol.as("group"), x.as("__x"), y.as("__y"))
      .localCheckpoint(eager = false)
    val sizes = base.groupBy(col("group")).agg(count(lit(1)).as("n"))
    val worst = sizes.agg(coalesce(max(col("n")), lit(0L)))
      .collect()(0).getLong(0)
    require(worst <= maxGroupRows,
      s"largest group has $worst rows > maxGroupRows=$maxGroupRows — " +
        "Theil-Sen pairs are O(m^2); bucket the series first")
    val l = base.select(col("group"), col("__x").as("__xl"),
      col("__y").as("__yl"))
    val r = base.select(col("group").as("__gr"),
      col("__x").as("__xr"), col("__y").as("__yr"))
    val slopes = l.join(r,
        col("group") === col("__gr") && col("__xl") < col("__xr"))
      .select(col("group"),
        ((col("__yr") - col("__yl")) / (col("__xr") - col("__xl")))
          .as("__s"))
    val cells = slopes.groupBy(col("group"), col("__s"))
      .agg(count(lit(1)).as("__f"))
    val cum = Packing.groupedPrefixSumLong(cells, col("group"),
      col("__s"), lit(0), col("__f"), "__cum")
    val tots = cells.groupBy(col("group"))
      .agg(sum(col("__f")).as("n_pairs"))
    val med = cum.join(tots, Seq("group"))
      .where(lit(2) * col("__cum") >= col("n_pairs"))
      .groupBy(col("group"))
      .agg(min(col("__s")).as("slope"), max(col("n_pairs"))
        .as("n_pairs"))
    sizes.join(med, Seq("group"), "left")
      .select(col("group"), col("n"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope"))
  }

  /** Hodges–Lehmann two-sample shift estimator — the ROBUST "how much
    * bigger is side A than side B": the median of all n_A·n_B pairwise
    * differences a − b. Where mean(A) − mean(B) moves with one fat
    * tail and median(A) − median(B) wastes the pairing, HL is the
    * location shift [[graft.ops.Drift.mannWhitney]] tests — the
    * natural effect-size companion to its z. The reported value is the
    * weighted LOWER median of the difference distribution (smallest d
    * with 2·F(d) ≥ 1 — a real attained difference, deterministic, and
    * the convention an external SQL engine reproduces with one
    * window). Returns one row `(n_a, n_b, n_cells_a, n_cells_b, hl)` —
    * hl NULL when either side is empty. NULL values/sides are refused
    * work.
    *
    * Shape: both sides reduce to distinct-value cell frames (one count
    * shuffle); the difference distribution is the CELL cross join —
    * C_A·C_B rows, guarded by `maxCellPairs` — with multiplicities
    * f_a·f_b folded per distinct difference in DECIMAL(38,18) (exact:
    * weights are integers; products overflow LONG past ~3·10⁹ rows per
    * side), and the weighted median from the distributed two-level
    * decimal prefix sum. The exact arm is for DISCRETE/bucketed values
    * (integer scores, grades) where the cell frames are
    * vocabulary-bounded at any corpus size; for continuous values
    * bucket first (the [[quantileNormalizeSketch]] dual-path
    * convention). */
  def hodgesLehmann(df: DataFrame, value: Column, isA: Column,
      maxCellPairs: Long = 10000000L): DataFrame = {
    val v = value.cast("double")
    val a = isA.cast("boolean")
    val base = df.where(v.isNotNull && a.isNotNull)
      .select(v.as("__v"), a.as("__a"))
    val cells = base.groupBy(col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__fa"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("__fb"))
      .localCheckpoint(eager = false)
    val m = cells.agg(
      coalesce(sum(col("__fa")), lit(0L)),
      coalesce(sum(col("__fb")), lit(0L)),
      count(when(col("__fa") > 0, 1)),
      count(when(col("__fb") > 0, 1))).collect()(0)
    val (na, nb) = (m.getLong(0), m.getLong(1))
    val (ca, cb) = (m.getLong(2), m.getLong(3))
    require(ca * cb <= maxCellPairs,
      s"$ca x $cb distinct-value cells exceed maxCellPairs=" +
        s"$maxCellPairs — bucket continuous values first")
    val spark = df.sparkSession
    if (na == 0 || nb == 0)
      return spark.range(1).select(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(ca).as("n_cells_a"), lit(cb).as("n_cells_b"),
        lit(null).cast("double").as("hl"))
    val dec = "decimal(38,18)"
    val ac = cells.where(col("__fa") > 0)
      .select(col("__v").as("__va"), col("__fa"))
    val bc = cells.where(col("__fb") > 0)
      .select(col("__v").as("__vb"), col("__fb"))
    val diffs = ac.crossJoin(bc)
      .groupBy((col("__va") - col("__vb")).as("__d"))
      .agg(sum(col("__fa").cast(dec) * col("__fb").cast(dec))
        .cast(dec).as("__w"))
    val cum = Packing.withPrefixSumsDec(diffs, Seq("__d"),
      Seq("__w" -> "__cw"))
    val tot = java.math.BigDecimal.valueOf(na)
      .multiply(java.math.BigDecimal.valueOf(nb))
    val hl = cum
      .where(col("__cw") * 2 >= lit(tot).cast(dec))
      .agg(min(col("__d"))).collect()(0).getDouble(0)
    spark.range(1).select(lit(na).as("n_a"), lit(nb).as("n_b"),
      lit(ca).as("n_cells_a"), lit(cb).as("n_cells_b"),
      lit(hl).as("hl"))
  }
}
