package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Reward post-processing for RL-from-feedback training data: the
  * per-prompt normalizations that turn raw reward-model scores into the
  * advantage signals policy-gradient recipes consume.
  *
  *  - [[groupAdvantage]] — GRPO-style group-relative advantage
  *    (Shao et al. 2024, "DeepSeekMath"): each candidate's reward is
  *    standardized against its OWN prompt's candidate group,
  *    `(r − mean_g) / std_g`, so the policy gradient compares candidates
  *    of the same prompt rather than rewards across prompts (which live
  *    on incomparable scales).
  *  - [[leaveOneOutAdvantage]] — RLOO baseline (Ahmadian et al. 2024):
  *    `r − mean(others)`, the unbiased per-sample baseline
  *    `(Σ_g r − r) / (n_g − 1)` that needs no value network.
  *
  * Degenerate-group contract (both ops): a group with one candidate, or
  * one whose rewards are all equal (std = 0), carries NO ranking signal —
  * the advantage is defined as 0.0 rather than NULL/NaN, matching the
  * GRPO convention of dropping such groups from the gradient (a zero
  * advantage contributes nothing).
  *
  * Scale shape: prompt-keyed groups are corpus-cardinality (rows / n
  * candidates), so the per-group stats table is NOT broadcastable — a
  * groupBy+join plan would shuffle the corpus twice. Both ops instead
  * compute over ONE `Window.partitionBy(group)` exchange: groups are
  * small and bounded (the candidate count of the sampler, ≤ ~64), so the
  * per-partition window state is trivial, and there is no join and no
  * second scan. Window sums run through [[gf.exact_sum]], so every
  * advantage bit is invariant to row arrival order within the group —
  * the same answer under any parallelism, retry, or input layout.
  */
object Reward {

  private def checkCols(df: DataFrame, out: Seq[String]): Unit =
    out.foreach(c => require(!df.columns.contains(c),
      s"column $c already exists"))

  /** GRPO group-relative advantage: adds `outCol` =
    * `(r − mean_g(r)) / std_g(r)` (sample std, ddof = 1) plus the group
    * receipts `<outCol>_n` (non-null candidate count) and rounded group
    * mean/std when `withStats`. NULL rewards take advantage NULL and do
    * not contribute to the group statistics. */
  def groupAdvantage(df: DataFrame, groupCols: Seq[String],
      rewardCol: Column, outCol: String = "advantage",
      withStats: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val statCols = Seq(s"${outCol}_n", s"${outCol}_mean", s"${outCol}_std")
    checkCols(df, outCol +: (if (withStats) statCols else Nil))
    val w = Window.partitionBy(groupCols.map(col): _*)
    val r = rewardCol.cast("double")
    val n = count(r).over(w)
    val s1 = gf.exact_sum(r).over(w)
    val s2 = gf.exact_sum(r * r).over(w)
    val mean = s1 / n
    // sample variance via the moment identity; clamp the tiny negative
    // residue cancellation can leave on constant groups
    val variance = greatest((s2 - s1 * s1 / n) / (n - lit(1)), lit(0.0))
    val std = sqrt(variance)
    val adv = when(r.isNull, lit(null).cast("double"))
      .when(n <= 1 || std === 0.0, lit(0.0))
      .otherwise((r - mean) / std)
    val base = df.withColumn(outCol, adv)
    if (!withStats) base
    else base
      .withColumn(s"${outCol}_n", n)
      .withColumn(s"${outCol}_mean", when(n >= 1, mean))
      .withColumn(s"${outCol}_std", when(n >= 2, std))
  }

  /** Per-group reward statistics as a persistable table — the FROZEN
    * half of the serving split: (groupCols…, n, mean, std). `std` is
    * sample std (NULL for n < 2). Computed through [[gf.exact_sum]], so
    * a stats table written today and one recomputed tomorrow over the
    * same rows are byte-identical, and [[advantageFromStats]] under
    * this table reproduces [[groupAdvantage]]'s bits exactly. */
  def groupStats(df: DataFrame, groupCols: Seq[String],
      rewardCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val r = rewardCol.cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(r).as("n"),
        gf.exact_sum(r).as("__s1"),
        gf.exact_sum(r * r).as("__s2"))
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        when(col("n") >= 1, col("__s1") / col("n")).as("mean"),
        when(col("n") >= 2, sqrt(greatest(
          (col("__s2") - col("__s1") * col("__s1") / col("n"))
            / (col("n") - lit(1)), lit(0.0)))).as("std")): _*)
  }

  /** Serving-shape normalization: standardize arriving rewards under a
    * FROZEN [[groupStats]] table (stats are model state, never derived
    * from the arriving batch — same contract as encoding under a stored
    * tokenizer). Groups absent from the stats table, singleton groups,
    * and zero-variance groups take advantage 0.0; NULL rewards take
    * NULL. The join is group-keyed; in a serving batch the stats side is
    * bounded by the batch's distinct prompts. */
  def advantageFromStats(df: DataFrame, stats: DataFrame,
      groupCols: Seq[String], rewardCol: Column,
      outCol: String = "advantage"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    checkCols(df, Seq(outCol))
    val r = rewardCol.cast("double")
    val st = stats.select(groupCols.map(col) ++ Seq(col("n").as("__gn"),
      col("mean").as("__gm"), col("std").as("__gs")): _*)
    df.join(st, groupCols, "left")
      .withColumn(outCol,
        when(r.isNull, lit(null).cast("double"))
          .when(col("__gn").isNull || col("__gn") <= 1 ||
            col("__gs") === 0.0, lit(0.0))
          .otherwise((r - col("__gm")) / col("__gs")))
      .drop("__gn", "__gm", "__gs")
  }

  /** Discounted reward-to-go over ordered per-group reward sequences —
    * the RL return target G_t = Σ_{k=0}^{H−1} γ^k · r_{t+k} computed
    * along each group's (orderCol, tieCol) order, horizon-truncated at
    * `horizon` steps (the standard n-step return; sequences shorter
    * than the horizon just sum what exists).
    *
    * One window exchange: the future-reward frame is a ROWS window
    * [current, horizon−1 following], materialized per row as a
    * horizon-bounded array (≤ H doubles — never the whole group), and
    * the weighted sum folds left-to-right in frame order, so the result
    * is deterministic under any partitioning. With a dyadic γ (0.5,
    * 0.25, 0.75…) every discount power is an exact double.
    *
    * NULL rewards count as 0.0 AT THEIR OWN TIME STEP: the row still
    * occupies its position in the frame (it is coalesced, not
    * dropped), so every later reward keeps its correct γ^k discount
    * slot — a silently-skipped NULL would shift the whole tail one
    * power earlier and corrupt the time indexing of every return that
    * sees it. `<outCol>_n` counts frame ROWS (steps), including
    * zero-filled ones. */
  def discountedReturns(df: DataFrame, groupCols: Seq[String],
      orderCol: Column, tieCol: Column, rewardCol: Column,
      gamma: Double = 0.5, horizon: Int = 16,
      outCol: String = "return_togo"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(gamma > 0 && gamma <= 1, "gamma must be in (0, 1]")
    require(horizon >= 1 && horizon <= 1024,
      "horizon must be in [1, 1024]")
    checkCols(df, Seq(outCol, s"${outCol}_n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCol, tieCol)
      .rowsBetween(Window.currentRow, horizon - 1)
    val fr = collect_list(coalesce(rewardCol.cast("double"), lit(0.0)))
      .over(w)
    df.withColumn("__fr", fr)
      .withColumn(s"${outCol}_n", size(col("__fr")))
      .withColumn(outCol, aggregate(
        zip_with(col("__fr"),
          transform(sequence(lit(0), size(col("__fr")) - 1),
            k => pow(lit(gamma), k)),
          (r, g) => r * g),
        lit(0.0), (acc, x) => acc + x))
      .drop("__fr")
  }

  /** Session-scoped [[discountedReturns]]: returns must not leak across
    * behavioral sessions, so the stream first splits by the
    * gaps-and-islands rule (a new session starts where the inter-event
    * gap exceeds `gapSeconds`, exact integer microsecond arithmetic)
    * and G_t then folds within (group, session) only. Adds
    * `session_idx` (0-based per group) alongside the return columns.
    * Same single-exchange shape: the session index is one running sum
    * over the group window the return pass already needs. */
  def sessionReturns(df: DataFrame, groupCols: Seq[String],
      tsCol: Column, tieCol: Column, rewardCol: Column,
      gapSeconds: Long, gamma: Double = 0.5, horizon: Int = 16,
      outCol: String = "return_togo"): DataFrame = {
    require(gapSeconds >= 1, "gapSeconds must be >= 1")
    checkCols(df, Seq("session_idx"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(tsCol, tieCol)
    val prev = lag(unix_micros(tsCol), 1).over(w)
    val brk = when(prev.isNull ||
      unix_micros(tsCol) - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = df.withColumn("session_idx",
      sum(brk).over(run) - 1)
    discountedReturns(sessioned, groupCols :+ "session_idx",
      tsCol, tieCol, rewardCol, gamma, horizon, outCol)
  }

  /** Generalized Advantage Estimation (Schulman et al. 2016, "GAE"):
    * A_t = Σ_{k=0}^{H−1} (γλ)^k · δ_{t+k} over each group's
    * (orderCol, tieCol) order, where the TD residual
    * δ_t = r_t + γ·V_{t+1} − V_t bootstraps from the NEXT step's value
    * (V = 0 past the end of the sequence — the standard terminal
    * convention) and λ trades bias for variance between the one-step TD
    * advantage (λ = 0) and the full Monte-Carlo return (λ = 1).
    * Adds `outCol` and `<outCol>_n` (residuals actually in the frame).
    *
    * Same single-exchange shape as [[discountedReturns]]: the residual
    * needs `lead(V)` and the fold needs a forward frame, but both
    * windows share one `partitionBy(group).orderBy(order, tie)` spec,
    * so Catalyst plans ONE exchange + ONE sort and the frame
    * materializes at most `horizon` doubles per row — never the group.
    * With dyadic γ and λ (1/2, 1/4…) every (γλ)^k is an exact double,
    * so integer-valued rewards/values make A_t bit-exact under any
    * partitioning. A NULL reward or value makes that step's residual
    * NULL, which the delegated fold treats as δ = 0 at its own time
    * step ([[discountedReturns]]'s alignment-preserving NULL rule). */
  def gaeAdvantage(df: DataFrame, groupCols: Seq[String],
      orderCol: Column, tieCol: Column, rewardCol: Column,
      valueCol: Column, gamma: Double = 0.5, lam: Double = 0.5,
      horizon: Int = 16, outCol: String = "gae"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(gamma > 0 && gamma <= 1, "gamma must be in (0, 1]")
    require(lam >= 0 && lam <= 1, "lambda must be in [0, 1]")
    checkCols(df, Seq("__gae_delta"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCol, tieCol)
    val v = valueCol.cast("double")
    val nextV = lead(v, 1, 0.0).over(w)
    val delta = rewardCol.cast("double") + lit(gamma) * nextV - v
    val withDelta = df.withColumn("__gae_delta", delta)
    val out =
      if (lam == 0.0) {
        // λ = 0 degenerates to the one-step TD advantage: A_t = δ_t
        checkCols(df, Seq(outCol, s"${outCol}_n"))
        withDelta.withColumn(outCol, col("__gae_delta"))
          .withColumn(s"${outCol}_n",
            when(col("__gae_delta").isNotNull, 1).otherwise(0))
      } else discountedReturns(withDelta, groupCols, orderCol, tieCol,
        col("__gae_delta"), gamma = gamma * lam, horizon = horizon,
        outCol = outCol)
    out.drop("__gae_delta")
  }

  /** V-trace targets and policy-gradient advantages (Espeholt et al.
    * 2018, IMPALA) — the off-policy return correction an async RL
    * pipeline applies when the data-generating (behavior) policy lags
    * the learner: with importance ratio IS_t = π(a|x)/μ(a|x),
    * ρ_t = min(ρ̄, IS_t), c_t = min(c̄, IS_t),
    *
    *   δ_t = ρ_t · (r_t + γ·V(x_{t+1}) − V(x_t))
    *   v_s = V(x_s) + Σ_{t=s}^{s+H−1} γ^{t−s} (Π_{i=s}^{t−1} c_i) δ_t
    *   adv_s = ρ_s · (r_s + γ·v_{s+1} − V(x_s))
    *
    * horizon-truncated at H steps (the n-step convention of
    * [[discountedReturns]]/[[gaeAdvantage]]; V = 0 and v = 0 past the
    * end of the sequence — the standard terminal bootstrap). ρ̄ bounds
    * the fixed point's bias (ρ̄ = ∞ recovers on-policy vπ), c̄ bounds
    * variance; the paper's ordering c̄ ≤ ρ̄ is required up front.
    *
    * Same single-exchange shape as its siblings: the δ/c frames are
    * horizon-bounded forward arrays (≤ H doubles per row, never the
    * whole group) and the correction folds left-to-right with a
    * (sum, c-product, γ-power) struct accumulator, so results are
    * deterministic under any partitioning; the advantage pass reuses
    * the SAME window sort. NULLs keep their time slot with neutral
    * elements (r → 0, V → 0, IS → 1 — the [[discountedReturns]]
    * argument: dropping a row would shift every later term one
    * discount power earlier). Adds `outCol`, `<outCol>_n` (frame
    * rows), `<outCol>_adv`. */
  def vTrace(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      tieCol: Column, rewardCol: Column, valueCol: Column,
      ratioCol: Column, gamma: Double = 0.99, rhoBar: Double = 1.0,
      cBar: Double = 1.0, horizon: Int = 16,
      outCol: String = "vtrace"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(gamma > 0 && gamma <= 1, "gamma must be in (0, 1]")
    require(rhoBar > 0 && cBar > 0 && cBar <= rhoBar,
      "need 0 < cBar <= rhoBar (Espeholt 2018's truncation ordering)")
    require(horizon >= 1 && horizon <= 1024,
      "horizon must be in [1, 1024]")
    checkCols(df, Seq(outCol, s"${outCol}_n", s"${outCol}_adv",
      "__vt_d", "__vt_c", "__vt_v", "__vt_rho", "__vt_r"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCol, tieCol)
    val v = coalesce(valueCol.cast("double"), lit(0.0))
    val is = coalesce(ratioCol.cast("double"), lit(1.0))
    val r = coalesce(rewardCol.cast("double"), lit(0.0))
    val rho = least(lit(rhoBar), is)
    val nextV = lead(v, 1, 0.0).over(w)
    val base = df
      .withColumn("__vt_d", rho * (r + lit(gamma) * nextV - v))
      .withColumn("__vt_c", least(lit(cBar), is))
      .withColumn("__vt_v", v)
      .withColumn("__vt_rho", rho)
      .withColumn("__vt_r", r)
    val wf = w.rowsBetween(Window.currentRow, horizon - 1)
    val fd = collect_list(col("__vt_d")).over(wf)
    val fc = collect_list(col("__vt_c")).over(wf)
    // fold state: s = Σ so far, p = Π c over rows BEFORE this term,
    // g = γ^k; the product excludes the term's own c (i ranges s..t−1)
    val corr = aggregate(
      zip_with(fd, fc, (d, c) => struct(d.as("d"), c.as("c"))),
      struct(lit(0.0).as("s"), lit(1.0).as("p"), lit(1.0).as("g")),
      (acc, x) => struct(
        (acc.getField("s") +
          acc.getField("g") * acc.getField("p") * x.getField("d")).as("s"),
        (acc.getField("p") * x.getField("c")).as("p"),
        (acc.getField("g") * lit(gamma)).as("g")),
      acc => acc.getField("s"))
    val scored = base
      .withColumn(s"${outCol}_n", size(fd))
      .withColumn(outCol, col("__vt_v") + corr)
    scored
      .withColumn(s"${outCol}_adv",
        col("__vt_rho") * (col("__vt_r") +
          lit(gamma) * lead(col(outCol), 1, 0.0).over(w) - col("__vt_v")))
      .drop("__vt_d", "__vt_c", "__vt_v", "__vt_rho", "__vt_r")
  }

  /** Off-policy evaluation on logged feedback — inverse-propensity
    * scoring (Horvitz–Thompson) and its self-normalized variant
    * (SNIPS, Swaminathan & Joachims 2015): with logged
    * (action, reward, propensity) rows and the TARGET policy's action
    * per row, w = 1[a == π(x)] / p, V_IPS = Σ w·r / n,
    * V_SNIPS = Σ w·r / Σ w. `maxWeight` clips w (the standard
    * variance-for-bias trade on tiny propensities); +∞ = unclipped.
    *
    * Returns one row per group: (groupCols…, n, n_matched, sum_w,
    * sum_wr, ips, snips). Sums run through [[gf.exact_sum]] — one
    * aggregation, map-side combined; NULL propensities or p ≤ 0 rows
    * are refused work (dropped) rather than silently producing ±∞. */
  def offPolicyValue(df: DataFrame, groupCols: Seq[String],
      actionCol: Column, rewardCol: Column, propensityCol: Column,
      targetActionCol: Column,
      maxWeight: Double = Double.PositiveInfinity): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(maxWeight > 0, "maxWeight must be > 0")
    val p = propensityCol.cast("double")
    val matched = actionCol === targetActionCol
    val w = when(matched, least(lit(1.0) / p, lit(maxWeight)))
      .otherwise(lit(0.0))
    val r = rewardCol.cast("double")
    df.where(p.isNotNull && p > 0 && r.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(matched.cast("long")).as("n_matched"),
        gf.exact_sum(w).as("sum_w"),
        gf.exact_sum(w * r).as("sum_wr"))
      .withColumn("ips", col("sum_wr") / col("n"))
      .withColumn("snips",
        when(col("sum_w") > 0, col("sum_wr") / col("sum_w")))
  }

  /** Per-group reward-vs-length bias diagnosis — the OLS line a reward
    * model's length bias shows up on (verbose-answer inflation is the
    * classic RM failure; Singhal et al. 2023, "A Long Way to Go"):
    * slope = Sxy/Sxx and r² = Sxy²/(Sxx·Syy) of reward on length per
    * group, with the moment numerators `sxx_num = nΣx²−(Σx)²` (and
    * sxy/syy alike) emitted alongside — under integer-valued inputs
    * within double range these are EXACT, so the fit is auditable
    * digit-for-digit. One map-side-combined aggregation through
    * [[gf.exact_sum]], so every statistic is bit-stable under any
    * partitioning; single-row and zero-length-variance groups report
    * NULL slope (there is no line to fit). NULL rewards/lengths are
    * refused work. Returns (groupCols…, n, sxx_num, sxy_num, syy_num,
    * slope, intercept, r2). */
  def lengthBiasStats(df: DataFrame, groupCols: Seq[String],
      rewardCol: Column, lenCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val x = lenCol.cast("double")
    val y = rewardCol.cast("double")
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        gf.exact_sum(x).as("__sx"), gf.exact_sum(y).as("__sy"),
        gf.exact_sum(x * x).as("__sxx"),
        gf.exact_sum(x * y).as("__sxy"),
        gf.exact_sum(y * y).as("__syy"))
      .select(groupCols.map(col) ++ {
        val n = col("n").cast("double")
        val sxx = n * col("__sxx") - col("__sx") * col("__sx")
        val sxy = n * col("__sxy") - col("__sx") * col("__sy")
        val syy = n * col("__syy") - col("__sy") * col("__sy")
        Seq(col("n"), sxx.as("sxx_num"), sxy.as("sxy_num"),
          syy.as("syy_num"),
          when(sxx > 0, sxy / sxx).as("slope"),
          when(sxx > 0,
            (col("__sy") - sxy / sxx * col("__sx")) / n).as("intercept"),
          when(sxx > 0 && syy > 0, sxy * sxy / (sxx * syy)).as("r2"))
      }: _*)
  }

  /** De-bias rewards against length under a per-group OLS fit: adds
    * `outCol` = `r − (intercept + slope · len)` — the residual reward a
    * length-blind ranker should consume. Groups where no line fits
    * (single row, constant length) pass rewards through centered on the
    * group mean (`r − mean`), the degenerate-contract analog of
    * [[groupAdvantage]]. Joins the group-keyed [[lengthBiasStats]] back
    * onto the feed: one aggregation + one group-keyed join. */
  def lengthDebias(df: DataFrame, groupCols: Seq[String],
      rewardCol: Column, lenCol: Column,
      outCol: String = "reward_debiased"): DataFrame = {
    checkCols(df, Seq(outCol))
    val stats = lengthBiasStats(df, groupCols, rewardCol, lenCol)
      .select(groupCols.map(col) ++ Seq(
        col("n").as("__dn"), col("slope").as("__db"),
        col("intercept").as("__da")): _*)
    val meanStats = df.groupBy(groupCols.map(col): _*)
      .agg((gf.exact_sum(rewardCol.cast("double")) /
        count(rewardCol)).as("__dmean"))
    df.join(stats, groupCols, "left")
      .join(meanStats, groupCols, "left")
      .withColumn(outCol,
        when(rewardCol.isNull || lenCol.isNull,
          lit(null).cast("double"))
          .when(col("__db").isNotNull,
            rewardCol.cast("double") -
              (col("__da") + col("__db") * lenCol.cast("double")))
          .otherwise(rewardCol.cast("double") - col("__dmean")))
      .drop("__dn", "__db", "__da", "__dmean")
  }

  /** Per-group KL-divergence estimates between the policy that
    * GENERATED logged samples and a frozen reference model, from their
    * per-token logprobs — the KL-penalty bookkeeping every
    * RLHF/PPO-style recipe logs per batch (the k1/k2/k3 estimators of
    * Schulman 2020, "Approximating KL Divergence"). With
    * `logr = logp_ref − logp_policy` on samples drawn from the policy:
    *
    *  - `k1 = mean(−logr)` — the naive unbiased estimator (high
    *    variance, can go negative);
    *  - `k2 = mean(logr² / 2)` — low variance, biased;
    *  - `k3 = mean(exp(logr) − 1 − logr)` — unbiased AND non-negative
    *    term-by-term (the Bregman form), the default in practice.
    *
    * One map-side-combined aggregation; sums run through
    * [[gf.exact_sum]] so each estimate is bit-stable under any
    * partitioning. Rows with a NULL logprob on either side are
    * refused work (dropped), counted out of `n`. */
  def klEstimators(df: DataFrame, groupCols: Seq[String],
      policyLogpCol: Column, refLogpCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val lp = policyLogpCol.cast("double")
    val lr = refLogpCol.cast("double")
    val logr = lr - lp
    df.where(lp.isNotNull && lr.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        gf.exact_sum(-logr).as("__s1"),
        gf.exact_sum(logr * logr / 2).as("__s2"),
        gf.exact_sum(exp(logr) - 1 - logr).as("__s3"))
      .select(groupCols.map(col) ++ Seq(col("n"),
        (col("__s1") / col("n")).as("k1"),
        (col("__s2") / col("n")).as("k2"),
        (col("__s3") / col("n")).as("k3")): _*)
  }

  /** Group-DRO mixture weights (Sagawa et al. 2020, "Distributionally
    * Robust Neural Networks"): upweight the WORST groups —
    * `w_g ∝ exp(η · mean_loss_g)`, normalized over the groups — the
    * reweighting signal a robust-mixture trainer feeds back into its
    * sampler. Computed overflow-stable (max-shifted softmax). One
    * exact_sum aggregation to group means; the softmax runs over the
    * group-count-bounded frame via windows. NULL losses are refused
    * work. Returns (groupCols…, n, mean_loss, weight). */
  def groupDroWeights(df: DataFrame, groupCols: Seq[String],
      lossCol: Column, eta: Double = 1.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(eta > 0, "eta must be > 0")
    val l = lossCol.cast("double")
    val g = df.where(l.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (gf.exact_sum(l) / count(lit(1))).as("mean_loss"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    g.withColumn("__ew",
        exp(lit(eta) * (col("mean_loss") -
          max(col("mean_loss")).over(wAll))))
      .withColumn("weight", col("__ew") / sum(col("__ew")).over(wAll))
      .drop("__ew")
  }

  /** PPO clipping telemetry (Schulman et al. 2017): from per-sample
    * new/old policy logprobs and advantages, the per-group numbers a
    * PPO trainer watches — the probability ratio `r = e^{Δ}`
    * (Δ = logπ_new − logπ_old), the clip census
    * `clip_frac = P(|r − 1| > ε)` (how often the trust region binds —
    * computed on Δ against `ln(1±ε)` so the census is exact under
    * exact Δ), the clipped-surrogate mean
    * `mean(min(r·A, clip(r, 1−ε, 1+ε)·A))`, and `approx_kl =
    * mean((r − 1) − Δ)` (the k3 estimator, non-negative). One
    * exact_sum aggregation; NULLs are refused work. Returns
    * (groupCols…, n, n_clipped, clip_frac, mean_ratio, mean_surrogate,
    * approx_kl). */
  def ppoClipStats(df: DataFrame, groupCols: Seq[String],
      newLogpCol: Column, oldLogpCol: Column, advantageCol: Column,
      eps: Double = 0.2): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    val delta = newLogpCol.cast("double") - oldLogpCol.cast("double")
    val a = advantageCol.cast("double")
    val r = exp(delta)
    val clipped = delta > math.log1p(eps) || delta < math.log1p(-eps)
    val surr = least(r * a,
      greatest(least(r, lit(1.0 + eps)), lit(1.0 - eps)) * a)
    df.where(delta.isNotNull && a.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(clipped.cast("long")).as("n_clipped"),
        (gf.exact_sum(r) / count(lit(1))).as("mean_ratio"),
        (gf.exact_sum(surr) / count(lit(1))).as("mean_surrogate"),
        (gf.exact_sum((r - 1) - delta) / count(lit(1)))
          .as("approx_kl"))
      .withColumn("clip_frac",
        col("n_clipped").cast("double") / col("n"))
  }

  /** DPO batch telemetry (Rafailov et al. 2023, "Direct Preference
    * Optimization"): from per-pair policy/reference logprobs of the
    * chosen and rejected responses, the numbers a DPO trainer logs
    * per group — implicit-reward margin
    * `m = (logπ_c − logref_c) − (logπ_r − logref_r)`, accuracy
    * `P(m > 0)` (the implicit reward ranks the pair correctly), mean
    * implicit rewards `β·(logπ − logref)` per side, and the loss
    * `−ln σ(β·m)` folded through the overflow-stable softplus
    * `max(x, 0) + log1p(e^{−|x|})`. One exact_sum aggregation; NULL
    * logprobs on any side are refused work. Returns (groupCols…, n,
    * n_correct, accuracy, mean_margin, mean_loss, rew_chosen,
    * rew_rejected). */
  def dpoReceipts(df: DataFrame, groupCols: Seq[String],
      chosenPolicyLogp: Column, rejectedPolicyLogp: Column,
      chosenRefLogp: Column, rejectedRefLogp: Column,
      beta: Double = 0.1): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(beta > 0, "beta must be > 0")
    val cp = chosenPolicyLogp.cast("double")
    val rp = rejectedPolicyLogp.cast("double")
    val cr = chosenRefLogp.cast("double")
    val rr = rejectedRefLogp.cast("double")
    val margin = (cp - cr) - (rp - rr)
    val x = lit(beta) * margin
    // −ln σ(x) = softplus(−x), computed overflow-stable
    val loss = greatest(-x, lit(0.0)) + log1p(exp(-abs(x)))
    df.where(cp.isNotNull && rp.isNotNull && cr.isNotNull &&
        rr.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum((margin > 0).cast("long")).as("n_correct"),
        (gf.exact_sum(margin) / count(lit(1))).as("mean_margin"),
        (gf.exact_sum(loss) / count(lit(1))).as("mean_loss"),
        (gf.exact_sum(lit(beta) * (cp - cr)) / count(lit(1)))
          .as("rew_chosen"),
        (gf.exact_sum(lit(beta) * (rp - rr)) / count(lit(1)))
          .as("rew_rejected"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n"))
  }

  /** Speculative-decoding acceptance telemetry (Leviathan et al. 2023,
    * "Fast Inference from Transformers via Speculative Decoding"): from
    * logged per-token draft/target logprobs, the per-group mean
    * acceptance probability `α = mean(min(1, p_target/p_draft))` — the
    * modified-rejection-sampling accept rule — and the expected tokens
    * emitted per k-token draft block under the constant-α model,
    * `E = (1 − α^(k+1)) / (1 − α)` (= k+1 at α = 1): the two numbers
    * that decide whether a draft model pays for itself. One map-side-
    * combined aggregation through [[gf.exact_sum]]; NULL logprobs are
    * refused work. Returns (groupCols…, n, alpha, e_tokens). */
  def specDecodeAcceptance(df: DataFrame, groupCols: Seq[String],
      draftLogpCol: Column, targetLogpCol: Column,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    val ld = draftLogpCol.cast("double")
    val lt = targetLogpCol.cast("double")
    val acc = least(lit(1.0), exp(lt - ld))
    df.where(ld.isNotNull && lt.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (gf.exact_sum(acc) / count(lit(1))).as("alpha"))
      .withColumn("e_tokens",
        when(col("alpha") === 1.0, lit((k + 1).toDouble))
          .otherwise((lit(1.0) - pow(col("alpha"), k + 1))
            / (lit(1.0) - col("alpha"))))
  }

  /** RLOO leave-one-out advantage: adds `outCol` =
    * `r − (Σ_g r − r) / (n_g − 1)` — each candidate against the mean of
    * the OTHER candidates of its prompt. Groups with a single non-null
    * candidate get 0.0 (no "others" to baseline against); NULL rewards
    * get NULL. */
  def leaveOneOutAdvantage(df: DataFrame, groupCols: Seq[String],
      rewardCol: Column, outCol: String = "adv_loo"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    checkCols(df, Seq(outCol))
    val w = Window.partitionBy(groupCols.map(col): _*)
    val r = rewardCol.cast("double")
    val n = count(r).over(w)
    val s1 = gf.exact_sum(r).over(w)
    val adv = when(r.isNull, lit(null).cast("double"))
      .when(n <= 1, lit(0.0))
      .otherwise(r - (s1 - r) / (n - lit(1)))
    df.withColumn(outCol, adv)
  }
}
