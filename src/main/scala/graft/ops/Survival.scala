package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Survival / time-to-event analysis over right-censored durations —
  * the retention-and-lifetime side of a pipeline's behavioral data:
  * how long do sessions live, how long until a crawled domain goes
  * stale, how long before a labeling task is abandoned. Each
  * observation is `(duration, event)` where `event = true` means the
  * terminal event was OBSERVED at that duration and `false` means the
  * subject was right-CENSORED there (still alive when observation
  * stopped) — discarding censored rows, the common shortcut, biases
  * every lifetime estimate downward, which is exactly what these
  * estimators exist to avoid.
  *
  * Scale shape: everything reduces first to the distinct-`(group,
  * time)` CELL frame (one count aggregation with map-side combine —
  * durations are discrete in practice: days, steps, sessions), then
  * cumulates. Grouped estimates cumulate per group (group-bounded
  * window partitions); the global/two-sample paths run through
  * [[Packing.withPrefixSumsLong]]'s distributed two-level prefix sum,
  * so a corpus-sized cell frame (continuous durations) never
  * serializes through one task.
  */
object Survival {

  /** Kaplan–Meier product-limit estimator (Kaplan & Meier 1958) of the
    * survival function, per group: one output row per distinct
    * `(groupCols…, t)` with
    * `(groupCols…, t, n_risk, n_event, n_censored, survival,
    * cum_hazard)` where
    *
    *   n_risk     = subjects with duration ≥ t (at risk just before t)
    *   survival   = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)   (dᵢ = events at tᵢ)
    *   cum_hazard = Σ_{tᵢ ≤ t} dᵢ / nᵢ        (Nelson–Aalen)
    *
    * Censored-only times appear as rows (their factor is 1) so the
    * n_risk ladder is complete; once every at-risk subject dies at
    * some tᵢ (dᵢ = nᵢ) survival is exactly 0.0 from there on (the
    * zero is flagged integrally, not left to `exp(log(0))`, which
    * Spark nulls). NULL duration/event rows are refused work.
    *
    * With `groupCols` empty the single global curve's cumulatives run
    * through the distributed prefix sum instead of a degenerate
    * one-partition window; grouped curves cumulate inside their
    * group's window partition (bounded by that group's distinct
    * times). The survival product folds as `exp(Σ ln(1 − dᵢ/nᵢ))` in
    * cell order, identically on any partitioning (integer cell counts
    * + one float fold per cell). */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String],
      timeCol: Column, eventCol: Column): DataFrame = {
    val reserved = Seq("t", "n_risk", "n_event", "n_censored",
      "survival", "cum_hazard")
    require(!groupCols.exists(reserved.contains),
      s"group columns may not be named ${reserved.mkString(", ")}")
    val t0 = timeCol.cast("double")
    val e = eventCol.cast("boolean")
    val gcols = groupCols.map(col)
    val cells = df.where(t0.isNotNull && e.isNotNull)
      .groupBy(gcols :+ t0.as("t"): _*)
      .agg(sum(e.cast("long")).as("n_event"),
        sum((!e).cast("long")).as("n_censored"))
    val withRisk =
      if (groupCols.nonEmpty) {
        val cum = Window.partitionBy(gcols: _*).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy(gcols: _*)
        val dc = col("n_event") + col("n_censored")
        cells
          .withColumn("n_risk", sum(dc).over(all) - sum(dc).over(cum)
            + col("n_event") + col("n_censored"))
          .withColumn("__cz",
            sum((col("n_event") === col("n_risk")).cast("long")).over(cum))
          .withColumn("__clg",
            sum(survLogTerm.cast(LogDec)).over(cum))
          .withColumn("__cha",
            sum(hazardTerm.cast(LogDec)).over(cum))
      } else {
        val staged = Packing.withPrefixSumsLong(
            cells.withColumn("__dc", col("n_event") + col("n_censored")),
            Seq("t"), sums = Seq("__dc" -> "__cdc"),
            totals = Seq("__dc" -> "__tot"))
          .withColumn("n_risk", col("__tot") - col("__cdc")
            + col("n_event") + col("n_censored"))
          .withColumn("__zf",
            (col("n_event") === col("n_risk")).cast("long"))
          .withColumn("__lg", survLogTerm)
          .withColumn("__ha", hazardTerm)
        Packing.withPrefixSumsDec(
          Packing.withPrefixSumsLong(staged, Seq("t"),
            sums = Seq("__zf" -> "__cz")),
          Seq("t"), Seq("__lg" -> "__clg", "__ha" -> "__cha"))
      }
    withRisk.select(gcols ++ Seq(col("t"), col("n_risk"),
      col("n_event"), col("n_censored"),
      when(col("__cz") > 0, lit(0.0))
        .otherwise(exp(col("__clg").cast("double"))).as("survival"),
      col("__cha").cast("double").as("cum_hazard")): _*)
  }

  /** Fixed-point type for the log-factor cumulatives: each `ln` term
    * is rounded to 18 decimals once, then summed EXACTLY (decimal
    * arithmetic), so the grouped window arm and the distributed
    * prefix-sum arm produce bit-identical survival values — a double
    * cumulative would drift at the last ulp whenever partitioning
    * regroups the additions. */
  private val LogDec = "decimal(38,18)"

  /** Per-cell log survival factor `ln((n − d)/n)`: 0 at censored-only
    * cells (d = 0 ⇒ ln 1) and 0 at extinction cells (d = n — the
    * integral zero flag takes over there; Spark's `log` would NULL). */
  private def survLogTerm: Column =
    when(col("n_event") > 0 && col("n_event") < col("n_risk"),
      log((col("n_risk") - col("n_event")).cast("double")
        / col("n_risk").cast("double"))).otherwise(lit(0.0))

  /** Per-cell Nelson–Aalen hazard increment d/n (0 at censored-only
    * cells; at extinction cells the increment is exactly 1). */
  private def hazardTerm: Column =
    col("n_event").cast("double") / col("n_risk").cast("double")

  /** Restricted mean survival time RMST(τ) = ∫₀^τ Ŝ(u) du — the
    * step-function integral of the global [[kaplanMeier]] curve up to
    * the horizon τ: "average useful lifetime within the first τ
    * days", the single-number summary a median can't give when the
    * curve never crosses 0.5. Durations must be ≥ 0 (fail-fast — a
    * negative duration would silently shift the origin of the
    * integral). Returns one row `(n, tau, rmst)` — rmst NULL on an
    * empty input; for τ below the first event time RMST = τ exactly
    * (survival is 1 on [0, τ)).
    *
    * Shape: the same distinct-time cell pass as [[kaplanMeier]] with
    * the cross-partition `lead` threaded through the SAME prefix-sum
    * call; segment contributions Ŝ(tᵢ)·(min(tᵢ₊₁,τ) − min(tᵢ,τ))
    * fan in through [[graft.api.functions.exact_sum]]. */
  def rmst(df: DataFrame, timeCol: Column, eventCol: Column,
      tau: Double): DataFrame = {
    require(tau > 0, "tau must be > 0")
    val t0 = timeCol.cast("double")
    val e = eventCol.cast("boolean")
    val input = df.where(t0.isNotNull && e.isNotNull)
      .select(t0.as("__t"), e.as("__e"))
    val nNeg = input.where(col("__t") < 0).count()
    require(nNeg == 0L,
      s"rmst integrates from 0: $nNeg negative durations present")
    val cells = input.groupBy(col("__t").as("t"))
      .agg(sum(col("__e").cast("long")).as("n_event"),
        sum((!col("__e")).cast("long")).as("n_censored"))
    val staged = Packing.withPrefixSumsLong(
        cells.withColumn("__dc", col("n_event") + col("n_censored")),
        Seq("t"), sums = Seq("__dc" -> "__cdc"),
        totals = Seq("__dc" -> "__tot"), leadOut = Some("__nt"))
      .withColumn("n_risk", col("__tot") - col("__cdc")
        + col("n_event") + col("n_censored"))
      .withColumn("__zf", (col("n_event") === col("n_risk")).cast("long"))
      .withColumn("__lg", survLogTerm)
    val cum = Packing.withPrefixSumDec(
      Packing.withPrefixSumsLong(staged, Seq("t"),
        sums = Seq("__zf" -> "__cz")),
      Seq("t"), "__lg", "__clg")
    val surv = when(col("__cz") > 0, lit(0.0))
      .otherwise(exp(col("__clg").cast("double")))
    // segment [tᵢ, min(tᵢ₊₁, τ)) at survival Ŝ(tᵢ); the last cell's
    // segment extends to τ (lead NULL); segments past τ contribute 0
    val segEnd = least(coalesce(col("__nt"), lit(tau)), lit(tau))
    val segStart = least(col("t"), lit(tau))
    val contrib = surv * greatest(segEnd - segStart, lit(0.0))
    val head = cum.agg(coalesce(min(col("t")), lit(tau)).as("__t1"),
      coalesce(max(col("__tot")), lit(0L)).as("__n")).collect()(0)
    val firstSeg = math.min(head.getDouble(0), tau) // Ŝ = 1 on [0, t₁)
    cum.agg(gf.exact_sum(contrib).as("__s"))
      .select(lit(head.getLong(1)).as("n"), lit(tau).as("tau"),
        when(lit(head.getLong(1)) > 0,
          col("__s") + lit(firstSeg)).as("rmst"))
  }

  /** Aalen–Johansen cumulative incidence under COMPETING RISKS: when a
    * subject can exit for one of several mutually exclusive causes
    * (churned vs banned; crawl gone-404 vs gone-robots), the naive
    * "KM on my cause, censor the others" estimator overstates every
    * cause's incidence (it redistributes competitors' mass as if those
    * subjects were still at risk). The AJ estimator attributes mass
    * through the ALL-CAUSE survival:
    *
    *   CIF_k(t) = Σ_{tᵢ ≤ t} Ŝ(tᵢ₋₁) · d_{k,i} / nᵢ
    *
    * `causeCol`: NULL-refused LONG, 0 = right-censored, any other
    * value an event cause. Returns one row per distinct (t, cause ≠ 0)
    * with `(t, cause, n_risk, n_event, cif)`; Σ_k CIF_k(∞) + Ŝ(∞) = 1
    * exactly (mass conservation — spec-pinned). The per-cause
    * cumulative runs through [[Packing.groupedPrefixSumDec]], so
    * causes × corpus-sized cell frames stay distributed AND
    * bit-deterministic.
    *
    * Shape: one all-cause cell pass (the [[kaplanMeier]] machinery
    * with the EXCLUSIVE prefix — Ŝ(tᵢ₋₁) = inclusive minus own term),
    * one (t, cause) count shuffle joined back on t, one grouped
    * decimal prefix per cause. */
  def cumulativeIncidence(df: DataFrame, timeCol: Column,
      causeCol: Column): DataFrame = {
    val t0 = timeCol.cast("double")
    val k = causeCol.cast("long")
    val base = df.where(t0.isNotNull && k.isNotNull)
      .select(t0.as("__t"), k.as("__k"))
    // all-cause cells: any non-zero cause is an event
    val cells = base.groupBy(col("__t").as("t"))
      .agg(sum((col("__k") =!= 0).cast("long")).as("n_event"),
        sum((col("__k") === 0).cast("long")).as("n_censored"))
    val staged = Packing.withPrefixSumsLong(
        cells.withColumn("__dc", col("n_event") + col("n_censored")),
        Seq("t"), sums = Seq("__dc" -> "__cdc"),
        totals = Seq("__dc" -> "__tot"))
      .withColumn("n_risk", col("__tot") - col("__cdc")
        + col("n_event") + col("n_censored"))
      .withColumn("__zf", (col("n_event") === col("n_risk")).cast("long"))
      .withColumn("__lg", survLogTerm)
    val cum = Packing.withPrefixSumDec(
      Packing.withPrefixSumsLong(staged, Seq("t"),
        sums = Seq("__zf" -> "__cz")),
      Seq("t"), "__lg", "__clg")
    // EXCLUSIVE state just before t: subtract the cell's own term
    val survPrev = when(col("__cz") - col("__zf") > 0, lit(0.0))
      .otherwise(exp((col("__clg")
        - col("__lg").cast(LogDec)).cast("double")))
    val sFrame = cum.select(col("t"), col("n_risk"),
      survPrev.as("__sp"))
    val perCause = base.where(col("__k") =!= 0)
      .groupBy(col("__t").as("t"), col("__k").as("cause"))
      .agg(count(lit(1)).as("n_event"))
      .join(sFrame, Seq("t"))
      .withColumn("__inc", col("__sp") * col("n_event").cast("double")
        / col("n_risk").cast("double"))
    Packing.groupedPrefixSumDec(perCause, col("cause"), col("t"),
        lit(0L), col("__inc"), "__cif")
      .select(col("t"), col("cause"), col("n_risk"), col("n_event"),
        col("__cif").cast("double").as("cif"))
  }

  /** Two-sample log-rank test (Mantel 1966; the hypergeometric form)
    * that the `isA === true` and `isA === false` slices share one
    * survival curve. At each distinct pooled EVENT time, side A's
    * observed events are compared with their expectation under the
    * null given the at-risk split:
    *
    *   O − E = Σᵢ (d₁ᵢ − dᵢ·n₁ᵢ/nᵢ)
    *   V     = Σᵢ dᵢ (n₁ᵢ/nᵢ)(n₀ᵢ/nᵢ)(nᵢ − dᵢ)/(nᵢ − 1)   (nᵢ ≥ 2)
    *   χ²    = (O − E)² / V          (1 dof; NULL when V = 0)
    *
    * Returns one row `(n_a, n_b, events_a, events_b, o_minus_e,
    * var_o, chi2)`. NULL duration/event/side rows are refused work.
    *
    * Shape: one count aggregation into distinct-time cells, at-risk
    * ladders from the distributed prefix sum, terms fanned in through
    * [[graft.api.functions.exact_sum]] — bit-identical on any
    * partitioning, nothing corpus-sized on one task. */
  def logRank(df: DataFrame, timeCol: Column, eventCol: Column,
      isA: Column): DataFrame = {
    val t0 = timeCol.cast("double")
    val e = eventCol.cast("boolean")
    val a = isA.cast("boolean")
    val cells = df.where(t0.isNotNull && e.isNotNull && a.isNotNull)
      .groupBy(t0.as("t"))
      .agg(sum(when(a, e.cast("long")).otherwise(0L)).as("d1"),
        sum(when(!a, e.cast("long")).otherwise(0L)).as("d0"),
        sum(a.cast("long")).as("m1"),
        sum((!a).cast("long")).as("m0"))
    val cum = Packing.withPrefixSumsLong(cells, Seq("t"),
      sums = Seq("m1" -> "__c1", "m0" -> "__c0"),
      totals = Seq("m1" -> "__t1", "m0" -> "__t0"))
    val n1 = (col("__t1") - col("__c1") + col("m1")).cast("double")
    val n0 = (col("__t0") - col("__c0") + col("m0")).cast("double")
    val n = n1 + n0
    val d = (col("d1") + col("d0")).cast("double")
    val oeTerm = when(col("d1") + col("d0") > 0,
      col("d1").cast("double") - d * n1 / n).otherwise(lit(0.0))
    val vTerm = when(col("d1") + col("d0") > 0 && n >= 2.0,
      d * (n1 / n) * (n0 / n) * (n - d) / (n - lit(1.0)))
      .otherwise(lit(0.0))
    cum.agg(max(col("__t1")).as("n_a"), max(col("__t0")).as("n_b"),
        coalesce(sum(col("d1")), lit(0L)).as("events_a"),
        coalesce(sum(col("d0")), lit(0L)).as("events_b"),
        gf.exact_sum(oeTerm).as("o_minus_e"),
        gf.exact_sum(vTerm).as("var_o"))
      .withColumn("chi2", when(col("var_o") > 0,
        col("o_minus_e") * col("o_minus_e") / col("var_o")))
  }

  /** Cox proportional-hazards regression with ONE covariate (Cox
    * 1972; Breslow tie handling) — the model the rest of this suite
    * feeds: [[logRank]] says "these curves differ", Cox says "each
    * unit of x multiplies the hazard by e^β" (document age vs
    * retention-after-dedup, quality score vs time-to-removal). Newton
    * iterations on the Breslow partial likelihood: with risk-set sums
    * S_k(t) = Σ_{t_j ≥ t} x_j^k·e^{βx_j},
    *
    *   U(β) = Σ_{event cells} (Σ_events x − d_t·S₁/S₀),
    *   I(β) = Σ_{event cells} d_t·(S₂/S₀ − (S₁/S₀)²),
    *   β ← β + U/I   (full Newton from β₀ = 0, fixed `iterations`)
    *
    * Returns one row `(n, n_events, beta, hr, se, u_final)` —
    * `u_final` is the post-fit gradient RECEIPT (|U| near 0 ⇔
    * converged; a caller who sees 1e-2 should raise `iterations`,
    * not trust β); beta/hr/se NULL when the information I is not
    * strictly positive at any step (constant covariate, no events, or
    * a separation-degenerate fit). NULL time/event/covariate rows are
    * refused work.
    *
    * `strataCols` fits the STRATIFIED model (one baseline hazard per
    * stratum, one shared β): risk sets never cross stratum
    * boundaries, so a per-source or per-shard baseline shift cannot
    * confound the covariate effect — the Cox-side analogue of
    * [[graft.ops.Eval.mantelHaenszel]]'s stratification. U and I add
    * across strata; strata are bounded by `maxStrata` (their totals
    * are collected to seed the per-stratum suffix offsets).
    *
    * Shape: each iteration is ONE distinct-(stratum, time) count
    * shuffle (cells
    * carry Σe^{βx}, Σxe^{βx}, Σx²e^{βx}, d_t, Σ_events x via
    * [[graft.api.functions.exact_sum]]) plus ONE two-level DECIMAL
    * suffix-sum pass ([[Packing.withPrefixSumsDec]] on the negated
    * time key — no single-task window even when every timestamp is
    * distinct), then a driver-side scalar Newton step: `iterations`
    * corpus scans total, nothing corpus-sized ever collected.
    * Covariates should be centered/scaled so |βx| stays well under
    * ~40 (e^{βx} must fit DECIMAL(38,18)'s 20 integer digits —
    * fail-fast, not silent). */
  def coxPH(df: DataFrame, timeCol: Column, eventCol: Column,
      xCol: Column, strataCols: Seq[String] = Nil,
      iterations: Int = 8, maxStrata: Int = 10000): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      "iterations must be in [1, 64]")
    val t = timeCol.cast("double")
    val e = eventCol.cast("boolean")
    val x = xCol.cast("double")
    // stratum key: one orderable string; "" = the unstratified fit
    val sKey =
      if (strataCols.isEmpty) lit("")
      else concat_ws("", strataCols.map(c => col(c).cast("string")): _*)
    val strataNotNull =
      if (strataCols.isEmpty) lit(true)
      else strataCols.map(c => col(c).isNotNull).reduce(_ && _)
    val base = df.where(t.isNotNull && e.isNotNull && x.isNotNull &&
        strataNotNull)
      .select(sKey.as("__s"), t.as("__t"), e.as("__e"), x.as("__x"))
      .localCheckpoint(eager = false)
    val head = base.agg(count(lit(1)).as("n"),
      coalesce(sum(col("__e").cast("long")), lit(0L)).as("d"),
      coalesce(max(abs(col("__x"))), lit(0.0)).as("xm")).collect()(0)
    val (n, nEvents) = (head.getLong(0), head.getLong(1))
    val xMax = head.getDouble(2)
    val spark = df.sparkSession
    def out(beta: java.lang.Double, se: java.lang.Double,
        u: java.lang.Double): DataFrame = {
      def c(v: java.lang.Double) =
        if (v == null) lit(null).cast("double") else lit(v.doubleValue)
      spark.range(1).select(lit(n).as("n"), lit(nEvents).as("n_events"),
        c(beta).as("beta"),
        (if (beta == null) lit(null).cast("double")
         else exp(lit(beta.doubleValue))).as("hr"), c(se).as("se"),
        c(u).as("u_final"))
    }
    if (n == 0 || nEvents == 0) return out(null, null, null)
    if (strataCols.nonEmpty) {
      // the maxStrata contract, checked once up front (it used to ride
      // the per-iteration per-stratum totals job, now removed)
      val ns = base.select(col("__s")).distinct()
        .limit(maxStrata + 1).count()
      require(ns <= maxStrata, s"more than maxStrata=$maxStrata strata")
    }
    var beta = 0.0
    var info = Double.NaN
    var grad = Double.NaN
    var it = 0
    while (it <= iterations) { // last pass only evaluates U (receipt)
      require(math.abs(beta) * xMax < 40.0,
        f"|beta*x| = ${math.abs(beta) * xMax}%.1f escapes the " +
          "DECIMAL(38,18) suffix-sum range — center/scale the covariate")
      val w = exp(lit(beta) * col("__x"))
      val cells = base.groupBy(col("__s"), col("__t")).agg(
        gf.exact_sum(w).as("__s0"),
        gf.exact_sum(col("__x") * w).as("__s1"),
        gf.exact_sum(col("__x") * col("__x") * w).as("__s2"),
        coalesce(sum(col("__e").cast("long")), lit(0L)).as("__d"),
        gf.exact_sum(when(col("__e"), col("__x")).otherwise(lit(0.0)))
          .as("__sxe"))
        .withColumn("__nt", -col("__t"))
      // ONE grouped (stratum | −t) prefix pass gives every stratum its
      // risk-set suffix sums directly — per-(partition, stratum) offsets
      // collected once (bounded by #strata + #partitions), no separate
      // per-stratum totals job, no run-in subtraction. Decimal adds are
      // exact, so this is bit-identical to the former global-prefix +
      // run-in formulation over the same addends. (r14 optimization:
      // 4 actions/Newton round → 3, and one base scan instead of two.)
      val suf = Packing.groupedPrefixSumsDec(cells.drop("__t"),
        col("__s"), col("__nt"), lit(0L),
        Seq("__s0" -> "__S0", "__s1" -> "__S1", "__s2" -> "__S2"))
      val s1r = col("__S1").cast("double") / col("__S0").cast("double")
      val ui = suf.where(col("__d") > 0).agg(
        gf.exact_sum(col("__sxe")
          - col("__d").cast("double") * s1r).as("u"),
        gf.exact_sum(col("__d").cast("double")
          * (col("__S2").cast("double") / col("__S0").cast("double")
            - s1r * s1r)).as("i")).collect()(0)
      grad = ui.getDouble(0)
      info = ui.getDouble(1)
      if (!(info > 0)) return out(null, null, null)
      if (it < iterations) beta += grad / info
      it += 1
    }
    out(beta, 1.0 / math.sqrt(info), grad)
  }
}
