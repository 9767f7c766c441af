package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Deterministic, hash-based sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: membership changes with
  * partitioning, task retries, and Spark versions — unusable for
  * train/val/test splits that must be stable across reprocessing runs of a
  * 100 TB corpus. Everything here derives membership from `hash64(key)`
  * (the engine's splitmix64 finalizer) instead: a pure function of the row
  * key, reproducible anywhere, and free of coordination — no shuffle, no
  * state, each task decides membership row-locally inside whole-stage
  * codegen.
  *
  * Buckets use the TOP-level 2^20 grid via `hash64 & (2^20-1)`: a
  * power-of-two mask keeps signed/unsigned semantics identical on every
  * engine (unsigned mod m equals Java's masked value only when m divides
  * 2^64), which is what makes the DuckDB oracle bit-exact.
  */
object Sampling {

  /** Number of hash buckets the split grid uses (2^20). */
  final val Buckets: Long = 1L << 20

  /** The row's split bucket in [0, 2^20): `hash64(key) & (2^20 − 1)`. */
  def bucket(key: Column): Column =
    gf.hash64(key).bitwiseAND(lit(Buckets - 1))

  /** Per-draw decorrelation constant (32-bit golden ratio — small enough
    * that `i * DrawMix` never overflows under ANSI arithmetic; the
    * avalanche downstream supplies the mixing). */
  private val DrawMix = 0x9e3779b9L

  /** Deterministic WEIGHTED fixed-size sample for INTEGER weights: row
    * priority = unsigned min over `weight` independent hash draws of the
    * key; keep the `k` smallest. Each of a row's draws competes like one
    * unit-weight clone, so selection probability matches successive
    * weighted draws without replacement — and everything is integer
    * arithmetic: partitioning-invariant, retry-stable, bit-reproducible by
    * an external engine. O(weight) per row — for duplication factors /
    * quality tiers (≤ ~10^4); for real-valued weights use
    * [[weightedBottomKES]]. Rows with weight ≤ 0 are never sampled. */
  def weightedBottomK(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val h0 = gf.hash64(key)
    // guard BEFORE sequence(): sequence(0, w-1) with w ≤ 0 would count
    // DOWN and still emit draws
    val draws = when(weight.cast("long") >= 1L, array_min(transform(
      sequence(lit(0L), weight.cast("long") - 1),
      i => gf.hash64(h0.bitwiseXOR(i * lit(DrawMix)))
        .bitwiseXOR(lit(Long.MinValue)))))
    df.withColumn("__wp", draws)
      .where(col("__wp").isNotNull)
      .orderBy(col("__wp"), key).limit(k).drop("__wp")
  }

  /** Efraimidis–Spirakis A-ES for REAL-VALUED weights: priority =
    * −ln(u)/w with u = hash64(key) mapped to (0,1); keep the k smallest —
    * inclusion probability proportional to weight, still a pure function
    * of the key (deterministic, partitioning-invariant). Floating-point:
    * priorities are reproducible on the JVM but not bit-portable across
    * engines (libm log differs by ulps) — yet only the SELECTION BOUNDARY
    * decides the sample, and the rank-k/k+1 gap is set by the data, not
    * the arithmetic (measured ≥ 3e-3 relative on the gate fixtures —
    * thirteen orders above ulp noise), so the sampled ID SET is
    * engine-stable and oracle-gated (q111) even though the priorities
    * themselves aren't. Rows with weight ≤ 0 or NULL are never sampled. */
  def weightedBottomKES(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val h = gf.hash64(key)
    // unsigned 64-bit → (0, 1]: two 32-bit halves keep rounding benign
    val unit = (shiftrightunsigned(h, 32).cast("double") * 4294967296.0 +
      h.bitwiseAND(lit(0xffffffffL)).cast("double") + 1.0) /
      1.8446744073709552e19
    val pr = -log(unit) / weight.cast("double")
    df.withColumn("__wp", when(weight.cast("double") > 0.0, pr))
      .where(col("__wp").isNotNull)
      .orderBy(col("__wp"), key).limit(k).drop("__wp")
  }

  /** Cumulative bucket thresholds for `weights` (normalized to sum 1). */
  private[ops] def thresholds(weights: Seq[Double]): Seq[Long] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be > 0")
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c / total * Buckets).toLong)
  }

  /** Adds `splitCol` ∈ labels: a deterministic disjoint split of the rows by
    * `key`, with fractions proportional to the label weights (exact up to
    * the 2^20 bucket grid, i.e. ±1e-6). Same key → same split, always. */
  def hashSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    val ts = thresholds(splits.map(_._2))
    val b = bucket(key)
    val c = splits.init.zip(ts.init).foldRight(
      lit(splits.last._1): Column) { case (((label, _), t), acc) =>
      when(b < lit(t), label).otherwise(acc)
    }
    df.withColumn(splitCol, c)
  }

  /** Time-based train/eval split with an EMBARGO gap (the purged-split
    * discipline of temporal ML, López de Prado 2018 §7, applied to
    * training-data curation): rows strictly before `cutoff − embargo`
    * are `train`, rows at/after `cutoff` are `test`, and rows inside
    * the gap are labeled `embargo` — meant to be dropped. With
    * temporally autocorrelated content (sessions, rolling stats,
    * recrawls of the same page), rows adjacent in time leak label
    * information across a naive boundary; the gap makes the two sides
    * independent at the chosen horizon. A hash split ([[hashSplit]])
    * cannot provide this: it mixes future into train by construction.
    *
    * Row-local predicate — no shuffle, survives any partitioning; same
    * (ts, cutoff, embargo) → same split, always. `embargo` is an
    * interval column (e.g. `expr("INTERVAL 3 DAYS")`). */
  def temporalSplit(df: DataFrame, tsCol: Column, cutoff: Column,
      embargo: Column, splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol,
      when(tsCol < cutoff - embargo, "train")
        .when(tsCol >= cutoff, "test")
        .otherwise("embargo"))

  /** Cross-split entity-leakage receipt: how many distinct entities
    * (users, sessions, domains) have rows in BOTH splits of each split
    * pair. A temporal split keeps time-leakage out; this measures the
    * orthogonal leak — the same entity straddling the boundary — so a
    * pipeline can decide whether to group-split instead
    * ([[splitByComponents]]' role for near-dup components). Scale
    * shape: the corpus reduces to DISTINCT (entity, split) rows first
    * (one map-side-combined shuffle); the self-join runs on that
    * entity-sized frame, never on rows. */
  def entityOverlap(df: DataFrame, entityCol: Column,
      splitCol: String = "split"): DataFrame = {
    val es = df.select(entityCol.as("__e"), col(splitCol).as("__s"))
      .where(col("__e").isNotNull && col("__s").isNotNull).distinct()
      .localCheckpoint()
    es.as("a").join(es.as("b"),
        col("a.__e") === col("b.__e") && col("a.__s") < col("b.__s"))
      .groupBy(col("a.__s").as("split_a"), col("b.__s").as("split_b"))
      .agg(count(lit(1)).as("entities"))
  }

  /** Deterministic uniform sample of ≈`fraction` of the rows (by `key`).
    * Subset-monotone: the 5% sample is a subset of the 10% sample. */
  def uniformSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.where(bucket(key) < lit(math.floor(fraction * Buckets).toLong))
  }

  /** Stratified deterministic sample: the `kPerGroup` rows with the
    * smallest unsigned `hash64(key)` within EACH group — per-class caps /
    * balanced subsets with the same reproducibility contract as [[bottomK]].
    * Runs as a rank-filter window, which Spark executes with
    * WindowGroupLimit: each partition retains only k rows per group BEFORE
    * the shuffle, so the full data never sorts. */
  def stratifiedBottomK(df: DataFrame, groupCol: Column, key: Column,
      kPerGroup: Int): DataFrame = {
    require(kPerGroup > 0, "kPerGroup must be > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(gf.hash64(key).bitwiseXOR(lit(Long.MinValue)))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= kPerGroup).drop("__rn")
  }

  /** Deterministic source-mixture sampling: draw ≈`totalRows` rows with
    * group proportions matching `targets` (label → weight, normalized) —
    * the data-mixing step that rebalances corpus sources to a training
    * recipe (e.g. 50% web / 30% books / 20% code). Per-group quota =
    * ⌊totalRows · w/Σw⌋; within each group membership is the quota-many
    * smallest unsigned `hash64(key)` rows, so the draw is a pure function
    * of the key (reproducible, subset-stable as quotas grow). Groups absent
    * from `targets` are dropped; a group smaller than its quota contributes
    * everything it has (the mixture then under-fills rather than
    * over-sampling others).
    *
    * Scale shape: one rank-filter window per group. The literal
    * max-quota bound keeps Spark's WindowGroupLimit rewrite applicable, so
    * each task retains at most maxQuota rows per group BEFORE the shuffle;
    * the exact per-group quota then filters after ranking. */
  def mixtureSample(df: DataFrame, groupCol: Column, key: Column,
      targets: Seq[(Any, Double)], totalRows: Long): DataFrame = {
    require(!df.columns.contains("__rn"),
      "input may not contain reserved column __rn")
    require(totalRows > 0, "totalRows must be > 0")
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty with positive weights")
    require(targets.map(_._1).distinct.length == targets.length,
      "duplicate target labels")
    val total = targets.map(_._2).sum
    val quotas = targets.map { case (l, w) =>
      l -> math.floor(totalRows * w / total).toLong }
    quotaSample(df, groupCol, key, quotas)
  }

  /** Membership filter for EXPLICIT per-group row quotas: each group keeps
    * its quota-many smallest unsigned `hash64(key)` rows (the same
    * reproducible hash bottom-k as [[mixtureSample]], which delegates
    * here). Groups absent from `quotas` are dropped. The literal max-quota
    * bound keeps the WindowGroupLimit rewrite applicable — each task
    * retains at most maxQuota rows per group BEFORE the shuffle. */
  def quotaSample(df: DataFrame, groupCol: Column, key: Column,
      quotas: Seq[(Any, Long)]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "input may not contain reserved column __rn")
    require(quotas.map(_._1).distinct.length == quotas.length,
      "duplicate quota labels")
    require(quotas.forall(_._2 >= 0), "quotas must be >= 0")
    if (quotas.isEmpty) return df.limit(0)
    val maxQ = quotas.map(_._2).max
    val quotaCol = quotas.foldRight(lit(0L): Column) { case ((l, q), acc) =>
      when(groupCol === lit(l), lit(q)).otherwise(acc)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(gf.hash64(key).bitwiseXOR(lit(Long.MinValue)))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= lit(maxQ) && col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Deterministic per-group COST-budget sampling — "take ≈N tokens per
    * source", the budgeting step a training recipe runs after choosing
    * mixture proportions (mixture quotas count ROWS; corpora with skewed
    * document lengths need the budget in tokens/bytes, which is this op).
    * Docs rank within their group by unsigned `hash64(key)` (the same
    * reproducible, subset-monotone order every sampler here uses), and a
    * doc is kept iff the cumulative cost of all docs BEFORE it is strictly
    * under `budgetPerGroup` — so each non-empty group keeps at least one
    * doc and overshoots by at most one document.
    *
    * Scale shape: membership is computed on a (group, key, cost)
    * PROJECTION — three narrow columns ride the per-group window sort,
    * never text or vectors — and the kept keys semi-join back to the full
    * rows. NULL costs count as 0 (kept for free); rows with NULL group are
    * dropped (no budget to charge them against). */
  def budgetSample(df: DataFrame, groupCol: Column, key: Column,
      cost: Column, budgetPerGroup: Long): DataFrame = {
    require(budgetPerGroup > 0, "budgetPerGroup must be > 0")
    import org.apache.spark.sql.expressions.Window
    val proj = df.select(groupCol.as("__g"), key.as("__k"),
        coalesce(cost.cast("long"), lit(0L)).as("__c"))
      .where(col("__g").isNotNull)
    val w = Window.partitionBy(col("__g"))
      .orderBy(gf.hash64(col("__k")).bitwiseXOR(lit(Long.MinValue)),
        col("__k"))
    val before = coalesce(
      sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val members = proj.withColumn("__before", before)
      .where(col("__before") < lit(budgetPerGroup))
      .select(col("__k"))
    df.join(members, key === col("__k"), "left_semi")
  }

  /** Temperature-scaled mixture sampling: per-group weights w_g ∝ n_g^alpha
    * (n_g = the group's row count), the multilingual/multi-source rebalance
    * rule popularized by T5/mT5 — alpha = 1 keeps natural proportions,
    * alpha = 0 is uniform over groups, values in between up-sample the tail
    * relative to the head. Weights come from ONE count aggregation (group
    * cardinality must be bounded — sources/languages, not documents; the
    * count map is collected to the driver exactly like a training recipe
    * would be), then membership is [[mixtureSample]]'s hash bottom-k: a pure
    * function of the key, reproducible under any partitioning.
    *
    * Floating point: quotas are ⌊totalRows · n^alpha / Σ n^alpha⌋ in
    * doubles. pow/division ulps only matter if a quota product lands within
    * ulps of an integer — at the gate fixtures the measured distance is
    * ≥ 1e-2 quota units, ~13 orders above cross-engine libm drift. */
  def temperatureMixture(df: DataFrame, groupCol: Column, key: Column,
      alpha: Double, totalRows: Long, maxGroups: Int = 100000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    require(maxGroups > 0, "maxGroups must be > 0")
    // NULL groups are excluded up front (a null can never equal a quota
    // label, so its quota would be silently wasted); group values stay
    // NATIVE-typed so the quota comparison in [[mixtureSample]] never
    // relies on implicit string casts. Sort order only fixes the
    // when-chain fold order — labels are distinct, so it is cosmetic.
    // the bounded-cardinality contract is ENFORCED, not just documented:
    // collecting through a maxGroups+1 limit keeps the driver safe even
    // when misuse groups by document, and the overflow fails fast with a
    // usable message instead of an OOM
    val counts = df.where(groupCol.isNotNull).groupBy(groupCol.as("__g"))
      .agg(count(lit(1)).as("__n")).limit(maxGroups + 1).collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortBy(t => String.valueOf(t._1))
    require(counts.length <= maxGroups,
      s"temperatureMixture saw more than maxGroups=$maxGroups distinct " +
        "groups — the group column must be recipe-sized (sources/" +
        "languages), not document-sized; raise maxGroups if intended")
    if (counts.isEmpty) return df.limit(0) // no observed groups → empty
    val targets = counts.toSeq.map { case (g, n) =>
      (g, math.pow(n.toDouble, alpha)) }
    mixtureSample(df, groupCol, key, targets, totalRows)
  }

  /** Temperature-rebalanced TOKEN budgets — the multilingual τ-sampling
    * recipe (Conneau & Lample 2019) in the unit production mixtures are
    * written in, at τ = 2 (share ∝ √ token-mass: up-weights small
    * sources, caps the head): per-source budget = largest-remainder
    * (Hamilton) apportionment of `totalTokens` over weights
    * w_s = round(√n_s · 10^6).
    *
    * Engine-portability is structural, not tolerance-based: √ is
    * IEEE-correctly-rounded on every engine, the 10^6 scaling makes the
    * weights integers (an exact-.5 round boundary would need √n to be
    * a non-integer rational — impossible), and from there quota =
    * (total · w_s) div W and remainder = (total · w_s) mod W are pure
    * LONG arithmetic with (remainder DESC, source ASC) tie ranks —
    * bit-free of floating point. Bounds: total · w_s must fit a long
    * (total ≤ 2^62 / max w_s; at 10^12-token sources w ≈ 10^12, so
    * budgets up to ~4M tokens per call — apportion per-epoch, not
    * per-corpus-lifetime, or pre-scale weights down).
    *
    * Group cardinality is recipe-sized and ENFORCED (maxGroups), like
    * [[temperatureMixture]]. Returns (source, n_tokens, weight,
    * budget): Σ budget == totalTokens exactly. */
  def temperatureTokenBudgets(df: DataFrame, groupCol: Column,
      tokensCol: Column, totalTokens: Long,
      maxGroups: Int = 100000): DataFrame = {
    require(totalTokens >= 0, "totalTokens must be >= 0")
    require(maxGroups > 0, "maxGroups must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val masses = df.where(groupCol.isNotNull)
      .groupBy(groupCol.cast("string").as("__g"))
      .agg(coalesce(sum(tokensCol.cast("long")), lit(0L)).as("__n"))
      .limit(maxGroups + 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(masses.length <= maxGroups,
      s"temperatureTokenBudgets saw more than maxGroups=$maxGroups " +
        "distinct groups — group by sources/languages, not documents")
    val weights = masses.map { case (g, n) =>
      (g, n, math.round(math.sqrt(n.toDouble) * 1e6)) }
    val bigW = weights.map(_._3).sum
    require(bigW > 0, "no token mass to apportion")
    weights.foreach { case (_, _, w) =>
      require(w == 0 || totalTokens <= Long.MaxValue / math.max(w, 1L),
        "totalTokens * weight overflows long — pre-scale (see scaladoc)")
    }
    val quotas = weights.map { case (g, n, w) =>
      (g, n, w, totalTokens * w / bigW, totalTokens * w % bigW) }
    val leftover = totalTokens - quotas.map(_._4).sum
    val bump = quotas.sortBy { case (g, _, _, _, rem) => (-rem, g) }
      .take(leftover.toInt).map(_._1).toSet
    quotas.map { case (g, n, w, q, _) =>
      (g, n, w, q + (if (bump(g)) 1L else 0L)) }
      .toSeq.toDF("source", "n_tokens", "weight", "budget")
  }

  /** Feasible mixture plan: water-filling allocation of a total row/token
    * budget across sources with availability caps — the solver a training
    * recipe runs BEFORE sampling. Target weights say what the mixture
    * SHOULD be; availability says what each source HAS; the plan is the
    * unique allocation q_s = min(a_s, λ·w_s) with Σq = min(total, Σa):
    * sources that can't fill their proportional share are capped at
    * everything they have and the shortfall re-spreads over the rest —
    * exactly proportionally, not greedily.
    *
    * Closed form instead of iteration: sort sources by saturation ratio
    * r_s = a_s/w_s ascending; the capped set is a prefix of that order,
    * and λ = (total − Σ_{capped} a) / Σ_{uncapped} w at the first row
    * where λ < r. Prefix/suffix sums run over LONG availabilities, so
    * with integer-valued weights every intermediate is exact and the plan
    * is bit-reproducible across engines (fractional weights stay correct,
    * merely summing in this implementation's order).
    *
    * Scale shape: `avail` is a per-source aggregate (sources, not
    * documents — bounded like a recipe; collected to the driver the same
    * way [[temperatureMixture]] collects counts). The result is a
    * sources-sized plan table: (label, available, weight, quota). Apply
    * it with [[quotaSample]] — quotas count whatever unit `avail` counts
    * (rows here; pair with [[budgetSample]] for cost units).
    *
    * @param avail    (label, available) one row per source; label must be
    *                 a string column (sources/domains/languages)
    * @param targets  label → target weight (≥ 0; missing labels get 0)
    * @param total    budget in the same unit as `available`
    */
  def mixturePlan(avail: DataFrame, labelCol: String, availCol: String,
      targets: Seq[(String, Double)], total: Long): DataFrame = {
    require(total >= 0, "total must be >= 0")
    require(targets.map(_._1).distinct.length == targets.length,
      "duplicate target labels")
    require(targets.forall(_._2 >= 0), "target weights must be >= 0")
    val wmap = targets.toMap
    val rows = avail
      .select(col(labelCol).cast("string").as("__l"),
        col(availCol).cast("long").as("__a"))
      .where(col("__l").isNotNull)
      .collect()
      .map(r => (r.getString(0), math.max(r.getLong(1), 0L)))
    require(rows.map(_._1).distinct.length == rows.length,
      s"duplicate labels in $labelCol — pass a per-source aggregate")
    // saturation order; weight-0 sources sort last (never capped, quota 0)
    val sorted = rows.map { case (l, a) => (l, a, wmap.getOrElse(l, 0.0)) }
      .sortBy { case (l, a, w) =>
        (if (w > 0) a.toDouble / w else Double.PositiveInfinity, l) }
    val n = sorted.length
    // exact suffix weight sums (integer-valued weights stay exact in
    // double; the reverse-fold order matches a window suffix sum)
    val suffixW = new Array[Double](n + 1)
    for (i <- (n - 1) to 0 by -1) suffixW(i) = suffixW(i + 1) + sorted(i)._3
    var pa = 0L
    var cut = n // first uncapped index; n = everything capped
    var lambda = 0.0
    var i = 0
    while (i < n && cut == n) {
      val (_, a, w) = sorted(i)
      if (suffixW(i) > 0) {
        val lam = (total - pa).toDouble / suffixW(i)
        val r = if (w > 0) a.toDouble / w else Double.PositiveInfinity
        if (lam < r) { cut = i; lambda = lam }
        else pa += a
      } else pa += a // zero-weight tail: capped at quota 0 below
      i += 1
    }
    val plan = sorted.zipWithIndex.map { case ((l, a, w), idx) =>
      val q =
        if (w <= 0) 0L // unweighted sources contribute nothing
        else if (idx < cut) a // saturated: capped at availability
        else math.min(a, math.floor(lambda * w).toLong)
      (l, a, w, q)
    }
    import avail.sparkSession.implicits._
    plan.toSeq.toDF("label", "available", "weight", "quota")
  }

  /** Data-CONSTRAINED mixture planning: [[mixturePlan]] where a source
    * may be repeated up to `maxEpochs` epochs before it saturates (the
    * Muennighoff et al. 2023 data-constrained scaling regime — repeated
    * tokens retain most of their value for a few epochs, so capacity is
    * maxEpochs·available rather than available). Same closed-form
    * water-filling, bit-identical cross-engine with integer availabilities
    * and integer-valued weights (integer maxEpochs keeps capacities
    * integral).
    *
    * Output: (label, available, weight, quota, epochs, unique_tokens,
    * repeated_tokens) — epochs = quota/available (round 6),
    * unique = min(quota, available), repeated = the mass the trainer
    * will see more than once. */
  def epochPlan(avail: DataFrame, labelCol: String, availCol: String,
      targets: Seq[(String, Double)], total: Long,
      maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val capped = avail.select(col(labelCol),
      (col(availCol).cast("long") * maxEpochs).as(availCol))
    mixturePlan(capped, labelCol, availCol, targets, total)
      .select(col("label"),
        // capacities were scaled by an integer — recover the true
        // availability exactly
        (col("available") / maxEpochs).cast("long").as("available"),
        col("weight"), col("quota"))
      .withColumn("epochs", when(col("available") > 0,
        round(col("quota") / col("available"), 6)).otherwise(lit(0.0)))
      .withColumn("unique_tokens", least(col("quota"), col("available")))
      .withColumn("repeated_tokens",
        greatest(lit(0L), col("quota") - col("available")))
  }

  /** Materialize an epoch-aware training stream from per-source
    * doc-instance quotas (the execution half of [[epochPlan]] — that op
    * decides HOW MUCH of each source to repeat, this one emits the
    * actual repeated rows): a source with quota q over its n docs
    * appears ⌊q/n⌋ full epochs, and the q mod n docs with the smallest
    * unsigned `hash64(id)` appear once more — the same deterministic,
    * subset-stable membership rule as every sampler here, so retries
    * and engines agree row-for-row.
    *
    * Output: input columns + `epoch` (0-based instance index) +
    * `order_key` (hash of id and epoch) — sort or shard by `order_key`
    * for a reproducible interleaved training order in which a doc's
    * repeats land far apart.
    *
    * Scale shape: the label → (base, remainder) table is label-sized
    * and folds into a scan-side when-chain; the extra-epoch membership
    * comes from [[quotaSample]]'s WindowGroupLimit bottom-k (remainder-
    * sized output) joined back by id — the corpus itself never sees a
    * window, and the explode emits exactly quota rows per source. */
  def expandEpochs(df: DataFrame, idCol: String, labelCol: String,
      quotas: Seq[(String, Long)]): DataFrame = {
    require(quotas.map(_._1).distinct.length == quotas.length,
      "duplicate quota labels")
    require(quotas.forall(_._2 >= 0), "quotas must be >= 0")
    val counts = df.groupBy(col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = quotas.filter { case (l, q) =>
      q > 0 && counts.getOrElse(l, 0L) > 0 }
    if (present.isEmpty) return df
      .withColumn("epoch", lit(0L)).withColumn("order_key", lit(0L))
      .limit(0)
    val split = present.map { case (l, q) =>
      val n = counts(l)
      // the explode below emits one row per epoch instance; a quota that
      // implies thousands of epochs of one source is a recipe bug (and
      // would build epoch arrays that large per row) — fail loudly
      require(q / n <= 10000,
        s"expandEpochs: label $l implies ${q / n} epochs per doc " +
          s"(quota $q over $n docs) — cap the quota or split the source")
      (l, q / n, q % n)
    }
    val baseCol = split.foldRight(lit(0L): Column) { case ((l, b, _), acc) =>
      when(col(labelCol) === lit(l), lit(b)).otherwise(acc)
    }
    val remainders = split.collect { case (l, _, r) if r > 0 => (l: Any, r) }
    val extra =
      if (remainders.isEmpty) null
      else quotaSample(df.select(col(labelCol), col(idCol)),
          col(labelCol), col(idCol), remainders)
        .select(col(labelCol).as("__xl"), col(idCol).as("__xi"),
          lit(1L).as("__extra"))
    val flagged =
      if (extra == null) df.withColumn("__extra", lit(0L))
      else df.join(extra,
        df(labelCol) === col("__xl") && df(idCol) === col("__xi"), "left")
        .drop("__xl", "__xi")
        .withColumn("__extra", coalesce(col("__extra"), lit(0L)))
    flagged
      .withColumn("__epochs", baseCol + col("__extra"))
      .where(col("__epochs") > 0) // guards the ANSI descending-sequence trap
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__epochs") - 1)))
      .drop("__extra", "__epochs")
      .withColumn("order_key", gf.hash64(concat(
        col(idCol).cast("string"), lit("#"), col("epoch").cast("string"))))
  }

  /** Deterministic fixed-size sample: the `k` rows with the smallest
    * `hash64(key)` in UNSIGNED order. Runs as TakeOrderedAndProject —
    * per-partition top-k then a k-row driver merge, never a global sort.
    * Stable under appends in the Bernoulli sense: a new row displaces at
    * most one old sample member. */
  def bottomK(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    // signed order of (h XOR Long.MinValue) == unsigned order of h
    df.withColumn("__h", gf.hash64(key).bitwiseXOR(lit(Long.MinValue)))
      .orderBy(col("__h")).limit(k).drop("__h")
  }

  /** Duplicate-closed train/eval split — the near-dup sibling of the
    * group-keyed leak-free split (q127): a plain hash split leaks when a
    * document's NEAR-DUPLICATE lands on the other side (the eval set
    * silently memorized). Here every connected component of the
    * caller-supplied near-dup `pairs` frame (from
    * [[Dedup.minhashPairs]], [[Dedup.winnowPairs]], …) splits as ONE
    * unit, keyed by the hash of its representative (min id); documents
    * in no pair split by their own id — identical to the plain hash
    * split for them, so tightening the pair generator only MOVES dup
    * groups, never reshuffles singletons.
    *
    * Scale shape: [[Dedup.components]] runs on the verified pair graph
    * (minuscule next to the corpus); the (id, component) table joins
    * into a scan-side split decision — auto-broadcast when it fits (the
    * normal case), degrading to an id-keyed shuffle join on a
    * pathological everything-is-a-dup corpus rather than forcing an
    * oversized broadcast onto the driver. One row in `evalOneIn` lands
    * in eval, in expectation. Returns the input plus a `split` column
    * ("train" / "eval"). */
  def splitByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
      evalOneIn: Int = 10): DataFrame = {
    require(evalOneIn >= 2, "evalOneIn must be >= 2")
    val comp = Dedup.components(pairs)
      .select(col("id").as("__cid"), col("component").as("__comp"))
    df.join(comp, col(idCol) === col("__cid"), "left")
      .withColumn("split",
        when(pmod(gf.hash64(coalesce(col("__comp"), col(idCol))),
          lit(evalOneIn)) === 0, lit("eval")).otherwise(lit("train")))
      .drop("__cid", "__comp")
  }

  /** Bandit arm receipts for data-mixture exploration — when sources
    * are arms and "this batch helped" is a Bernoulli reward, the two
    * standard exploration scores per arm: the UCB1 index
    * `mean + √(2·ln N / n_arm)` (Auer et al. 2002; play the argmax)
    * and the Beta posterior `(wins + 1, losses + 1)` a Thompson
    * sampler draws from. One map-side-combined aggregation; the
    * arm-count-sized frame then takes N from a broadcast 1-row cross
    * join. NULL rewards are refused work. Returns
    * (armCols…, pulls, wins, mean_reward, ucb1, post_alpha,
    * post_beta); an arm is never unplayed here by construction (it
    * would not appear), so the ucb1 ∞-for-unplayed convention is the
    * caller's seeding concern. */
  def banditIndices(df: DataFrame, armCols: Seq[String],
      successCol: Column): DataFrame = {
    require(armCols.nonEmpty, "need at least one arm column")
    val ok = successCol.cast("boolean")
    val arms = df.where(ok.isNotNull)
      .groupBy(armCols.map(col): _*)
      .agg(count(lit(1)).as("pulls"),
        sum(ok.cast("long")).as("wins"))
    val total = arms.agg(sum(col("pulls")).as("__N"))
    arms.crossJoin(broadcast(total))
      .select(armCols.map(col) ++ Seq(col("pulls"), col("wins"),
        (col("wins").cast("double") / col("pulls")).as("mean_reward"),
        (col("wins").cast("double") / col("pulls") +
          sqrt(lit(2.0) * log(col("__N").cast("double"))
            / col("pulls").cast("double"))).as("ucb1"),
        (col("wins") + 1).as("post_alpha"),
        (col("pulls") - col("wins") + 1).as("post_beta")): _*)
  }

  /** Raking / iterative proportional fitting (Deming & Stephan 1940) —
    * re-weight a corpus so BOTH of two categorical margins match
    * declared targets simultaneously ("language mix 60/30/10 AND
    * source mix 40/40/20"): per-dimension quota sampling can hit one
    * margin only; raking alternately scales rows and columns of the
    * (dim1 × dim2) weight table until both margins converge — the
    * classical fix when the joint target table is unknown but the
    * margins are policy. Returns one row per OBSERVED (dim1, dim2)
    * cell: `(d1, d2, n, weight, w_share)` where `weight` is the
    * per-ROW multiplier (n·weight summed over a margin ≈ target share
    * × N) and `w_share` the cell's weighted share. Cells absent from
    * the corpus get no weight (IPF preserves structural zeros —
    * documented, not hidden); targets for UNOBSERVED margin labels
    * fail fast (their mass is unreachable). NULL dims are refused
    * work.
    *
    * Shape: ONE (dim1, dim2) count shuffle to a category-product-
    * bounded cell table (collected under `maxCells`); the IPF loop is
    * driver-side arithmetic on that small matrix (margins are policy
    * vectors, not data); weights join back broadcast if the caller
    * applies them. Convergence is checked, not assumed: fails fast if
    * the worst margin error after `iters` rounds exceeds `tol`. */
  def rake(df: DataFrame, dim1: Column, dim2: Column,
      targets1: Seq[(String, Double)], targets2: Seq[(String, Double)],
      iters: Int = 50, tol: Double = 1e-9,
      maxCells: Int = 100000): DataFrame = {
    require(targets1.nonEmpty && targets2.nonEmpty, "need both margins")
    require(targets1.forall(_._2 > 0) && targets2.forall(_._2 > 0),
      "target shares must be > 0")
    require(targets1.map(_._1).distinct.size == targets1.size &&
      targets2.map(_._1).distinct.size == targets2.size,
      "duplicate target labels")
    val cellsDf = df.where(dim1.isNotNull && dim2.isNotNull)
      .groupBy(dim1.cast("string").as("d1"),
        dim2.cast("string").as("d2"))
      .agg(count(lit(1)).as("n"))
    val cells = cellsDf.limit(maxCells + 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"more than $maxCells (dim1, dim2) cells")
    val spark = df.sparkSession
    import spark.implicits._
    if (cells.isEmpty)
      return Seq.empty[(String, String, Long, Double, Double)]
        .toDF("d1", "d2", "n", "weight", "w_share")
    val t1 = targets1.map { case (k, v) =>
      k -> v / targets1.map(_._2).sum }.toMap
    val t2 = targets2.map { case (k, v) =>
      k -> v / targets2.map(_._2).sum }.toMap
    val seen1 = cells.map(_._1).toSet
    val seen2 = cells.map(_._2).toSet
    val miss1 = t1.keySet -- seen1
    val miss2 = t2.keySet -- seen2
    require(miss1.isEmpty && miss2.isEmpty,
      s"target labels unobserved in the corpus: " +
        s"${(miss1 ++ miss2).mkString(", ")}")
    require(seen1.subsetOf(t1.keySet) && seen2.subsetOf(t2.keySet),
      s"observed labels outside the targets: " +
        s"${((seen1 -- t1.keySet) ++ (seen2 -- t2.keySet)).mkString(", ")}")
    val nTot = cells.map(_._3).sum.toDouble
    // IPF on weighted cell masses m = n * w, alternating margin scales
    var m = cells.map(_._3.toDouble)
    var err = Double.MaxValue
    var it = 0
    while (it < iters && err > tol) {
      for ((tgt, key) <- Seq((t1, (i: Int) => cells(i)._1),
        (t2, (i: Int) => cells(i)._2))) {
        val marg = m.indices.groupBy(key)
          .map { case (k, is) => k -> is.map(m).sum }
        m = m.indices.map(i =>
          m(i) * tgt(key(i)) * nTot / marg(key(i))).toArray
      }
      err = Seq((t1, (i: Int) => cells(i)._1),
        (t2, (i: Int) => cells(i)._2)).map { case (tgt, key) =>
        m.indices.groupBy(key).map { case (k, is) =>
          math.abs(is.map(m).sum / nTot - tgt(k)) }.max
      }.max
      it += 1
    }
    require(err <= tol,
      f"raking did not converge: worst margin error $err%.2e after " +
        s"$iters rounds (structural zeros can make margins infeasible)")
    cells.indices.map { i =>
      val (d1, d2, n) = cells(i)
      (d1, d2, n, m(i) / n, m(i) / nTot)
    }.toDF("d1", "d2", "n", "weight", "w_share")
  }

  /** Neyman-optimal stratified sample allocation — the PLANNED
    * counterpart of [[stratifiedBottomK]]: given a total row budget,
    * split it across strata ∝ N_h·σ_h (Neyman 1934), which minimizes
    * the variance of the stratified mean for a fixed budget. Equal or
    * proportional allocation wastes budget on big LOW-variance strata
    * (boilerplate-heavy sources) and starves small high-variance
    * ones — this op is why the quality-eval sample should oversample
    * the weird sources. Integer quotas come from largest-remainder
    * rounding (quotas sum EXACTLY to `budget` unless capped), each
    * quota is capped at its stratum size N_h (capped surplus is NOT
    * redistributed — re-run on the uncapped strata if needed; silent
    * redistribution would hide the cap), and zero-variance strata get
    * weight 0 (one row of a constant stratum determines its mean —
    * they still receive quota only via remainder ties; a fully
    * zero-weight panel — every stratum constant — degenerates to ≤ 1
    * row per stratum rather than inventing weights). Ties in the
    * remainder rank break by stratum label ascending (deterministic,
    * SQL-reproducible). Returns one row per stratum:
    * `(groupCols…, n_rows, sd, weight, quota)`. Feed the quotas to
    * [[quotaSample]] to take the actual sample.
    *
    * Shape: ONE moment fold per stratum (count/Σx/Σx² through
    * [[graft.api.functions.exact_sum]]); everything after runs on the
    * strata-bounded frame (window over k strata rows). */
  def neymanAllocation(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(budget >= 0, "budget must be >= 0")
    val v = valueCol.cast("double")
    val byG = df.where(v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        gf.exact_sum(v).as("__s"), gf.exact_sum(v * v).as("__q"))
    val n = col("n_rows").cast("double")
    val sd = when(col("n_rows") >= 2, sqrt(
      greatest((col("__q") - col("__s") * col("__s") / n) / (n - 1),
        lit(0.0))))
      .otherwise(lit(0.0))
    val withW = byG.withColumn("sd", sd)
      .withColumn("weight", n * col("sd"))
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(lit(1)) // strata-bounded frame
    val tot = sum(col("weight")).over(wAll)
    val raw = when(tot > 0, col("weight") * lit(budget.toDouble) / tot)
      .otherwise(lit(0.0))
    val base = floor(raw).cast("long")
    val rem = raw - base
    val short = (lit(budget) - sum(base).over(wAll)).cast("long")
    val wRank = Window.partitionBy(lit(1))
      .orderBy(rem.desc +: groupCols.map(c => col(c).asc): _*)
    withW
      .withColumn("__extra",
        (row_number().over(wRank) <= short).cast("long"))
      .select(groupCols.map(col) ++ Seq(col("n_rows"), col("sd"),
        col("weight"),
        least(base + col("__extra"), col("n_rows")).as("quota")): _*)
  }
}
