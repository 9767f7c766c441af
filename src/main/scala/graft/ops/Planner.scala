package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Sketch-based pre-flight query planning: estimate the output size of
  * an equi-join, or the self-join size (F2) that quantifies key skew,
  * from two Count-Min sketches — BEFORE running the join.
  *
  * Why this matters at 100 TB: the expensive planning mistakes are
  * (a) shuffle-joining something that should have been broadcast,
  * (b) broadcast-joining something too big, and (c) walking into a
  * skew-exploding many-to-many join. All three decisions hinge on
  * quantities a CMS pair answers in two cheap scans:
  * |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated by the sketch inner product
  * (Cormode & Muthukrishnan 2005 §4.2, AMS lineage), and F2 = Σ f²
  * (a = b) is the canonical skew diagnostic — F2 ≫ N means a handful of
  * keys dominate and the join wants salting/AQE skew handling.
  *
  * The whole computation is declarative: each side aggregates to ONE
  * sketch row (map-side combined, ~depth·width·8 bytes of state), the
  * two 1-row frames cross-join, and [[gf.cms_dot]] evaluates inside the
  * plan — no driver collect, no full-table shuffle, and the estimate's
  * cost is independent of either table's row count.
  *
  * Estimates are one-sided: cms_dot ≥ the true size, within
  * ε·N_A·N_B/width w.h.p. — the safe direction for capacity planning
  * (a join the ESTIMATE says is small, is small).
  */
object Planner {

  /** One-row estimate of |dfA ⋈ dfB| on keyA = keyB:
    * (est_join_rows, total_a, total_b). */
  def joinSizeEstimate(dfA: DataFrame, keyA: Column,
      dfB: DataFrame, keyB: Column,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    val a = dfA.agg(gf.cms_agg(keyA, depth, width).as("__ca"))
    val b = dfB.agg(gf.cms_agg(keyB, depth, width).as("__cb"))
    a.crossJoin(b).select(
      gf.cms_dot(col("__ca"), col("__cb")).as("est_join_rows"),
      gf.cms_total(col("__ca")).as("total_a"),
      gf.cms_total(col("__cb")).as("total_b"))
  }

  /** ONE-SCAN shuffle pre-flight report for a prospective join/groupBy
    * key: every quantity a partitioning decision needs, from one pass
    * that carries four aggregation buffers (count, HyperLogLog,
    * Count-Min, Space-Saving) — no shuffle of the data itself.
    *
    * Returns one row:
    *  - `n_rows`, `est_distinct` (HLL; exact-ish at low cardinality via
    *    the linear-counting branch),
    *  - `top_key`, `top_count` (Space-Saving head; EXACT whenever
    *    capacity ≥ distinct keys, an overestimate ≤ εN otherwise; ties
    *    break count-desc then key-asc),
    *  - `est_f2` (CMS self-dot — the skew second moment),
    *  - `suggested_tasks` = ⌈n_rows / targetRowsPerTask⌉,
    *  - `salt_hot` = 1 when the heaviest key alone exceeds 2× the mean
    *    task's rows (top_count · tasks > 2 · n_rows) — the "this key
    *    overflows any task you give it" signal that calls for salting
    *    or AQE skew handling BEFORE the job runs.
    *
    * Key must be integral (the Space-Saving long arm). */
  def shufflePlan(df: DataFrame, key: Column,
      targetRowsPerTask: Long = 10000000L,
      depth: Int = 4, width: Int = 4096, hllP: Int = 12,
      ssCapacity: Int = 4096): DataFrame = {
    require(targetRowsPerTask >= 1, "targetRowsPerTask must be >= 1")
    val aggd = df.agg(
      count(lit(1)).as("n_rows"),
      gf.hll_agg(key, hllP).as("__h"),
      gf.cms_agg(key, depth, width).as("__c"),
      gf.ss_topk_agg(key, lit(1L), ssCapacity).as("__s"))
    val top = array_max(transform(gf.ss_topk_long(col("__s"), ssCapacity),
      x => struct(x.getField("count").as("c"),
        (-x.getField("item")).as("ni"))))
    val tasks = ceil(col("n_rows").cast("double") /
      lit(targetRowsPerTask.toDouble)).cast("long")
    aggd.select(
        col("n_rows"),
        round(gf.hll_distinct(col("__h")), 4).as("est_distinct"),
        top.as("__top"),
        gf.cms_dot(col("__c"), col("__c")).as("est_f2"),
        greatest(tasks, lit(1L)).as("suggested_tasks"))
      .select(col("n_rows"), col("est_distinct"),
        (-col("__top.ni")).as("top_key"),
        col("__top.c").as("top_count"),
        col("est_f2"), col("suggested_tasks"),
        (col("__top.c") * col("suggested_tasks") >
          lit(2L) * col("n_rows")).cast("int").as("salt_hot"))
  }

  /** One-row estimate of the self-join size F2 = Σ_k f(k)² plus the
    * derived skew ratio F2/N (mean join fan-out per row; 1.0 = unique
    * key, ≫ 1 = heavy skew): (est_f2, total, skew_ratio). */
  /** Data-sufficiency plan against the Chinchilla rule (Hoffmann et
    * al. 2022: compute-optimal training wants ≈ `tokensPerParam` (20)
    * tokens per parameter): for each candidate model size, how many
    * tokens the optimal run needs, how many epochs of THIS corpus that
    * is, whether it fits under `maxEpochs` (the data-constrained
    * ceiling of Muennighoff et al. 2023), and the largest
    * compute-optimal model the corpus can feed. The corpus reduces to
    * ONE total in one aggregation; the per-model frame is a literal
    * explode. All-LONG token arithmetic; epochs round at 6. Returns
    * one row per model size: (model_params, d_opt, corpus_tokens,
    * epochs_needed, feasible, max_feasible_params). */
  def chinchillaPlan(df: DataFrame, tokenCol: Column,
      modelSizes: Seq[Long], tokensPerParam: Long = 20L,
      maxEpochs: Int = 4): DataFrame = {
    require(modelSizes.nonEmpty && modelSizes.forall(_ >= 1),
      "model sizes must be positive")
    require(tokensPerParam >= 1 && maxEpochs >= 1,
      "tokensPerParam and maxEpochs must be >= 1")
    val tot = df.agg(coalesce(sum(tokenCol.cast("long")), lit(0L))
      .as("corpus_tokens"))
    tot.select(col("corpus_tokens"),
        explode(typedLit(modelSizes.sorted)).as("model_params"))
      .withColumn("d_opt", col("model_params") * tokensPerParam)
      .withColumn("epochs_needed",
        when(col("corpus_tokens") > 0,
          col("d_opt").cast("double") /
            col("corpus_tokens").cast("double")))
      .withColumn("feasible",
        col("d_opt") <= col("corpus_tokens") * maxEpochs)
      .withColumn("max_feasible_params",
        call_function("div", col("corpus_tokens") * maxEpochs,
          lit(tokensPerParam)))
      .select(col("model_params"), col("d_opt"), col("corpus_tokens"),
        col("epochs_needed"), col("feasible"),
        col("max_feasible_params"))
  }

  /** Data-constrained scaling plan (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"): when the training-token budget
    * D exceeds the unique corpus U, repeated epochs decay in value —
    * the paper's fit puts the effective data at
    *
    *   D'(U, R) = U + U·R*·(1 − e^(−R/R*)),   R = D/U − 1 repeats,
    *
    * with R* ≈ 15.39 (repeats beyond ~15 epochs contribute ≈ nothing).
    * [[chinchillaPlan]] answers "is the corpus big enough at 1 epoch";
    * this answers the follow-up a data-constrained run actually faces:
    * how much of a BUDGET is still buying signal at each repeat level,
    * i.e. when to stop repeating and go get more data. One corpus
    * total + closed-form arithmetic on the literal budget grid.
    * Returns per budget: (budget_tokens, corpus_tokens, unique_used,
    * repeats, effective_tokens, utilization = D'/D). */
  def dataConstrainedPlan(df: DataFrame, tokenCol: Column,
      budgets: Seq[Long], rStar: Double = 15.39): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 1),
      "budgets must be positive")
    require(rStar > 0, "rStar must be > 0")
    val tot = df.agg(coalesce(sum(tokenCol.cast("long")), lit(0L))
      .as("corpus_tokens"))
    tot.select(col("corpus_tokens"),
        explode(typedLit(budgets.sorted)).as("budget_tokens"))
      .withColumn("unique_used",
        least(col("corpus_tokens"), col("budget_tokens")))
      .withColumn("repeats",
        when(col("unique_used") > 0,
          col("budget_tokens").cast("double") /
            col("unique_used").cast("double") - 1.0))
      .withColumn("effective_tokens",
        when(col("unique_used") > 0,
          col("unique_used").cast("double") * (lit(1.0) + lit(rStar) *
            (lit(1.0) - exp(-col("repeats") / lit(rStar))))))
      .withColumn("utilization",
        col("effective_tokens") / col("budget_tokens").cast("double"))
      .select(col("budget_tokens"), col("corpus_tokens"),
        col("unique_used"), col("repeats"), col("effective_tokens"),
        col("utilization"))
  }

  def selfJoinSizeEstimate(df: DataFrame, key: Column,
      depth: Int = 4, width: Int = 4096): DataFrame =
    df.agg(gf.cms_agg(key, depth, width).as("__c"))
      .select(
        gf.cms_dot(col("__c"), col("__c")).as("est_f2"),
        gf.cms_total(col("__c")).as("total"),
        (gf.cms_dot(col("__c"), col("__c")).cast("double") /
          gf.cms_total(col("__c"))).as("skew_ratio"))
}
