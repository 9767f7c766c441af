package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier evaluation over corpus-scale scored data — the measurement
  * side of quality filtering: a pipeline that trains a quality classifier
  * (Naive Bayes [[Classify]], logistic regression) must grade it on
  * billions of held-out rows before trusting it to gate a 100 TB corpus.
  *
  * Everything here is EXACT integer/rational arithmetic over distributed
  * aggregates — no sampling, no sketch, no global sort:
  *
  *  - [[auc]] computes the exact ROC AUC via the Mann–Whitney rank-sum
  *    identity. The classic formulation ranks every row with one global
  *    `row_number()` window — a single-task funnel at scale. This one
  *    groups rows by DISTINCT SCORE (cardinality ≪ rows), prefix-sums the
  *    negative counts in score order with the two-level bucketed scan of
  *    [[Packing.withPrefixSum]] (three cheap parallel passes, no global
  *    sort), and folds the tie-aware pair count map-side. Ties contribute
  *    half a concordant pair (trapezoidal ROC), matching the standard
  *    Mann–Whitney treatment.
  *  - [[prAtThresholds]] evaluates precision/recall/F1 at a list of
  *    operating points in ONE scan: each row is exploded onto the
  *    (small, literal) threshold list and folded with conditional counts.
  *
  * Pair counts are held in DECIMAL(38,0): n_pos·n_neg overflows Int64
  * beyond ~3·10^9 rows per class, well inside the design scale.
  */
object Eval {

  /** Exact ROC AUC. Returns ONE row:
    * (n_pos, n_neg, num2, auc) where num2 = Σ over positive rows of
    * (2·negatives-scored-below + negatives-tied) — an exact integer, with
    * auc = num2 / (2·n_pos·n_neg) — and auc is NULL when either class is
    * empty (AUC is undefined, not 0). Rows with a NULL score or label are
    * excluded. `labelCol` is a boolean column (true = positive).
    *
    * Deterministic and partitioning-invariant: every step is an integer
    * aggregate; the prefix sum is exact for any bucketing.
    */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int = 0): DataFrame = {
    val rows = df.select(scoreCol.cast("double").as("__s"),
        when(labelCol, 1L).when(!labelCol, 0L).as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    // per-distinct-score class counts: the only shuffle keyed by data
    val byScore = rows.groupBy(col("__s"))
      .agg(sum(col("__y")).as("__p"),
        (count(lit(1)) - sum(col("__y"))).as("__neg"))
    // scores are unique after the groupBy — withPrefixSum's contract holds;
    // counts are exact in its double accumulator through 2^53 rows
    val cum = Packing.withPrefixSum(byScore, "__s", "__neg", "__cn", buckets)
    val dec = "decimal(38,0)"
    cum.agg(
      coalesce(sum(col("__p")), lit(0L)).as("n_pos"),
      coalesce(sum(col("__neg")), lit(0L)).as("n_neg"),
      coalesce(sum((lit(2) * col("__cn").cast("long") - col("__neg"))
        .cast(dec) * col("__p").cast(dec)), lit(0).cast(dec)).as("num2"))
    .select(col("n_pos"), col("n_neg"), col("num2"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        col("num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** AUC with a DeLong confidence interval (DeLong et al. 1988, via
    * the placement-value formulation Sun & Xu 2014 made O(n log n) —
    * here O(distinct scores) after one count shuffle): every positive
    * carries its placement V10 = F̂_neg(x) (mid-rank at ties), every
    * negative V01 = 1 − F̂_pos(x); mean placement IS the AUC and
    *
    *   se² = S²(V10)/n_pos + S²(V01)/n_neg
    *
    * with S² the sample variances — the standard error an eval report
    * should print NEXT TO every AUC (an AUC of 0.71 over 200 examples
    * is not a result). 95% bounds clip to [0, 1].
    *
    * Scale shape: [[auc]]'s — ONE shuffle into per-distinct-score
    * class counts, then cumulatives over the cell frame through the
    * distributed two-level prefix sum ([[Packing.withPrefixSumsLong]];
    * fully parallel even when continuous scores make the frame
    * corpus-sized), exact_sum placement moments, so the one-row report
    * is bit-deterministic under any partitioning. Returns (n_pos, n_neg,
    * auc, se, lo95, hi95) — se/bounds NULL when either class has < 2
    * members. */
  def aucDeLong(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    import graft.api.{functions => gfn}
    val rows = df.select(scoreCol.cast("double").as("__s"),
        when(labelCol, 1L).when(!labelCol, 0L).as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val byScore = rows.groupBy(col("__s"))
      .agg(sum(col("__y")).as("__p"),
        (count(lit(1)) - sum(col("__y"))).as("__n"))
    // cumulative class counts over the distinct-score cell frame via
    // the distributed two-level prefix sum — for continuous scores
    // that frame is corpus-sized, and this keeps it fully parallel
    // (no single-task global window); totals ride the same collect
    val cells = Packing.withPrefixSumsLong(byScore, Seq("__s"),
      sums = Seq("__n" -> "__cn", "__p" -> "__cp"),
      totals = Seq("__n" -> "__nn", "__p" -> "__np"))
    // empty-class guard: ANSI division throws on 2·n = 0; the value is
    // unused then (the final when() masks it), so 0.0 is safe
    val v10 = when(col("__nn") > 0,
      (lit(2.0) * col("__cn") - col("__n")) /
        (lit(2.0) * col("__nn"))).otherwise(lit(0.0))
    val v01 = when(col("__np") > 0,
      (lit(2.0) * (col("__np") - col("__cp")) + col("__p")) /
        (lit(2.0) * col("__np"))).otherwise(lit(0.0))
    val agg = cells.agg(
      max(col("__np")).as("n_pos"), max(col("__nn")).as("n_neg"),
      gfn.exact_sum(col("__p") * v10).as("__s10"),
      gfn.exact_sum(col("__p") * v10 * v10).as("__q10"),
      gfn.exact_sum(col("__n") * v01).as("__s01"),
      gfn.exact_sum(col("__n") * v01 * v01).as("__q01"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    val aucC = when(col("n_pos") > 0 && col("n_neg") > 0,
      col("__s10") / np)
    val var10 = (col("__q10") - col("__s10") * col("__s10") / np) /
      (np - 1)
    val var01 = (col("__q01") - col("__s01") * col("__s01") / nn) /
      (nn - 1)
    val se = when(col("n_pos") >= 2 && col("n_neg") >= 2,
      sqrt(var10 / np + var01 / nn))
    val zq = 1.959963984540054 // Φ⁻¹(0.975), the same literal both sides
    agg.select(col("n_pos"), col("n_neg"), aucC.as("auc"),
      se.as("se"),
      // guard on se: greatest/least skip NULL args, so an unguarded
      // bound would fabricate a full-width [0,1] CI when se is NULL
      when(se.isNotNull, greatest(lit(0.0), aucC - lit(zq) * se))
        .as("lo95"),
      when(se.isNotNull, least(lit(1.0), aucC + lit(zq) * se))
        .as("hi95"))
  }

  /** Per-group exact AUC — slice-wise evaluation (per source, language,
    * shard): a classifier that grades well in aggregate can still be
    * broken on one slice, and the slice report is what catches it.
    *
    * Same rank-sum identity as [[auc]], but the prefix sum runs as a
    * window PARTITIONED BY GROUP over the per-(group, distinct-score)
    * counts — that frame is distinct-scores-sized, not corpus-sized, so
    * the window is cheap and the corpus itself still only shuffles once
    * into the grouped count. Returns one row per group:
    * (groupCols…, n_pos, n_neg, num2, auc); auc NULL for single-class
    * groups. */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
      labelCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val g = groupCols.map(col)
    val rows = df.select(g ++ Seq(scoreCol.cast("double").as("__s"),
        when(labelCol, 1L).when(!labelCol, 0L).as("__y")): _*)
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val byScore = rows.groupBy(g :+ col("__s"): _*)
      .agg(sum(col("__y")).as("__p"),
        (count(lit(1)) - sum(col("__y"))).as("__neg"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
      .orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val dec = "decimal(38,0)"
    byScore.withColumn("__cn", sum(col("__neg")).over(w))
      .groupBy(g: _*)
      .agg(sum(col("__p")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        sum((lit(2) * col("__cn") - col("__neg")).cast(dec) *
          col("__p").cast(dec)).as("num2"))
      .select(g ++ Seq(col("n_pos"), col("n_neg"), col("num2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc")): _*)
  }

  /** Calibration (reliability) bins: scores in [0, 1] bucketed into
    * `bins` equal intervals (the top edge closes into the last bin), each
    * reporting count, positives, mean score, and empirical positive rate
    * — a well-calibrated quality classifier has mean_score ≈ pos_rate per
    * bin. One grouped aggregation; exact integer counts. */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val rows = df.select(scoreCol.cast("double").as("__s"),
        when(labelCol, 1L).when(!labelCol, 0L).as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull &&
        col("__s") >= 0.0 && col("__s") <= 1.0)
    rows.select(least(lit(bins - 1), floor(col("__s") * bins).cast("int"))
        .as("bin"), col("__s"), col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        (sum(col("__s")) / count(lit(1))).as("mean_score"),
        (sum(col("__y")).cast("double") / count(lit(1))).as("pos_rate"))
  }

  /** Calibration summary scalars over [[calibrationBins]]' bins plus the
    * bin-free Brier score — the one-row verdict next to the reliability
    * table: ECE (bin-weight-averaged |pos_rate − mean_score|), MCE (the
    * worst bin), and Brier = mean squared (score − label). Same one
    * grouped aggregation as the bins (bins-sized frame) plus one scalar
    * fold; scores outside [0, 1] and NULLs are excluded, matching the
    * bins' contract. Returns (n, n_bins, ece, mce, brier); ECE/MCE NULL
    * on an empty input. */
  def calibrationSummary(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    val b = calibrationBins(df, scoreCol, labelCol, bins)
    val gap = abs(col("pos_rate") - col("mean_score"))
    b.agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        count(lit(1)).as("n_bins"),
        (sum(gap * col("n")) / sum(col("n"))).as("ece"),
        max(gap).as("mce"))
      .crossJoin(df.select(scoreCol.cast("double").as("__s"),
          when(labelCol, 1.0).when(!labelCol, 0.0).as("__y"))
        .where(col("__s").isNotNull && col("__y").isNotNull &&
          col("__s") >= 0.0 && col("__s") <= 1.0)
        .agg(avg((col("__s") - col("__y")) * (col("__s") - col("__y")))
          .as("brier")))
  }

  /** Precision/recall/F1 at each threshold (score ≥ τ ⇒ predicted
    * positive), one output row per τ, computed in a single scan: rows
    * explode onto the literal threshold list (small — operating points,
    * not data) and fold into conditional counts, so the only shuffle is
    * the |thresholds|-key aggregation. Returns
    * (threshold, tp, fp, fn, tn, precision, recall, f1); ratios are NULL
    * when their denominator is 0. NULL scores/labels are excluded.
    */
  def prAtThresholds(df: DataFrame, scoreCol: Column, labelCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    require(thresholds.distinct.size == thresholds.size,
      "thresholds must be distinct")
    val rows = df.select(scoreCol.cast("double").as("__s"),
        when(labelCol, 1L).when(!labelCol, 0L).as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val tauList = array(thresholds.map(lit).toIndexedSeq: _*)
    val pred = rows.select(col("__s"), col("__y"),
        explode(tauList).as("threshold"))
      .withColumn("__hit", (col("__s") >= col("threshold")).cast("long"))
    val cnt = pred.groupBy(col("threshold")).agg(
      coalesce(sum(col("__y") * col("__hit")), lit(0L)).as("tp"),
      coalesce(sum((lit(1L) - col("__y")) * col("__hit")), lit(0L)).as("fp"),
      coalesce(sum(col("__y") * (lit(1L) - col("__hit"))), lit(0L)).as("fn"),
      coalesce(sum((lit(1L) - col("__y")) * (lit(1L) - col("__hit"))),
        lit(0L)).as("tn"))
    val precision = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp")))
    val recall = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn")))
    cnt.select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        precision.as("precision"), recall.as("recall"))
      .withColumn("f1", when(
        col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall"))))
  }

  /** Multi-class classifier report in ONE corpus shuffle: the confusion
    * matrix is a (label, pred)-keyed count aggregation (classes² rows —
    * vocabulary-sized, corpus-size independent), and every metric folds
    * from it with exact integer/rational arithmetic:
    *
    *  - accuracy;
    *  - Cohen's κ — chance-corrected agreement, the standard guard
    *    against "95% accurate" claims on a 95%-majority-class corpus;
    *  - multi-class MCC (Gorodkin's R_K):
    *    (c·s − Σ_k t_k·p_k) / √((s² − Σp_k²)(s² − Σt_k²));
    *  - macro precision/recall/F1, averaged over the TRUE classes
    *    (classes present in `labelCol`), with a class's precision/F1
    *    taken as 0 when it is never predicted — the convention that
    *    penalizes dropping a class instead of silently skipping it.
    *
    * Products of marginals are held in DECIMAL(38,0) (t_k·p_k overflows
    * Int64 past ~3·10^9 rows per class). NULL labels/preds are excluded;
    * κ and MCC are NULL when their denominator is 0 (single class /
    * constant predictions). Returns one row: (n, n_classes, accuracy,
    * kappa, mcc, macro_precision, macro_recall, macro_f1). */
  def classifierReport(df: DataFrame, labelCol: Column,
      predCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val conf = df.select(labelCol.as("__l"), predCol.as("__p"))
      .where(col("__l").isNotNull && col("__p").isNotNull)
      .groupBy("__l", "__p").agg(count(lit(1)).as("__c"))
    // per-true-class marginals + diagonal
    val byTrue = conf.groupBy("__l").agg(sum(col("__c")).as("__t"),
      coalesce(sum(when(col("__l") === col("__p"), col("__c"))), lit(0L))
        .as("__tp"))
    // per-predicted-class marginals
    val byPred = conf.groupBy("__p").agg(sum(col("__c")).as("__pk"))
    val cls = byTrue.join(byPred, col("__l") === col("__p"), "left")
      .select(col("__l"), col("__t"), col("__tp"),
        coalesce(col("__pk"), lit(0L)).as("__pk"))
    val prec = when(col("__pk") > 0,
      col("__tp").cast("double") / col("__pk")).otherwise(lit(0.0))
    val rec = col("__tp").cast("double") / col("__t")
    val f1 = when(prec + rec > 0,
      lit(2.0) * prec * rec / (prec + rec)).otherwise(lit(0.0))
    // macro averages fan in through exact_sum so the one-row report is
    // bit-deterministic under any partitioning of the class frame
    val fromTrue = cls.agg(
      sum(col("__t")).as("n"), count(lit(1)).as("n_classes"),
      sum(col("__tp")).as("__correct"),
      sum(col("__t").cast(dec) * col("__pk").cast(dec)).as("__stp"),
      sum(col("__t").cast(dec) * col("__t").cast(dec)).as("__st2"),
      (graft.api.functions.exact_sum(prec) / count(lit(1)))
        .as("macro_precision"),
      (graft.api.functions.exact_sum(rec) / count(lit(1)))
        .as("macro_recall"),
      (graft.api.functions.exact_sum(f1) / count(lit(1))).as("macro_f1"))
    // Σp² over ALL predicted classes (incl. those never true)
    val fromPred = byPred.agg(
      coalesce(sum(col("__pk").cast(dec) * col("__pk").cast(dec)),
        lit(0).cast(dec)).as("__sp2"))
    val j = fromTrue.crossJoin(fromPred)
    val nD = col("n").cast(dec)
    val mccNum = (col("__correct").cast(dec) * nD - col("__stp"))
      .cast("double")
    // sqrt of the PRODUCT (not sqrt·sqrt): keeps perfect agreement at
    // exactly 1.0 and loses no range (operands ≤ n² ≤ 1e20 each)
    val mccDen = sqrt((nD * nD - col("__sp2")).cast("double") *
      (nD * nD - col("__st2")).cast("double"))
    val po = col("__correct").cast("double") / col("n")
    val pe = col("__stp").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    j.select(col("n"), col("n_classes"),
      po.as("accuracy"),
      when(pe < 1.0, (po - pe) / (lit(1.0) - pe)).as("kappa"),
      when(mccDen > 0.0, mccNum / mccDen).as("mcc"),
      col("macro_precision"), col("macro_recall"), col("macro_f1"))
  }

  /** Fleiss' kappa — chance-corrected agreement among MANY raters
    * (Fleiss 1971), the multi-rater sibling of [[classifierReport]]'s
    * Cohen's κ: the receipt a labeling campaign reads before trusting a
    * crowd-sourced quality/toxicity label column. Input is one row per
    * RATING (item, category assigned by one anonymous rater).
    *
    * Per item i with n_i ratings and n_ij votes for category j:
    * P_i = (Σ_j n_ij(n_ij−1)) / (n_i(n_i−1)); P̄ = mean over items;
    * P̄_e = Σ_j p_j² with p_j the pooled category share;
    * κ = (P̄ − P̄_e)/(1 − P̄_e). The classical statistic assumes a
    * constant rater count; this generalizes to variable n_i the standard
    * way (per-item pairwise agreement, pooled marginals) and reports
    * min/max raters so a caller can SEE whether the classical assumption
    * held. Items with fewer than 2 ratings carry no agreement information
    * and are EXCLUDED entirely (they'd divide by zero in P_i).
    *
    * Scale shape: ONE corpus shuffle into (item, category) counts
    * (map-side combined); everything after operates on that counts frame
    * (≤ items × categories rows) and the category-sized marginal table.
    * Vote-pair products are held in DECIMAL(38,0); the P_i average fans
    * in through exact_sum, so the one-row report is bit-deterministic
    * under any partitioning. Returns one row:
    * (n_items, n_ratings, n_categories, min_raters, max_raters,
    *  p_bar, pe_bar, kappa) — kappa NULL when P̄_e = 1 (all mass in one
    * category) or no item has ≥ 2 ratings. */
  def fleissKappa(df: DataFrame, itemCol: Column,
      categoryCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // the counts frame is read twice (item fold + marginal fold) —
    // checkpoint so the corpus shuffles into it exactly once
    val votes = df.select(itemCol.as("__i"), categoryCol.as("__c"))
      .where(col("__i").isNotNull && col("__c").isNotNull)
      .groupBy("__i", "__c").agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    // per-item totals + pairwise-agreement numerator, items with ≥ 2 votes
    val byItem = votes.groupBy("__i")
      .agg(sum(col("__n")).as("__ni"),
        sum(col("__n").cast(dec) * (col("__n") - 1).cast(dec)).as("__agree"))
      .where(col("__ni") >= 2)
    val pi = col("__agree").cast("double") /
      (col("__ni").cast("double") * (col("__ni") - 1).cast("double"))
    val items = byItem.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("__ni")), lit(0L)).as("n_ratings"),
      min(col("__ni")).as("min_raters"),
      max(col("__ni")).as("max_raters"),
      (graft.api.functions.exact_sum(pi) / count(lit(1))).as("p_bar"))
    // pooled category marginals over the SAME included items
    val byCat = votes.join(byItem.select(col("__i")), Seq("__i"))
      .groupBy("__c").agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("__nc").cast(dec) * col("__nc").cast(dec)),
          lit(0).cast(dec)).as("__sc2"))
    val j = items.crossJoin(byCat) // 1×1 scalar join
    val peBar = col("__sc2").cast("double") /
      (col("n_ratings").cast("double") * col("n_ratings").cast("double"))
    j.select(col("n_items"), col("n_ratings"), col("n_categories"),
      col("min_raters"), col("max_raters"),
      when(col("n_items") > 0, col("p_bar")).as("p_bar"),
      when(col("n_items") > 0, peBar).as("pe_bar"),
      when(col("n_items") > 0 && peBar < 1.0,
        (col("p_bar") - peBar) / (lit(1.0) - peBar)).as("kappa"))
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 2011) — the
    * inter-annotator agreement coefficient built for MISSING ratings:
    * unlike Fleiss' kappa ([[fleissKappa]]), whose chance model assumes
    * a rectangular rater×item design, alpha's expected disagreement is
    * estimated from the observed coincidence matrix, so sparse and
    * variable rater coverage — the reality of LLM preference/rubric
    * labeling, where each sample gets 2–5 raters out of a large pool —
    * is handled without imputation.
    *
    * Coincidence algebra, specialized to the nominal distance (the c×k
    * matrix never materializes): with n_ic the (item, category) vote
    * count and n_i = Σ_c n_ic over items with n_i ≥ 2 (singletons
    * carry no pairable information and are excluded, the standard
    * treatment),
    *
    *   agreement mass   A  = Σ_i Σ_c n_ic·(n_ic − 1)/(n_i − 1)
    *   pairable mass    n  = Σ_i n_i
    *   D_o = (n − A)/n
    *   marginals collapse to raw counts: n_c = Σ_i n_ic, because
    *     Σ_k o_ck = Σ_i n_ic·(n_i − 1)/(n_i − 1) = Σ_i n_ic
    *   D_e = (n² − Σ_c n_c²) / (n·(n − 1))
    *   α   = 1 − D_o/D_e
    *
    * Scale shape ([[fleissKappa]]'s): ONE corpus shuffle into
    * (item, category) counts (map-side combined, checkpointed — read
    * by the agreement fold and the marginal fold); the per-item
    * fractional terms fan in through exact_sum so the one-row report
    * is bit-deterministic under any partitioning; marginal squares are
    * DECIMAL(38,0). Returns one row: (n_items, n_pairable,
    * n_categories, d_o, d_e, alpha) — alpha NULL when D_e = 0 (all
    * pairable mass in one category) or nothing is pairable. */
  def krippendorffAlpha(df: DataFrame, itemCol: Column,
      categoryCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val votes = df.select(itemCol.as("__i"), categoryCol.as("__c"))
      .where(col("__i").isNotNull && col("__c").isNotNull)
      .groupBy("__i", "__c").agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val byItem = votes.groupBy("__i")
      .agg(sum(col("__n")).as("__ni"))
      .where(col("__ni") >= 2)
    val withNi = votes.join(byItem, Seq("__i"))
    val itemStats = byItem.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("__ni")), lit(0L)).as("n_pairable"))
    val agreeTerm = col("__n").cast("double") *
      (col("__n") - 1).cast("double") / (col("__ni") - 1).cast("double")
    val aRow = withNi.agg(coalesce(
      graft.api.functions.exact_sum(agreeTerm), lit(0.0)).as("__A"))
    val catStats = withNi.groupBy("__c").agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("__nc").cast(dec) * col("__nc").cast(dec)),
          lit(0).cast(dec)).as("__sc2"))
    val j = itemStats.crossJoin(aRow).crossJoin(catStats) // 1×1 scalars
    val n = col("n_pairable").cast("double")
    val dO = when(col("n_pairable") > 0, (n - col("__A")) / n)
    val dE = when(col("n_pairable") >= 2,
      (n * n - col("__sc2").cast("double")) / (n * (n - lit(1.0))))
    j.select(col("n_items"), col("n_pairable"), col("n_categories"),
      dO.as("d_o"), dE.as("d_e"),
      when(dE > 0, lit(1.0) - dO / dE).as("alpha"))
  }

  /** CUPED variance reduction (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments") — the standard
    * covariate-adjustment pass an eval/experiment pipeline runs before
    * comparing arms: with a pre-treatment covariate X (last period's
    * metric, prompt difficulty, document length),
    *
    *   θ = cov(X, Y) / var(X)      (POOLED across arms — using a
    *                                per-arm θ would bias the contrast)
    *   Y_adj = Y − θ·(X − x̄_pool)
    *
    * removes the variance Y shares with X (factor 1 − ρ²) without
    * biasing arm means, shrinking confidence intervals at no data
    * cost. Returns one row per group: (groupCols…, n, theta, mean_y,
    * mean_adj, var_y, var_adj, var_reduction) — var columns are sample
    * variances of the raw and adjusted metric, var_reduction =
    * 1 − var_adj/var_y; NULL fit columns for degenerate var(X) = 0.
    *
    * Scale shape: ONE corpus pass — a single map-side-combined grouped
    * moment fold through exact_sum; the POOLED moments are the sums of
    * the group moments (a second fold over the group-sized frame, not
    * the corpus), and the adjusted statistics come from the same
    * grouped moments in closed form
    * (var(Y−θX) = var_Y + θ²·var_X − 2θ·cov_XY). Group sums are
    * bit-deterministic under any partitioning, hence so is everything
    * derived. NULL metric/covariate rows are refused work (dropped). */
  def cuped(df: DataFrame, groupCols: Seq[String], metricCol: Column,
      covariateCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val y = metricCol.cast("double")
    val x = covariateCol.cast("double")
    val base = df.where(y.isNotNull && x.isNotNull)
      .select((groupCols.map(col) :+ y.as("__y")) :+ x.as("__x"): _*)
    import graft.api.{functions => gfn}
    val grouped = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        gfn.exact_sum(col("__x")).as("__sx"),
        gfn.exact_sum(col("__y")).as("__sy"),
        gfn.exact_sum(col("__x") * col("__x")).as("__sxx"),
        gfn.exact_sum(col("__x") * col("__y")).as("__sxy"),
        gfn.exact_sum(col("__y") * col("__y")).as("__syy"))
      .localCheckpoint() // group-sized; feeds the pooled fold + output
    val pooled = grouped.agg(
        coalesce(sum(col("__n")), lit(0L)).as("__n"),
        gfn.exact_sum(col("__sx")).as("__sx"),
        gfn.exact_sum(col("__sy")).as("__sy"),
        gfn.exact_sum(col("__sxx")).as("__sxx"),
        gfn.exact_sum(col("__sxy")).as("__sxy"))
      .select(col("__n").as("__pn"),
        (col("__sx") / col("__n")).as("__pxbar"),
        when(col("__n") * col("__sxx") - col("__sx") * col("__sx") > 0,
          (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
            (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
          .as("__theta"))
    val n = col("__n").cast("double")
    def sampleVar(sxx: Column, sx: Column) =
      when(col("__n") >= 2, (n * sxx - sx * sx) / (n * (n - 1)))
    val varY = sampleVar(col("__syy"), col("__sy"))
    val varX = sampleVar(col("__sxx"), col("__sx"))
    val covXY = when(col("__n") >= 2,
      (n * col("__sxy") - col("__sx") * col("__sy")) / (n * (n - 1)))
    val varAdj = varY + col("__theta") * col("__theta") * varX -
      lit(2.0) * col("__theta") * covXY
    grouped.crossJoin(broadcast(pooled)) // 1-row scalar side
      .select(groupCols.map(col) ++ Seq(
        col("__n").as("n"),
        col("__theta").as("theta"),
        (col("__sy") / n).as("mean_y"),
        (col("__sy") / n - col("__theta") *
          (col("__sx") / n - col("__pxbar"))).as("mean_adj"),
        varY.as("var_y"),
        varAdj.as("var_adj"),
        when(varY > 0, lit(1.0) - varAdj / varY).as("var_reduction")): _*)
  }

  /** Effective sample size of a weighted sample (Kish 1965's design
    * effect; the standard IS-weights diagnostic):
    * `ess = (Σw)² / Σw²` — how many UNWEIGHTED samples the weighted
    * set is worth. The first number to read after any importance
    * weighting ([[graft.ops.Reward.offPolicyValue]]'s IPS weights,
    * [[graft.ops.Dsir]] importance resampling, [[postStratify]]
    * inputs): an eval over 100k rows with ess = 400 has 400 rows of
    * evidence. One map-side-combined exact_sum fold per group;
    * non-finite/negative/NULL weights are refused work (dropped —
    * they'd poison Σw silently). Returns (groupCols…, n, sum_w,
    * sum_w2, ess, efficiency = ess/n). */
  def effectiveSampleSize(df: DataFrame, groupCols: Seq[String],
      weightCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    import graft.api.{functions => gfn}
    val w = weightCol.cast("double")
    df.where(w.isNotNull && w >= 0 && !isnan(w) &&
        w =!= Double.PositiveInfinity)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        gfn.exact_sum(w).as("sum_w"),
        gfn.exact_sum(w * w).as("sum_w2"))
      .withColumn("ess", when(col("sum_w2") > 0,
        col("sum_w") * col("sum_w") / col("sum_w2")))
      .withColumn("efficiency", col("ess") / col("n"))
  }

  /** Post-stratified estimator (the survey-sampling workhorse, e.g.
    * Cochran 1977 §5A): when eval data over- or under-samples known
    * strata (domains, languages, difficulty tiers), re-weight the
    * per-stratum means by POPULATION shares instead of sample shares:
    *
    *   ȳ_ps = Σ_h W_h·ȳ_h        v(ȳ_ps) = Σ_h W_h²·s_h²/n_h
    *
    * with W_h the caller's population weights (must sum to ~1; checked
    * to 1e-9). The honest aggregate metric when the eval mix drifted
    * from the deployment mix — [[cuped]] cuts variance, this cuts
    * composition bias. Strata PRESENT IN DATA but missing from
    * `weights` are refused work (fail fast — silently dropping mass
    * biases the estimate); weighted strata absent from the data make
    * the estimator undefined (NULL overall, per-stratum rows show
    * which). One grouped exact_sum moment pass; everything after runs
    * on the strata-sized frame. Returns one row per weighted stratum
    * (stratum, n, w, mean, var_mean) plus an `__overall` row carrying
    * ȳ_ps and v(ȳ_ps). */
  def postStratify(df: DataFrame, strataCol: Column, valueCol: Column,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must sum to 1")
    require(weights.map(_._1).toSet.size == weights.size,
      "duplicate stratum in weights")
    import graft.api.{functions => gfn}
    val spark = df.sparkSession
    import spark.implicits._
    val y = valueCol.cast("double")
    val base = df.where(y.isNotNull && strataCol.isNotNull)
      .select(strataCol.cast("string").as("__h"), y.as("__y"))
    val got = base.groupBy("__h")
      .agg(count(lit(1)).as("n"),
        gfn.exact_sum(col("__y")).as("__sy"),
        gfn.exact_sum(col("__y") * col("__y")).as("__syy"))
      .localCheckpoint(eager = false) // strata-sized; feeds the guard + both outputs
    val unknown = got.join(
      weights.map(_._1).toDF("__h"), Seq("__h"), "left_anti")
      .select("__h").collect().map(_.getString(0))
    require(unknown.isEmpty,
      s"strata present in data but missing from weights: " +
        unknown.sorted.mkString(", ") + " — silently dropping their " +
        "mass would bias the estimate; extend weights or pre-filter")
    val w = weights.toDF("__h", "w")
    val n = col("n").cast("double")
    val perStratum = w.join(got, Seq("__h"), "left")
      .select(col("__h").as("stratum"),
        coalesce(col("n"), lit(0L)).as("n"), col("w"),
        (col("__sy") / n).as("mean"),
        when(col("n") >= 2,
          (n * col("__syy") - col("__sy") * col("__sy")) /
            (n * (n - 1)) / n).as("var_mean"))
    val overall = perStratum.agg(
      coalesce(sum(col("n")), lit(0L)).as("n"),
      gfn.exact_sum(col("w") * col("mean")).as("mean"),
      gfn.exact_sum(col("w") * col("w") * col("var_mean")).as("var_mean"),
      max(col("n").cast("long") === 0 ||
        col("var_mean").isNull).as("__undef"))
    perStratum.unionByName(
      overall.select(lit("__overall").as("stratum"), col("n"),
        lit(1.0).as("w"),
        when(!col("__undef"), col("mean")).as("mean"),
        when(!col("__undef"), col("var_mean")).as("var_mean")))
  }

  /** Isotonic (monotone) calibration via pool-adjacent-violators
    * (Ayer et al. 1955; Zadrozny & Elkan 2002's calibration use) —
    * the non-parametric companion of [[temperatureFit]]: scores bin on
    * a fixed [0, 1] grid, and the per-bin positive rates are replaced
    * by the closest NON-DECREASING sequence in weighted least squares,
    * which PAV solves exactly. Equivalent closed form (the max-min
    * characterization, what an independent oracle can replay):
    * iso_i = max_{j≤i} min_{k≥i} (Σ_{j..k} pos / Σ_{j..k} n) over
    * non-empty bins.
    *
    * Scale shape: ONE grouped count/sum shuffle into ≤ `bins` rows;
    * PAV runs driver-side on that bounded frame (the accepted
    * bounded-collect class — `bins` is capped at 1024 and is the op's
    * whole output). Scores outside [0, 1] and NULL rows are refused
    * work. Returns one row per NON-EMPTY bin:
    * (bin, n, n_pos, rate_raw, rate_iso) with rate_iso non-decreasing
    * in bin. */
  def isotonicFit(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 32): DataFrame = {
    require(bins >= 1 && bins <= 1024, "bins must be in [1, 1024]")
    val spark = df.sparkSession
    val s = scoreCol.cast("double")
    val y = labelCol.cast("boolean")
    val binned = df.where(s.isNotNull && y.isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(least(floor(s * bins).cast("int"), lit(bins - 1))
        .as("bin"), y.as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y").cast("long")).as("n_pos"))
      .orderBy("bin")
    val rows = binned.collect() // <= bins rows -- the op's whole output
    // PAV sweep: pools merge while the incoming block's rate is <= the
    // last pool's (pooling ties keeps the output strictly increasing
    // across pool boundaries -- the canonical solution)
    case class Pool(n: Long, pos: Long, from: Int)
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    rows.indices.foreach { i =>
      var cur = Pool(rows(i).getLong(1), rows(i).getLong(2), i)
      // exact rational compare: the double cross-product loses bits
      // past 2^53 (bin counts at 100 TB scale can be 1e12+)
      while (pools.nonEmpty &&
        BigInt(pools.last.pos) * cur.n >= BigInt(cur.pos) * pools.last.n) {
        val prev = pools.remove(pools.length - 1)
        cur = Pool(prev.n + cur.n, prev.pos + cur.pos, prev.from)
      }
      pools += cur
    }
    // pool p covers bin positions [p.from, nextPool.from)
    val bounds = pools.map(_.from).drop(1) :+ rows.length
    val iso = new Array[Double](rows.length)
    pools.zip(bounds).foreach { case (pool, until) =>
      val rate = pool.pos.toDouble / pool.n
      (pool.from until until).foreach(iso(_) = rate)
    }
    import spark.implicits._
    rows.indices.map { i =>
      (rows(i).getInt(0), rows(i).getLong(1), rows(i).getLong(2),
        rows(i).getLong(2).toDouble / rows(i).getLong(1), iso(i))
    }.toDF("bin", "n", "n_pos", "rate_raw", "rate_iso")
  }

  /** Corpus-level BLEU (Papineni et al. 2002) per group — the n-gram
    * overlap score a generation/translation pipeline reports over
    * millions of (reference, candidate) pairs. Whitespace tokenization
    * (empty tokens dropped), modified n-gram precision with per-pair
    * clipping, corpus brevity penalty from the summed lengths; BLEU = 0
    * when any order's precision is 0 (corpus-level counts make smoothing
    * unnecessary at scale).
    *
    * Scale shape: clipping is PER-PAIR in BLEU, so the entire gram inner
    * loop runs scan-side in one codegen'd expression
    * (gram_overlap_counts: sorted-merge multiset intersection of 64-bit
    * gram hashes per order) — NO gram ever shuffles; the only shuffle is
    * the group-keyed fold of 3 + 2·maxN exact integer sums. (An earlier
    * (pair, n, gram)-keyed count-shuffle formulation of the same numbers
    * measured 182 s at 5M pairs / 150M tokens per side — §8.2 records
    * what this replaced.)
    *
    * Returns one row per group: (groupCols…, n_pairs, ref_len, cand_len,
    * p1..p{maxN}, bp, bleu); p_n is NULL when the candidate side has no
    * n-grams of that order, and bleu NULL when any order is NULL. */
  def bleu(df: DataFrame, idCol: String, refCol: Column, candCol: Column,
      groupCols: Seq[String] = Nil, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN must be in [1, 8]")
    val g = groupCols.map(col)
    val gfn = graft.api.functions
    val base = df.select(g ++ Seq(col(idCol).as("__id"),
      refCol.as("__r"), candCol.as("__c")): _*)
      .where(col("__r").isNotNull && col("__c").isNotNull)
      .select(g ++ Seq(
        gfn.token_count(col("__r")).cast("long").as("__nr"),
        gfn.token_count(col("__c")).cast("long").as("__nc"),
        gfn.gram_overlap_counts(col("__r"), col("__c"), maxN)
          .as("__oc")): _*)
    def fld(n: Int, f: String): Column =
      element_at(col("__oc"), n).getField(f)
    val aggCols = Seq(
      count(lit(1)).as("n_pairs"),
      coalesce(sum(col("__nr")), lit(0L)).as("ref_len"),
      coalesce(sum(col("__nc")), lit(0L)).as("cand_len")) ++
      (1 to maxN).flatMap(n => Seq(
        coalesce(sum(fld(n, "clip")), lit(0L)).as(s"__clip$n"),
        coalesce(sum(fld(n, "denc")), lit(0L)).as(s"__den$n")))
    val joined = base.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
      .select(g ++ Seq(col("n_pairs"), col("ref_len"), col("cand_len")) ++
        (1 to maxN).map(n =>
          (col(s"__clip$n").cast("double") /
            nullif(col(s"__den$n"), lit(0L)).cast("double")).as(s"p$n")): _*)
    val bp = when(col("cand_len") >= col("ref_len") || col("ref_len") === 0,
      lit(1.0)).otherwise(
      exp(lit(1.0) - col("ref_len").cast("double") / col("cand_len")))
    val ps = (1 to maxN).map(n => col(s"p$n"))
    val logSum = ps.map(p => log(p)).reduce(_ + _)
    val anyNullOrZero = ps.map(p => p.isNull || p === 0.0).reduce(_ || _)
    val anyNull = ps.map(_.isNull).reduce(_ || _)
    joined.select(g ++ Seq(col("n_pairs"), col("ref_len"), col("cand_len")) ++
      ps ++ Seq(bp.as("bp"),
        when(anyNull, lit(null).cast("double"))
          .when(anyNullOrZero, lit(0.0))
          .otherwise(bp * exp(logSum / maxN)).as("bleu")): _*)
  }

  /** N-gram diversity (distinct-n) per group — the mode-collapse
    * diagnostic for synthetic/generated corpora: the ratio of DISTINCT
    * token n-grams to total n-grams per order. A generator looping on
    * templates shows it immediately (distinct-2 collapses long before
    * eyeballing does). Exact counts: grams travel as 64-bit window
    * hashes (one scan, one (group, n, gram)-keyed distinct aggregation
    * — the honest exact path; at extreme scale swap the countDistinct
    * for the engine's `hll_agg` when ±1% suffices). Returns one row per
    * (groupCols…, n): (…, n, n_grams, n_distinct, distinct_ratio). */
  def distinctN(df: DataFrame, textCol: Column, maxN: Int = 4,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN must be in [1, 8]")
    val g = groupCols.map(col)
    val gfn = graft.api.functions
    val grams = df.where(textCol.isNotNull)
      .select(g :+ explode(flatten(array((1 to maxN).map(n =>
        transform(gfn.shingle_hashes_pos(textCol, n),
          h => struct(lit(n).as("n"), h.as("gr")))): _*))).as("__g"): _*)
    grams.groupBy(g :+ col("__g.n").as("n"): _*)
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("__g.gr")).as("n_distinct"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_grams"))
  }

  /** Pooled pairwise self-BLEU per group — the companion diversity
    * receipt to [[distinctN]]: every document scores as a CANDIDATE
    * against `poolSize` deterministic partner documents (the group's
    * smallest-unsigned-hash docs — the same subset-monotone hash order
    * every sampler here uses), and the pair counts pool into ONE corpus
    * BLEU per group. High self-BLEU = documents paraphrase each other =
    * mode collapse; natural corpora sit low. Pooling avoids the
    * sentence-BLEU smoothing question entirely (zero-overlap pairs just
    * contribute zeros to the pooled counts).
    *
    * Scale shape: the pool is poolSize × groups rows and BROADCASTS;
    * each doc meets only its group's pool (corpus × poolSize pairs,
    * scan-side gram kernel via [[bleu]]) — the corpus never self-joins.
    * Returns [[bleu]]'s schema per group; read `bleu` as `self_bleu`. */
  def selfBleu(df: DataFrame, idCol: String, textCol: Column,
      groupCols: Seq[String] = Nil, poolSize: Int = 8,
      maxN: Int = 4): DataFrame = {
    require(poolSize >= 1, "poolSize must be >= 1")
    val g = groupCols.map(col)
    val gfn = graft.api.functions
    val base = df.select(g ++ Seq(col(idCol).as("__id"),
      textCol.as("__t")): _*)
      .where(col("__t").isNotNull)
    val unsignedOrd = gfn.hash64(col("__id")).bitwiseXOR(lit(Long.MinValue))
    val pool =
      if (g.isEmpty)
        // global bottom-k: TakeOrdered, no single-partition window
        base.orderBy(unsignedOrd).limit(poolSize)
          .select(col("__id").as("__pid"), col("__t").as("__pt"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(g: _*).orderBy(unsignedOrd)
        // rank <= k collapses to WindowGroupLimit (no per-group sort
        // materialization), the quotaSample shape
        base.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= poolSize)
          .select(g ++ Seq(col("__id").as("__pid"),
            col("__t").as("__pt")): _*)
      }
    val pairs =
      (if (g.isEmpty) base.crossJoin(broadcast(pool))
       else base.join(broadcast(pool), groupCols))
        .where(col("__id") =!= col("__pid"))
    bleu(pairs, "__id", col("__pt"), col("__t"), groupCols, maxN)
  }

  /** Corpus-level chrF (Popović 2015) per group — the character-n-gram
    * F-score that complements [[bleu]]: robust to tokenization and
    * morphology differences, the standard second metric on translation
    * pipelines. Whitespace is removed entirely (the paper's convention),
    * character n-grams run n = 1..`maxN` (default 6), counts pool over
    * the whole group (corpus-level), and the score follows the original
    * macro formulation: P = mean over orders of clipped-match precision,
    * R = mean over orders of recall, chrF_β = (1+β²)·P·R/(β²·P+R) with
    * β = 2 (recall-weighted). An order with an empty candidate
    * (resp. reference) side contributes precision (resp. recall) 0 —
    * pinned so engines cannot disagree; chrF = 0 when P + R = 0.
    *
    * Same scale shape as [[bleu]]: the clipped char-gram overlap is
    * per-pair, computed scan-side in one codegen'd expression
    * (char_gram_overlap_counts) — no gram shuffles; the only shuffle is
    * the group-keyed fold of 1 + 3·maxN exact integer sums. (The
    * (pair, n, gram)-count formulation this replaced benched 19.3 s at
    * sf0.1 — the suite's slowest gate — vs ~1 s for this shape.)
    * Returns one row per group: (groupCols…, n_pairs, chrp, chrr, chrf). */
  def chrF(df: DataFrame, idCol: String, refCol: Column, candCol: Column,
      groupCols: Seq[String] = Nil, maxN: Int = 6,
      beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN must be in [1, 8]")
    require(beta > 0, "beta must be positive")
    val g = groupCols.map(col)
    val gfn = graft.api.functions
    val strip = (c: Column) => regexp_replace(c, "\\s+", "")
    val base = df.select(g ++ Seq(col(idCol).as("__id"),
      strip(refCol).as("__r"), strip(candCol).as("__c")): _*)
      .where(col("__r").isNotNull && col("__c").isNotNull)
      .select(g :+ gfn.char_gram_overlap_counts(col("__r"), col("__c"),
        maxN).as("__oc"): _*)
    def fld(n: Int, f: String): Column =
      element_at(col("__oc"), n).getField(f)
    val aggCols = Seq(count(lit(1)).as("n_pairs")) ++
      (1 to maxN).flatMap(n => Seq(
        coalesce(sum(fld(n, "clip")), lit(0L)).as(s"__clip$n"),
        coalesce(sum(fld(n, "denc")), lit(0L)).as(s"__denc$n"),
        coalesce(sum(fld(n, "denr")), lit(0L)).as(s"__denr$n")))
    // per-order P/R with the pinned zero convention, then macro-average;
    // a gram order entirely absent from the group (doc shorter than n on
    // both sides) still divides by maxN — orders are fixed, not observed
    def ratio(n: Int, den: String): Column =
      when(col(s"__clip$n") > 0,
        col(s"__clip$n").cast("double") / col(s"__$den$n"))
        .otherwise(lit(0.0))
    val joined = base.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
      .select(g ++ Seq(col("n_pairs"),
        ((1 to maxN).map(n => ratio(n, "denc")).reduce(_ + _) / maxN)
          .as("chrp"),
        ((1 to maxN).map(n => ratio(n, "denr")).reduce(_ + _) / maxN)
          .as("chrr")): _*)
    val b2 = beta * beta
    joined.select(g ++ Seq(col("n_pairs"), col("chrp"), col("chrr"),
      when(col("chrp") + col("chrr") > 0,
        lit(1 + b2) * col("chrp") * col("chrr") /
          (lit(b2) * col("chrp") + col("chrr"))).otherwise(lit(0.0))
        .as("chrf")): _*)
  }

  /** ROUGE-L (Lin 2004) per group — longest-common-subsequence recall/
    * precision/F1, the summarization-eval staple next to [[bleu]]/[[chrF]]:
    * LCS rewards in-order coverage without requiring contiguous matches.
    * Sentence-level convention: P = LCS/|cand|, R = LCS/|ref|,
    * F = 2PR/(P+R) per pair, macro-averaged over the group (the common
    * reporting form). A side with no tokens scores its ratio 0, and
    * F = 0 when P + R = 0 — pinned so engines cannot disagree.
    *
    * Scale shape: the LCS is a codegen'd scan-side expression
    * (token_lcs — O(n·m) per pair over 64-bit token hashes, O(min) memory),
    * so the ONLY shuffle is the group-keyed fold of four aggregates;
    * averages fan in through exact_sum. Returns one row per group:
    * (groupCols…, n_pairs, lcs_sum, avg_p, avg_r, avg_f). */
  def rougeL(df: DataFrame, idCol: String, refCol: Column, candCol: Column,
      groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val gf = graft.api.functions
    val base = df.select(g ++ Seq(col(idCol).as("__id"),
      refCol.as("__r"), candCol.as("__c")): _*)
      .where(col("__r").isNotNull && col("__c").isNotNull)
      .select(g ++ Seq(
        gf.token_lcs(col("__r"), col("__c")).cast("long").as("__l"),
        gf.token_count(col("__r")).cast("long").as("__nr"),
        gf.token_count(col("__c")).cast("long").as("__nc")): _*)
    val p = when(col("__nc") > 0,
      col("__l").cast("double") / col("__nc")).otherwise(lit(0.0))
    val r = when(col("__nr") > 0,
      col("__l").cast("double") / col("__nr")).otherwise(lit(0.0))
    val f = when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0))
    base.groupBy(g: _*).agg(
      count(lit(1)).as("n_pairs"),
      coalesce(sum(col("__l")), lit(0L)).as("lcs_sum"),
      (gf.exact_sum(p) / count(lit(1))).as("avg_p"),
      (gf.exact_sum(r) / count(lit(1))).as("avg_r"),
      (gf.exact_sum(f) / count(lit(1))).as("avg_f"))
  }

  /** Metric stability under deterministic resampling — the "how many
    * digits of that score are real" receipt. Each of `replicates`
    * replicas is a HASH-SELECTED half of the corpus (row id r-salted
    * through the engine's 64-bit hash, bit 0 decides membership), so the
    * replica set is identical on any engine, partitioning, or retry — a
    * seedless bootstrap whose spread estimates the metric's sampling
    * noise. Returns one row per replicate: (replicate, n, mean); the
    * caller folds spread statistics (or gates the rows directly).
    *
    * Scale shape: the corpus scans ONCE and explodes onto the (small,
    * literal) replicate list; the shuffle after map-side combine is
    * replicates × partitions partial rows — corpus-size independent. The
    * per-replicate mean accumulates through exact_sum, so every digit is
    * partitioning-invariant. */
  def metricReplicates(df: DataFrame, idCol: Column, valueCol: Column,
      replicates: Int = 32): DataFrame = {
    require(replicates >= 2 && replicates <= 64,
      "replicates must be in [2, 64]")
    val rows = df.select(idCol.cast("string").as("__id"),
        valueCol.cast("double").as("__v"))
      .where(col("__id").isNotNull && col("__v").isNotNull)
    rows.select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("replicate"))
      .where(pmod(graft.api.functions.hash64(
        concat(col("__id"), lit(":"), col("replicate"))), lit(2)) === 0)
      .groupBy(col("replicate"))
      .agg(count(lit(1)).as("n"),
        (graft.api.functions.exact_sum(col("__v")) / count(lit(1)))
          .as("mean"))
  }

  /** Self-consistency majority voting (Wang et al. 2023,
    * "Self-Consistency Improves Chain of Thought Reasoning"): per
    * group (prompt), the modal answer among sampled candidates, with a
    * DETERMINISTIC tie rule — among answers of maximal (weighted)
    * count, the smallest answer wins — so reruns and re-partitions
    * elect the same answer. Returns one row per group:
    * `(groupCols…, vote, vote_n, n_total, n_distinct, agreement)`
    * where `agreement = vote_n / n_total` (the usual confidence
    * proxy). NULL answers are refused work (dropped). `weightCol`
    * (default 1 per candidate) weighs votes, e.g. by sampler
    * likelihood.
    *
    * Two aggregations, both map-side combined: candidates reduce to
    * (group, answer) counts first, and the election runs over the
    * already-reduced counts — the second shuffle moves one row per
    * DISTINCT answer, not per candidate. The election itself is a
    * `min_by` over `struct(−count, answer)`, so max count + min answer
    * resolves in one pass with no window and no join. */
  def majorityVote(df: DataFrame, groupCols: Seq[String],
      answerCol: Column, weightCol: Column = lit(1L)): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val counts = df.where(answerCol.isNotNull)
      .groupBy((groupCols.map(col) :+ answerCol.as("__ans")): _*)
      .agg(sum(weightCol.cast("long")).as("__cnt"))
    counts.groupBy(groupCols.map(col): _*)
      .agg(
        min_by(col("__ans"),
          struct((-col("__cnt")).as("a"), col("__ans").as("b")))
          .as("vote"),
        max(col("__cnt")).as("vote_n"),
        sum(col("__cnt")).as("n_total"),
        count(lit(1)).as("n_distinct"))
      .withColumn("agreement",
        col("vote_n").cast("double") / col("n_total"))
  }

  /** Post-hoc temperature scaling fit (Guo et al. 2017, "On
    * Calibration of Modern Neural Networks") by grid search: for each
    * candidate temperature T, the binary NLL of σ(logit/T) against
    * labels — `chosen` marks the argmin (ties → smaller T, the less
    * aggressive rescale). The σ/log fold is overflow-stable
    * (softplus form: NLL term = softplus(l/T) − y·l/T). One scan
    * explodes onto the literal grid and folds through
    * [[graft.api.functions.exact_sum]]; NULLs are refused work.
    * Returns one row per T: (temperature, n, nll, chosen). */
  def temperatureFit(df: DataFrame, logitCol: Column,
      labelCol: Column, grid: Seq[Double]): DataFrame = {
    require(grid.nonEmpty && grid.forall(_ > 0),
      "grid temperatures must be > 0")
    require(grid.distinct.size == grid.size, "duplicate temperatures")
    val l = logitCol.cast("double")
    val y = labelCol.cast("boolean").cast("double")
    // NLL term: −ln σ(z) + (1−y)·z = softplus(z) − y·z, stable at any |z|
    val nll = df.where(l.isNotNull && y.isNotNull)
      .select(l.as("__l"), y.as("__y"),
        explode(typedLit(grid)).as("temperature"))
      .groupBy(col("temperature"))
      .agg(count(lit(1)).as("n"),
        (graft.api.functions.exact_sum(
          greatest(col("__l") / col("temperature"), lit(0.0))
            + log1p(exp(-abs(col("__l") / col("temperature"))))
            - col("__y") * (col("__l") / col("temperature")))
          / count(lit(1))).as("nll"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("nll"), col("temperature"))
    nll.withColumn("chosen", row_number().over(wAll) === 1)
      .select(col("temperature"), col("n"), col("nll"), col("chosen"))
  }

  /** Ranked-retrieval metrics per query — the IR report card for a
    * search/RAG stack (complements [[auc]]'s classification view):
    * NDCG@k with exponential gain `(2^rel − 1)/log₂(rank+1)` against
    * the ideal ordering, MRR (reciprocal rank of the first relevant),
    * and recall/precision@k. Ranking is (score DESC, tie) — `tieCol`
    * totalizes, so the metrics are deterministic. TWO windows per
    * query (actual and ideal order) over the same partition key plus
    * one aggregation; nothing global. NULL scores/relevance are
    * refused work. Returns (groupCols…, n, n_rel, ndcg, mrr, recall_k,
    * precision_k); queries with no relevant docs report NULL
    * ndcg/mrr/recall (nothing to find). */
  def rankingMetrics(df: DataFrame, groupCols: Seq[String],
      scoreCol: Column, relCol: Column, tieCol: Column,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(k >= 1, "k must be >= 1")
    val s = scoreCol.cast("double")
    val rel = relCol.cast("long")
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(s.desc, tieCol)
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(rel.desc, tieCol)
    val ranked = df.where(s.isNotNull && rel.isNotNull)
      .withColumn("__rel", rel)
      .withColumn("__rk", row_number().over(wS).cast("long"))
      .withColumn("__irk", row_number().over(wI).cast("long"))
    val gain = (r: Column) => (pow(lit(2.0), col("__rel")) - 1.0) /
      log2(r.cast("double") + 1.0)
    ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum((col("__rel") > 0).cast("long")).as("n_rel"),
        graft.api.functions.exact_sum(
          when(col("__rk") <= k, gain(col("__rk")))
            .otherwise(lit(0.0))).as("__dcg"),
        graft.api.functions.exact_sum(
          when(col("__irk") <= k, gain(col("__irk")))
            .otherwise(lit(0.0))).as("__idcg"),
        min(when(col("__rel") > 0, col("__rk"))).as("__first"),
        sum((col("__rk") <= k && col("__rel") > 0).cast("long"))
          .as("__hits"))
      .select(groupCols.map(col) ++ Seq(col("n"), col("n_rel"),
        when(col("n_rel") > 0 && col("__idcg") > 0,
          col("__dcg") / col("__idcg")).as("ndcg"),
        when(col("n_rel") > 0,
          lit(1.0) / col("__first").cast("double")).as("mrr"),
        when(col("n_rel") > 0,
          col("__hits").cast("double") / col("n_rel")).as("recall_k"),
        (col("__hits").cast("double") / least(col("n"), lit(k.toLong))
          .cast("double")).as("precision_k")): _*)
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009) — the standard
    * score-free fuser for hybrid retrieval (BM25 + dense, or any two
    * rankers): per query, each document's fused score is
    * `1/(c + rank_A) + 1/(c + rank_B)` over the two rankers'
    * (score DESC, tie) ranks, and the top-k by (fused DESC, tie) come
    * back with all three ranks. Integer ranks make the fused doubles
    * bit-identical on any engine, so selection needs no rounding
    * grain. Three windows sharing one partition key; no join — both
    * rankings are columns of the same row. */
  def rrfFuse(df: DataFrame, groupCols: Seq[String],
      scoreACol: Column, scoreBCol: Column, tieCol: Column,
      k: Int, c: Int = 60): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(k >= 1 && c >= 1, "k and c must be >= 1")
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(scoreACol.cast("double").desc, tieCol)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(scoreBCol.cast("double").desc, tieCol)
    val fused = df
      .where(scoreACol.isNotNull && scoreBCol.isNotNull)
      .withColumn("rank_a", row_number().over(wA).cast("long"))
      .withColumn("rank_b", row_number().over(wB).cast("long"))
      .withColumn("rrf",
        lit(1.0) / (col("rank_a") + c).cast("double") +
          lit(1.0) / (col("rank_b") + c).cast("double"))
    val wF = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("rrf").desc, tieCol)
    fused.withColumn("fused_rank", row_number().over(wF).cast("long"))
      .where(col("fused_rank") <= k)
  }

  /** Paired-eval power analysis — "how many more eval examples do I
    * need before this A-vs-B gap is decidable": per group, from the
    * paired differences d = A − B, the sample size required for a
    * two-sided z-test at significance `alpha` and power `power`,
    * `n_req = ⌈(z_{α/2} + z_β)² · s² / d̄²⌉`. Returns
    * (groupCols…, n, mean_diff, var_diff, n_req, enough) — `enough` =
    * n ≥ n_req; a zero observed effect refuses with NULL n_req (no
    * finite n decides an effect of zero). Moments through
    * [[graft.api.functions.exact_sum]], one aggregation. Only
    * (alpha, power) = (0.05, 0.8) and (0.01, 0.9) are accepted — the
    * z constants are baked literals so both engines hold identical
    * doubles (no inverse-normal at runtime). */
  def powerAnalysis(df: DataFrame, groupCols: Seq[String],
      scoreACol: Column, scoreBCol: Column, alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val z: Double = (alpha, power) match {
      case (0.05, 0.8) => 1.959963984540054 + 0.8416212335729143
      case (0.01, 0.9) => 2.5758293035489004 + 1.2815515655446004
      case _ => throw new IllegalArgumentException(
        "supported (alpha, power): (0.05, 0.8), (0.01, 0.9)")
    }
    val d = scoreACol.cast("double") - scoreBCol.cast("double")
    df.where(d.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        graft.api.functions.exact_sum(d).as("__s1"),
        graft.api.functions.exact_sum(d * d).as("__s2"))
      .select(groupCols.map(col) ++ {
        val n = col("n").cast("double")
        val mean = col("__s1") / n
        val variance = greatest(
          (col("__s2") - col("__s1") * col("__s1") / n) / (n - 1),
          lit(0.0))
        val nReq = when(col("n") >= 2 && mean =!= 0.0,
          ceil(lit(z * z) * variance / (mean * mean)).cast("long"))
        Seq(col("n"), mean.as("mean_diff"), when(col("n") >= 2,
            variance).as("var_diff"), nReq.as("n_req"),
          when(nReq.isNotNull, col("n") >= nReq).as("enough"))
      }: _*)
  }

  /** Pinball (quantile) loss at each requested τ — the eval for
    * quantile-calibrated predictors (a reward model emitting a τ-th
    * percentile should minimize it): per (group, τ),
    * `mean(max(τ·e, (τ−1)·e))` over errors e = actual − predicted.
    * One exact_sum aggregation after a scan-side explode onto the
    * literal τ list; dyadic τ and integer-valued inputs keep every
    * term exact. Returns (groupCols…, tau, n, loss). */
  def pinballLoss(df: DataFrame, groupCols: Seq[String],
      predictedCol: Column, actualCol: Column,
      taus: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(taus.nonEmpty && taus.forall(t => t > 0 && t < 1),
      "each tau must be in (0, 1)")
    val e = actualCol.cast("double") - predictedCol.cast("double")
    df.where(e.isNotNull)
      .select(groupCols.map(col) :+ e.as("__e")
        :+ explode(typedLit(taus)).as("tau"): _*)
      .groupBy(groupCols.map(col) :+ col("tau"): _*)
      .agg(count(lit(1)).as("n"),
        (graft.api.functions.exact_sum(
          greatest(col("tau") * col("__e"),
            (col("tau") - 1) * col("__e"))) / count(lit(1)))
          .as("loss"))
  }

  /** McNemar's paired test for two classifiers/models graded on the
    * SAME examples — the discordant-pair census behind "is B actually
    * better, or did it just win different rows": per group,
    * `n00/n01/n10/n11` (A-correct × B-correct contingency, exact
    * LONGs) and the continuity-corrected statistic
    * `(|n01 − n10| − 1)² / (n01 + n10)` (χ²₁-distributed under the
    * null; NULL when no discordant pairs exist — there is nothing to
    * test). One map-side-combined aggregation; rows with a NULL
    * outcome on either side are refused work. */
  def mcnemar(df: DataFrame, groupCols: Seq[String],
      okACol: Column, okBCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val a = okACol.cast("boolean")
    val b = okBCol.cast("boolean")
    df.where(a.isNotNull && b.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum((!a && !b).cast("long")).as("n00"),
        sum((!a && b).cast("long")).as("n01"),
        sum((a && !b).cast("long")).as("n10"),
        sum((a && b).cast("long")).as("n11"))
      .withColumn("chi2",
        when(col("n01") + col("n10") > 0,
          pow(greatest(abs(col("n01") - col("n10")) - lit(1.0),
            lit(0.0)), 2)
            / (col("n01") + col("n10")).cast("double")))
  }

  /** Split-conformal calibration thresholds (Vovk et al.; the
    * distribution-free abstention rule a selective-generation gate
    * runs): per group, for each miscoverage α, the threshold
    * `qhat` = the ⌈(n+1)(1−α)⌉-th smallest calibration nonconformity
    * score — predictions scoring ≤ qhat then cover with probability
    * ≥ 1−α on exchangeable data. Returns one row per (group, α):
    * `(groupCols…, alpha, n, k_rank, qhat, coverage)` where coverage
    * is the empirical fraction ≤ qhat (≥ 1−α by construction; > on
    * ties). Groups too small for the rank (k > n) refuse with NULL
    * qhat. NULL scores are refused work.
    *
    * Shape: ONE window exchange ranks each group's scores
    * (row_number + count over the same spec — one sort), the k-th row
    * is filtered out per α, and coverage joins the (groups × alphas)-
    * sized threshold table back group-keyed. Dyadic α keeps
    * (n+1)(1−α) exact, so k is bit-deterministic. */
  def conformalThreshold(df: DataFrame, groupCols: Seq[String],
      scoreCol: Column, tieCol: Column,
      alphas: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      "each alpha must be in (0, 1)")
    val s = scoreCol.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(s, tieCol)
    val ranked = df.where(s.isNotNull)
      .withColumn("__s", s)
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val withA = ranked.select((groupCols.map(col) ++ Seq(col("__s"),
        col("__rk"), col("__n"),
        explode(typedLit(alphas)).as("alpha"))): _*)
      .withColumn("k_rank",
        ceil((col("__n") + 1) * (lit(1.0) - col("alpha"))).cast("long"))
    val qhat = withA.where(col("__rk") === col("k_rank"))
      .select((groupCols.map(col) ++ Seq(col("alpha"),
        col("__n").cast("long").as("n"), col("k_rank"),
        col("__s").as("qhat"))): _*)
    // groups where k > n (too few calibration points) refuse with NULLs
    val refused = withA.where(col("k_rank") > col("__n"))
      .groupBy((groupCols.map(col) :+ col("alpha")): _*)
      .agg(max(col("__n")).cast("long").as("n"),
        max(col("k_rank")).as("k_rank"))
      .withColumn("qhat", lit(null).cast("double"))
      .select((groupCols.map(col) ++ Seq(col("alpha"), col("n"),
        col("k_rank"), col("qhat"))): _*)
    val cov = ranked.join(
        qhat.select((groupCols.map(col) ++ Seq(
          col("alpha"), col("qhat").as("__q"))): _*),
        groupCols, "inner")
      .groupBy((groupCols.map(col) :+ col("alpha")): _*)
      .agg((sum(when(col("__s") <= col("__q"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("coverage"))
    qhat.unionByName(refused)
      .join(cov, groupCols :+ "alpha", "left")
  }

  /** Risk–coverage curve receipts for selective prediction (Geifman &
    * El-Yaniv 2017): rank each group's rows by confidence DESCENDING,
    * so prefix i is "answer the i most-confident, abstain on the
    * rest"; `risk_i = cum_errors_i / i`, and AURC is the mean of
    * `risk_i` over all prefixes. Returns one row per group:
    * `(groupCols…, n, n_err, aurc, risk25, risk50, risk75, risk100)`
    * — the curve sampled at quartile coverage (prefix ⌈p·n⌉) plus its
    * area. ONE window exchange (rank + running error count share a
    * sort); the AURC fold runs through [[graft.api.functions.exact_sum]]
    * so results are bit-stable under any partitioning. `tieCol` must
    * total-order ties for a deterministic curve. */
  def riskCoverage(df: DataFrame, groupCols: Seq[String],
      confidenceCol: Column, errorCol: Column,
      tieCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val c = confidenceCol.cast("double")
    val e = errorCol.cast("boolean").cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(c.desc, tieCol)
    val run = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = df.where(c.isNotNull && e.isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__ce", sum(e).over(run))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)).cast("long"))
    // risk at coverage p = risk at prefix ⌈n·p⌉, exact integer ceil
    def riskAt(pNum: Int, pDen: Int): Column = {
      val target = call_function("div",
        col("__n") * pNum + (pDen - 1), lit(pDen.toLong))
      max(when(col("__i") === target,
        col("__ce").cast("double") / col("__i")))
    }
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"),
        sum(e).as("n_err"),
        (graft.api.functions.exact_sum(
          col("__ce").cast("double") / col("__i")) / max(col("__n")))
          .as("aurc"),
        riskAt(1, 4).as("risk25"), riskAt(1, 2).as("risk50"),
        riskAt(3, 4).as("risk75"), riskAt(1, 1).as("risk100"))
  }

  /** Best-of-n expected-max curve (the BoN analysis of Nakano et al.
    * 2021 "WebGPT" app. I): from N logged candidates per prompt, the
    * UNBIASED estimate of E[max reward over a random n-subset] for each
    * requested n — `E = Σ_i r_(i) · C(i−1, n−1) / C(N, n)` over the
    * ascending order statistics r_(i) — so the reward-vs-samples curve
    * comes from data already logged, no resampling. One row per group
    * per n: `(groupCols…, n_subset, n_cands, num, den, emax)` with
    * `num = Σ r_(i)·C(i−1, n−1)` (exact when rewards are integral),
    * `den = C(N, n)` an exact LONG, `emax = num/den`. Rows where
    * n > N, or where the group exceeds `maxCandidates`, refuse the
    * estimate with NULLs.
    *
    * One map-side aggregation collects each group's BOUNDED candidate
    * rewards (sampler fan-out, ≤ maxCandidates — never corpus-sized),
    * sorts in-cell, and folds the binomial weights as exact LONG
    * products inside codegen (`Π(i−t) div (n−1)!`). n ≤ 8 with
    * maxCandidates ≤ 128 keeps every product inside a LONG. */
  def bestOfN(df: DataFrame, groupCols: Seq[String],
      rewardCol: Column, ns: Seq[Int],
      maxCandidates: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8),
      "each n must be in [1, 8]")
    require(maxCandidates >= 1 && maxCandidates <= 128,
      "maxCandidates must be in [1, 128]")
    val r = rewardCol.cast("double")
    val agg = df.where(r.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(r)).as("__rs"))
      .withColumn("n_cands", size(col("__rs")).cast("long"))
    val k = col("n_subset")
    val nC = col("n_cands")
    val ok = k <= nC && nC <= maxCandidates
    def factTo(hi: Column): Column = aggregate(
      sequence(lit(1L), hi), lit(1L), (a, t) => a * t)
    val binomWeight = (i: Column) => when(k === 1, lit(1L))
      .otherwise(call_function("div",
        aggregate(sequence(lit(1L), k - 1), lit(1L),
          (a, t) => a * greatest(i - t, lit(0L))),
        when(k === 1, lit(1L)).otherwise(factTo(k - 1))))
    agg.select(col("*"),
        explode(typedLit(ns.map(_.toLong))).as("n_subset"))
      .withColumn("num", when(ok,
        aggregate(sequence(lit(1L), nC), lit(0.0),
          (acc, i) => acc +
            element_at(col("__rs"), i.cast("int")) *
              binomWeight(i).cast("double"))))
      .withColumn("den", when(ok,
        when(k === 1, nC).otherwise(
          call_function("div",
            aggregate(sequence(lit(1L), k), lit(1L),
              (a, t) => a * (nC - t + 1)),
            factTo(k)))))
      .withColumn("emax", col("num") / col("den").cast("double"))
      .drop("__rs")
  }

  /** Two-proportion z-test between the `isA === true` and
    * `isA === false` slices of one boolean outcome — the A/B answer
    * for pass rates, dedup-survival rates, filter keep rates:
    *
    *   z = (p̂_A − p̂_B) / √(p̄(1 − p̄)(1/n_A + 1/n_B))   (pooled p̄)
    *
    * plus the UNPOOLED 95% CI on the difference,
    * `diff ± 1.96·√(p̂_A q̂_A/n_A + p̂_B q̂_B/n_B)` (pooled SE is only
    * correct under H₀ — using it for the band is the classic
    * mistake). Returns one row `(n_a, n_b, k_a, k_b, p_a, p_b, diff,
    * z, lo95, hi95)` — p NULL on an empty side; z NULL when the
    * pooled variance is 0 (all successes or all failures overall).
    * NULL outcomes/sides are refused work. [[wilsonInterval]] remains
    * the per-slice band; this is the between-slice test.
    *
    * Shape: ONE count fold to four integers; everything after is
    * scan-side one-row arithmetic — bit-stable on any partitioning. */
  def twoProportionTest(df: DataFrame, isA: Column,
      success: Column): DataFrame = {
    val a = isA.cast("boolean")
    val s = success.cast("boolean")
    val agg = df.where(a.isNotNull && s.isNotNull).agg(
      count(when(a, 1)).as("n_a"), count(when(!a, 1)).as("n_b"),
      coalesce(sum(when(a && s, 1L)), lit(0L)).as("k_a"),
      coalesce(sum(when(!a && s, 1L)), lit(0L)).as("k_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val pa = when(col("n_a") > 0, col("k_a") / na)
    val pb = when(col("n_b") > 0, col("k_b") / nb)
    val diff = pa - pb
    val pPool = when(col("n_a") + col("n_b") > 0,
      (col("k_a") + col("k_b")) / (na + nb))
    // both-sides-present guards: ANSI division throws on n = 0, and
    // when() is what keeps the 1/n branches unevaluated there
    val both = col("n_a") > 0 && col("n_b") > 0
    val varPool = when(both,
      pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb))
    val z = when(varPool > 0, diff / sqrt(varPool))
    val se = when(both,
      sqrt(pa * (lit(1.0) - pa) / na + pb * (lit(1.0) - pb) / nb))
    val zq = 1.959963984540054 // the aucDeLong literal
    agg.select(col("n_a"), col("n_b"), col("k_a"), col("k_b"),
      pa.as("p_a"), pb.as("p_b"), diff.as("diff"), z.as("z"),
      (diff - lit(zq) * se).as("lo95"),
      (diff + lit(zq) * se).as("hi95"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 analysis — the
    * confounder-aware form of [[twoProportionTest]]: "does arm A
    * convert better than arm B ONCE source/language/shard is held
    * fixed?" Pooling strata with different base rates fabricates or
    * hides effects (Simpson's); CMH compares within each stratum and
    * combines:
    *
    *   OR_MH = Σᵢ aᵢdᵢ/nᵢ / Σᵢ bᵢcᵢ/nᵢ
    *   χ²    = (Σᵢ aᵢ − Σᵢ Eᵢ)² / Σᵢ Vᵢ,
    *   Eᵢ = (aᵢ+bᵢ)(aᵢ+cᵢ)/nᵢ,
    *   Vᵢ = (aᵢ+bᵢ)(cᵢ+dᵢ)(aᵢ+cᵢ)(bᵢ+dᵢ)/(nᵢ²(nᵢ−1))
    *
    * (a = A∧success, b = A∧failure, c = B∧success, d = B∧failure).
    * Returns one row `(n, n_strata, sum_a, expected_a, var_a, chi2,
    * or_mh)` — χ² NULL when ΣV = 0; OR NULL when its denominator is 0
    * (no B successes anywhere). Single-member strata contribute to
    * counts and E but 0 to V (the nᵢ−1 guard). NULL strata/arms/
    * outcomes are refused work.
    *
    * Shape: one stratum-keyed count fold (strata-bounded cells), all
    * per-stratum terms scan-side doubles fanned in through
    * [[graft.api.functions.exact_sum]]; bit-identical on any
    * partitioning. */
  def mantelHaenszel(df: DataFrame, strataCols: Seq[String],
      isA: Column, success: Column): DataFrame = {
    import graft.api.{functions => gfn}
    require(strataCols.nonEmpty, "need at least one stratum column")
    val arm = isA.cast("boolean")
    val s = success.cast("boolean")
    val cells = df.where(arm.isNotNull && s.isNotNull &&
        strataCols.map(c => col(c).isNotNull).reduce(_ && _))
      .groupBy(strataCols.map(col): _*)
      .agg(coalesce(sum(when(arm && s, 1L)), lit(0L)).as("__a"),
        coalesce(sum(when(arm && !s, 1L)), lit(0L)).as("__b"),
        coalesce(sum(when(!arm && s, 1L)), lit(0L)).as("__c"),
        coalesce(sum(when(!arm && !s, 1L)), lit(0L)).as("__d"))
    val (a, b) = (col("__a").cast("double"), col("__b").cast("double"))
    val (c, d) = (col("__c").cast("double"), col("__d").cast("double"))
    val n = a + b + c + d
    val e = (a + b) * (a + c) / n
    val v = when(n >= 2,
      (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)))
      .otherwise(lit(0.0))
    val agg = cells.agg(
      coalesce(sum(col("__a") + col("__b") + col("__c") + col("__d")),
        lit(0L)).as("n"),
      count(lit(1)).as("n_strata"),
      coalesce(sum(col("__a")), lit(0L)).as("sum_a"),
      gfn.exact_sum(e).as("expected_a"),
      gfn.exact_sum(v).as("var_a"),
      gfn.exact_sum(a * d / n).as("__ad"),
      gfn.exact_sum(b * c / n).as("__bc"))
    agg.select(col("n"), col("n_strata"), col("sum_a"),
      col("expected_a"), col("var_a"),
      when(col("var_a") > 0,
        (col("sum_a") - col("expected_a"))
          * (col("sum_a") - col("expected_a")) / col("var_a"))
        .as("chi2"),
      when(col("__bc") > 0, col("__ad") / col("__bc")).as("or_mh"))
  }

  /** Benjamini–Hochberg step-up FDR adjustment over a column of
    * p-values — the correction a drift DASHBOARD needs once it runs
    * [[Drift.ksTest]]/[[Drift.mannWhitney]] per feature × per slice
    * and starts believing its smallest p of 500: adds `outCol` with
    * `p_adj = min_{q ≥ p} (q · n / rank(q))` clipped to 1, where rank
    * is the largest position of the tied value (ties share one
    * adjusted value, the standard step-up behavior). Rows with NULL p
    * pass through with NULL adjusted.
    *
    * Shape: distinct-p cells (the KS cell-frame recipe — p-values from
    * continuous statistics are near-unique, so the frame may be
    * corpus-sized and everything runs distributed): ranks from
    * [[Packing.withPrefixSumsLong]], the step-up running minimum from
    * [[Packing.withSuffixMinDouble]] (two-level suffix-min — min is
    * order-free, so this is bit-exact at any parallelism), then one
    * join back on p. */
  def bhAdjust(df: DataFrame, pCol: Column,
      outCol: String = "p_adj"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a column named $outCol")
    val p = pCol.cast("double")
    val withP = df.withColumn("__p", p)
    val cells = withP.where(col("__p").isNotNull)
      .groupBy(col("__p")).agg(count(lit(1)).as("__f"))
    val ranked = Packing.withPrefixSumsLong(cells, Seq("__p"),
        sums = Seq("__f" -> "__r"), totals = Seq("__f" -> "__n"))
      .withColumn("__raw",
        col("__p") * col("__n").cast("double") / col("__r").cast("double"))
    val adjusted = Packing.withSuffixMinDouble(ranked, Seq("__p"),
        "__raw", "__sm")
      .select(col("__p"), least(lit(1.0), col("__sm")).as(outCol))
    withP.join(adjusted, Seq("__p"), "left").drop("__p")
  }

  /** Shared complete-block design check for [[cochranQ]] /
    * [[friedmanTest]]: every item must carry EXACTLY one row per
    * system — a missing (item, system) cell silently biases both
    * statistics, so it is refused work loudly. Returns (n_items, k). */
  private def checkCompleteBlocks(cells: DataFrame): (Long, Long) = {
    val d = cells.agg(count(lit(1)).as("rows"),
      countDistinct(col("__i")).as("items"),
      countDistinct(col("__s")).as("systems"),
      countDistinct(col("__i"), col("__s")).as("pairs")).collect()(0)
    val (rows, items, systems, pairs) =
      (d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3))
    require(rows == pairs,
      s"duplicate (item, system) rows: $rows rows over $pairs pairs")
    require(pairs == items * systems,
      s"incomplete block design: $pairs of ${items * systems} " +
        "(item, system) cells present")
    (items, systems)
  }

  /** Cochran's Q test (Cochran 1950) — [[mcnemar]]'s k-system
    * generalization over a COMPLETE paired design: "do these k model
    * variants pass the same eval items, or does one genuinely differ?"
    * Input is one row per (item, system) with a binary outcome;
    * incomplete designs and duplicate cells fail fast.
    *
    *   Q = k(k−1) Σ_j (C_j − N/k)² / (k·Σᵢ Rᵢ − Σᵢ Rᵢ²)
    *
    * (C_j = system j's passes, Rᵢ = item i's passes, N = ΣRᵢ). Under
    * H₀, Q ~ χ²(k−1). Returns one row `(n_items, k, q)` — Q NULL when
    * every item is all-pass or all-fail (denominator 0: no
    * discriminating items). NULL cells are refused work.
    *
    * Shape: one per-item fold (R moments), one k-bounded per-system
    * fold, terms via exact_sum. */
  def cochranQ(df: DataFrame, itemCol: Column, systemCol: Column,
      okCol: Column): DataFrame = {
    import graft.api.{functions => gfn}
    val okB = okCol.cast("boolean")
    val cells = df.where(itemCol.isNotNull && systemCol.isNotNull &&
        okB.isNotNull)
      .select(itemCol.as("__i"), systemCol.as("__s"),
        okB.cast("long").as("__ok"))
      .localCheckpoint(eager = false)
    val (items, k) = checkCompleteBlocks(cells)
    val perItem = cells.groupBy(col("__i"))
      .agg(sum(col("__ok")).as("__r"))
      .agg(coalesce(sum(col("__r")), lit(0L)).as("__sr"),
        coalesce(sum(col("__r") * col("__r")), lit(0L)).as("__sr2"))
      .collect()(0)
    val (srTot, sr2) = (perItem.getLong(0), perItem.getLong(1))
    val perSys = cells.groupBy(col("__s"))
      .agg(sum(col("__ok")).as("__c"))
    val kD = k.toDouble
    val mean = srTot.toDouble / kD
    val num = perSys.agg(gfn.exact_sum(
      (col("__c").cast("double") - mean)
        * (col("__c").cast("double") - mean)).as("__sq"))
    val den = kD * srTot - sr2.toDouble
    num.select(lit(items).as("n_items"), lit(k).as("k"),
      when(lit(den) > 0, lit(kD * (kD - 1)) * col("__sq") / lit(den))
        .as("q"))
  }

  /** Friedman test (Friedman 1937; the tie-corrected rank-sum form)
    * over a COMPLETE paired design — the k-system model comparison on
    * ORDINAL/continuous scores: each item ranks its k systems
    * (midranks on ties), then
    *
    *   χ²_F = (k−1) · Σ_j (R_j − n(k+1)/2)²
    *            / (Σᵢⱼ r²ᵢⱼ − n·k(k+1)²/4)
    *
    * (tie-free this reduces to the classic 12/(nk(k+1)) form), plus
    * Kendall's W = χ²_F / (n(k−1)) — the [0, 1] agreement effect
    * size. Returns one row `(n_items, k, chi2, w)` — NULL when every
    * item ties all systems (denominator 0). Incomplete designs fail
    * fast; NULL scores are refused work.
    *
    * Shape: per-item midranks from a window PARTITIONED BY ITEM (the
    * frame is k rows — bounded by design, never corpus-sized), one
    * k-bounded per-system fold, exact_sum fan-in. Ranks are kept as
    * 2·midrank LONGs (the [[Drift.mannWhitney]] convention), floats
    * only in the one-row assembly. */
  def friedmanTest(df: DataFrame, itemCol: Column, systemCol: Column,
      scoreCol: Column): DataFrame = {
    import graft.api.{functions => gfn}
    val v = scoreCol.cast("double")
    val cells = df.where(itemCol.isNotNull && systemCol.isNotNull &&
        v.isNotNull)
      .select(itemCol.as("__i"), systemCol.as("__s"), v.as("__v"))
      .localCheckpoint(eager = false)
    val (items, k) = checkCompleteBlocks(cells)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__i")).orderBy(col("__v"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__i"), col("__v"))
    // 2·midrank = 2·rank + (f − 1) where rank is the min rank of the
    // tie run — integral, deterministic
    val ranked = cells
      .withColumn("__mr2", lit(2) * rank().over(wRank)
        + count(lit(1)).over(wTie) - 1)
    val perSys = ranked.groupBy(col("__s"))
      .agg(sum(col("__mr2")).as("__r2j"),
        sum(col("__mr2").cast("decimal(38,0)") * col("__mr2"))
          .as("__q4j"))
    val (nD, kD) = (items.toDouble, k.toDouble)
    val center = nD * (kD + 1) // == 2·n(k+1)/2, the 2·midrank center
    val agg = perSys.agg(
      gfn.exact_sum((col("__r2j").cast("double") - center)
        * (col("__r2j").cast("double") - center)).as("__num4"),
      gfn.exact_sum(col("__q4j").cast("double")).as("__ss4"))
    // numerator and Σr² both carry the 4× of the doubled ranks — the
    // ratio cancels it
    val den = col("__ss4") - lit(nD * kD * (kD + 1) * (kD + 1))
    val chi2 = when(den > 0, lit(kD - 1) * col("__num4") / den)
    agg.select(lit(items).as("n_items"), lit(k).as("k"),
      chi2.as("chi2"),
      when(den > 0, chi2 / lit(nD * (kD - 1))).as("w"))
  }

  /** Empirical-Bayes shrinkage of per-group rates (beta-binomial,
    * method of moments) — the fix for the oldest dashboard lie: a
    * 3-document source showing "67% dup rate" sorting above a
    * 30k-document source at 12%. Fit one Beta(α, β) prior to the
    * observed per-group rates and report the posterior mean,
    *
    *   shrunk_g = (k_g + α) / (n_g + α + β)
    *
    * which pulls small-n groups toward the grand rate and leaves
    * big-n groups alone. The prior is method-of-moments on the
    * UNWEIGHTED group rates (each slice is one draw of the prior —
    * the convention for "how do sources vary"; document-weighting
    * would let one giant source define the prior):
    *
    *   ν = (m̄(1−m̄) − s²·(1/G)Σ1/n_g... ) — operationally:
    *   α+β = m̄(1−m̄)/s²_adj − 1, with s²_adj the between-group
    *   variance of rates minus the mean binomial sampling noise
    *   (1/G)Σ m̄(1−m̄)/n_g; a non-positive s²_adj (groups LESS
    *   dispersed than binomial noise) degenerates to complete pooling
    *   at ν = `nuMax`.
    *
    * Returns one row per group `(groupCols…, n, k, raw, shrunk,
    * alpha, beta)` — raw NULL when n = 0 never occurs (empty groups
    * do not exist post-groupBy). NULL outcomes are refused work;
    * needs ≥ 2 groups (one group has no between-slice evidence).
    *
    * Shape: ONE count fold per group, a G-bounded second fold for the
    * moments (G = slices, small), prior scalars broadcast back as
    * literals. */
  def ebShrinkRates(df: DataFrame, groupCols: Seq[String],
      successCol: Column, nuMax: Double = 10000.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(nuMax > 0, "nuMax must be > 0")
    val s = successCol.cast("boolean")
    val byG = df.where(s.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(s.cast("long")).as("k"))
      .localCheckpoint(eager = false)
    val p = col("k").cast("double") / col("n").cast("double")
    val mom = byG.agg(count(lit(1)).as("g"),
      gf2.exact_sum(p).as("m1"), gf2.exact_sum(p * p).as("m2"),
      gf2.exact_sum(lit(1.0) / col("n").cast("double")).as("hinv"))
      .collect()(0)
    val g = mom.getLong(0)
    require(g >= 2, "need at least 2 groups to fit a between-slice prior")
    val m = mom.getDouble(1) / g
    val v = mom.getDouble(2) / g - m * m
    val noise = m * (1 - m) * mom.getDouble(3) / g
    val vAdj = v - noise
    val nu =
      if (m <= 0.0 || m >= 1.0) nuMax // degenerate all-0/all-1 panel
      else if (vAdj > 0) math.min(nuMax,
        math.max(1e-6, m * (1 - m) / vAdj - 1))
      else nuMax
    val (alpha, beta) = (m * nu, (1 - m) * nu)
    byG.select(groupCols.map(col) ++ Seq(col("n"), col("k"),
      p.as("raw"),
      ((col("k") + lit(alpha))
        / (col("n") + lit(alpha + beta))).as("shrunk"),
      lit(alpha).as("alpha"), lit(beta).as("beta")): _*)
  }

  private def gf2 = graft.api.functions

  /** Covariate balance table (standardized mean differences) — the
    * pre-flight check every weighted/matched comparison needs: before
    * trusting [[postStratify]] or a propensity-style reweighting,
    * VERIFY the arms actually look alike on the covariates,
    * unweighted and weighted. Per covariate:
    *
    *   SMD = (x̄_T − x̄_C) / √((s²_T + s²_C)/2)
    *
    * (Cohen's d with the two-arm pooled-SD convention; |SMD| < 0.1 is
    * the usual "balanced" rule of thumb). Weighted moments use the
    * population convention s²_w = Σw(x−x̄_w)²/Σw (the reweighting
    * estimand's own scale). Returns one row per covariate:
    * `(covariate, n_t, n_c, mean_t, mean_c, smd, wmean_t, wmean_c,
    * wsmd)` — smd NULL when a pooled variance vanishes; rows with
    * NULL treat/value/weight or weight ≤ 0 are refused work per
    * covariate.
    *
    * Shape: ONE scan — rows explode onto the (small, literal)
    * covariate list and fold per (covariate, arm) with exact_sum
    * moments; everything after is covariate-bounded arithmetic. */
  def balanceTable(df: DataFrame, treatCol: Column,
      covariates: Seq[(String, Column)],
      weightCol: Column = lit(1.0)): DataFrame = {
    import graft.api.{functions => gfn}
    require(covariates.nonEmpty, "need at least one covariate")
    require(covariates.map(_._1).distinct.length == covariates.length,
      "duplicate covariate names")
    val tr = treatCol.cast("boolean")
    val w = weightCol.cast("double")
    val pairs = array(covariates.map { case (nm, c) =>
      struct(lit(nm).as("cv"), c.cast("double").as("x")) }: _*)
    val rows = df.where(tr.isNotNull && w.isNotNull && w > 0)
      .select(tr.as("__t"), w.as("__w"), explode(pairs).as("__p"))
      .select(col("__t"), col("__w"), col("__p.cv").as("cv"),
        col("__p.x").as("__x"))
      .where(col("__x").isNotNull)
    val byArm = rows.groupBy(col("cv"), col("__t")).agg(
      count(lit(1)).as("__n"),
      gfn.exact_sum(col("__x")).as("__s"),
      gfn.exact_sum(col("__x") * col("__x")).as("__q"),
      gfn.exact_sum(col("__w")).as("__sw"),
      gfn.exact_sum(col("__w") * col("__x")).as("__swx"),
      gfn.exact_sum(col("__w") * col("__x") * col("__x")).as("__swxx"))
    def side(t: Boolean, c: String): Column =
      first(when(col("__t") === t, col(c)), ignoreNulls = true)
    val piv = byArm.groupBy(col("cv")).agg(
      coalesce(side(true, "__n"), lit(0L)).as("n_t"),
      coalesce(side(false, "__n"), lit(0L)).as("n_c"),
      side(true, "__s").as("__st"), side(false, "__s").as("__sc"),
      side(true, "__q").as("__qt"), side(false, "__q").as("__qc"),
      side(true, "__sw").as("__swt"), side(false, "__sw").as("__swc"),
      side(true, "__swx").as("__swxt"),
      side(false, "__swx").as("__swxc"),
      side(true, "__swxx").as("__swxxt"),
      side(false, "__swxx").as("__swxxc"))
    val (nt, nc) = (col("n_t").cast("double"), col("n_c").cast("double"))
    val mT = when(col("n_t") > 0, col("__st") / nt)
    val mC = when(col("n_c") > 0, col("__sc") / nc)
    val vT = when(col("n_t") >= 2,
      (col("__qt") - col("__st") * col("__st") / nt) / (nt - 1))
    val vC = when(col("n_c") >= 2,
      (col("__qc") - col("__sc") * col("__sc") / nc) / (nc - 1))
    val pool = (vT + vC) / 2
    val wmT = when(col("__swt") > 0, col("__swxt") / col("__swt"))
    val wmC = when(col("__swc") > 0, col("__swxc") / col("__swc"))
    val wvT = when(col("__swt") > 0,
      col("__swxxt") / col("__swt") - wmT * wmT)
    val wvC = when(col("__swc") > 0,
      col("__swxxc") / col("__swc") - wmC * wmC)
    val wpool = (wvT + wvC) / 2
    piv.select(col("cv").as("covariate"), col("n_t"), col("n_c"),
      mT.as("mean_t"), mC.as("mean_c"),
      when(pool > 0, (mT - mC) / sqrt(pool)).as("smd"),
      wmT.as("wmean_t"), wmC.as("wmean_c"),
      when(wpool > 0, (wmT - wmC) / sqrt(wpool)).as("wsmd"))
  }

  /** Difference-in-differences on a 2×2 (arm × period) design — the
    * intervention readout when treatment was NOT randomized but both
    * groups are observed before AND after ("we switched half the
    * sources to the new dedup config at week 12"): the control arm's
    * before→after drift nets out shared trends,
    *
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
    *   SE² = Σ_{4 cells} s²/n   (unpooled, Welch-style)
    *
    * Returns one row `(n_tt, n_tc, n_ct, n_cc, mean_t_post,
    * mean_t_pre, mean_c_post, mean_c_pre, did, se, lo95, hi95)` —
    * SE/bounds NULL when any cell has < 2 members (parallel-trends is
    * the caller's burden and is stated here, not assumed away). NULL
    * arm/period/outcome rows are refused work.
    *
    * Shape: ONE fold to four cells of exact_sum moments. */
  def diffInDiff(df: DataFrame, treatCol: Column, postCol: Column,
      yCol: Column): DataFrame = {
    import graft.api.{functions => gfn}
    val tr = treatCol.cast("boolean")
    val po = postCol.cast("boolean")
    val y = yCol.cast("double")
    val base = df.where(tr.isNotNull && po.isNotNull && y.isNotNull)
    def cell(t: Column, suffix: String): Seq[Column] = Seq(
      count(when(t, 1)).as(s"n_$suffix"),
      gfn.exact_sum(when(t, y)).as(s"__s_$suffix"),
      gfn.exact_sum(when(t, y * y)).as(s"__q_$suffix"))
    val cells = cell(tr && po, "tt") ++ cell(tr && !po, "tc") ++
      cell(!tr && po, "ct") ++ cell(!tr && !po, "cc")
    val agg = base.agg(cells.head, cells.tail: _*)
    def m(sfx: String): Column =
      when(col(s"n_$sfx") > 0,
        col(s"__s_$sfx") / col(s"n_$sfx").cast("double"))
    def v(sfx: String): Column = {
      val n = col(s"n_$sfx").cast("double")
      when(col(s"n_$sfx") >= 2,
        (col(s"__q_$sfx") - col(s"__s_$sfx") * col(s"__s_$sfx") / n)
          / (n - 1))
    }
    val did = (m("tt") - m("tc")) - (m("ct") - m("cc"))
    val se2 = v("tt") / col("n_tt").cast("double") +
      v("tc") / col("n_tc").cast("double") +
      v("ct") / col("n_ct").cast("double") +
      v("cc") / col("n_cc").cast("double")
    val se = when(se2.isNotNull, sqrt(se2))
    val zq = 1.959963984540054
    agg.select(col("n_tt"), col("n_tc"), col("n_ct"), col("n_cc"),
      m("tt").as("mean_t_post"), m("tc").as("mean_t_pre"),
      m("ct").as("mean_c_post"), m("cc").as("mean_c_pre"),
      did.as("did"), se.as("se"),
      (did - lit(zq) * se).as("lo95"), (did + lit(zq) * se).as("hi95"))
  }

  /** Page's trend test (Page 1963) — [[friedmanTest]]'s ORDERED
    * alternative over the same complete k-system design: Friedman asks
    * "do the k model variants differ at all?"; Page spends all its
    * power on "do the per-item ranks RISE in the declared system
    * order" (checkpoint 1 < checkpoint 2 < … on eval score). Systems
    * are ordered by their NUMERIC label ascending (the caller encodes
    * the hypothesized order in the label — step index, data fraction,
    * model size):
    *
    *   L = Σ_j c_j·R_j  (c_j = 1..k in label order, R_j = rank sum),
    *   E = n·k(k+1)²/4,  Var = n·k²(k+1)(k²−1)/144,
    *   z = (L − E)/√Var
    *
    * Midranks handle ties (the variance keeps the classic no-ties
    * form — with heavy ties it is conservative; documented, not
    * hidden). Returns one row `(n_items, k, l, e_l, z)` — z NULL when
    * k < 2. Incomplete designs and duplicate cells fail fast
    * ([[cochranQ]]'s contract). NULL cells are refused work.
    *
    * Shape: per-item rank windows (item-bounded partitions, one
    * exchange), one k-bounded per-system fold collected driver-side
    * (k systems ≤ dozens by design); rank sums stay integral as
    * doubled midranks until the final assembly. */
  def pageTrend(df: DataFrame, itemCol: Column, systemCol: Column,
      scoreCol: Column): DataFrame = {
    val v = scoreCol.cast("double")
    val s = systemCol.cast("double")
    val cells = df.where(itemCol.isNotNull && s.isNotNull &&
        v.isNotNull)
      .select(itemCol.as("__i"), s.as("__s"), v.as("__v"))
      .localCheckpoint(eager = false)
    val (items, k) = checkCompleteBlocks(cells)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__i")).orderBy(col("__v"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__i"), col("__v"))
    val ranked = cells
      .withColumn("__mr2", lit(2) * rank().over(wRank)
        + count(lit(1)).over(wTie) - 1)
    val perSys = ranked.groupBy(col("__s"))
      .agg(sum(col("__mr2")).as("__r2j"))
      .orderBy(col("__s")).collect()
      .map(r => r.getLong(r.fieldIndex("__r2j")))
    val l2 = perSys.zipWithIndex
      .map { case (r2, j) => BigInt(j + 1) * BigInt(r2) }.sum
    val (nD, kD) = (items.toDouble, k.toDouble)
    val l = l2.toDouble / 2.0
    val e = nD * kD * (kD + 1) * (kD + 1) / 4.0
    val varL = nD * kD * kD * (kD + 1) * (kD * kD - 1) / 144.0
    oneRowE(df)(lit(items).as("n_items"), lit(k).as("k"),
      lit(l).as("l"), lit(e).as("e_l"),
      (if (varL > 0) lit((l - e) / math.sqrt(varL))
       else lit(null).cast("double")).as("z"))
  }

  private def oneRowE(df: DataFrame)(cols: Column*): DataFrame =
    df.sparkSession.range(1).select(cols: _*)

  /** Holm step-down FWER adjustment — [[bhAdjust]]'s stricter sibling
    * for the "EVERY flagged drift must be real" regime (FDR tolerates
    * a controlled fraction of false flags; familywise control
    * tolerates none): `p_adj = min(1, max_{q ≤ p} q·(n − rank_min(q)
    * + 1))` — the running MAX from the smallest p up, with tied
    * values sharing their run's smallest rank (they receive one
    * common adjusted value, matching the standard step-down). Rows
    * with NULL p pass through NULL.
    *
    * Shape: same distributed recipe as [[bhAdjust]]; the prefix max
    * reuses [[Packing.withSuffixMinDouble]] through the order-and-sign
    * flip (prefix-max over p ascending ≡ −(suffix-min of the negated
    * values over −p ascending)) — still order-free, still bit-exact at
    * any parallelism. */
  def holmAdjust(df: DataFrame, pCol: Column,
      outCol: String = "p_adj"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a column named $outCol")
    val p = pCol.cast("double")
    val withP = df.withColumn("__p", p)
    val cells = withP.where(col("__p").isNotNull)
      .groupBy(col("__p")).agg(count(lit(1)).as("__f"))
    val ranked = Packing.withPrefixSumsLong(cells, Seq("__p"),
        sums = Seq("__f" -> "__cum"), totals = Seq("__f" -> "__n"))
      // smallest rank of the tie run: cum − f + 1
      .withColumn("__raw", col("__p")
        * (col("__n") - (col("__cum") - col("__f") + 1) + 1)
          .cast("double"))
      .withColumn("__np", -col("__p"))
      .withColumn("__nraw", -col("__raw"))
    val adjusted = Packing.withSuffixMinDouble(ranked, Seq("__np"),
        "__nraw", "__nsm")
      .select(col("__p"), least(lit(1.0), -col("__nsm")).as(outCol))
    withP.join(adjusted, Seq("__p"), "left").drop("__p")
  }

  /** Wilson score interval per group — the right uncertainty band for
    * win rates and pass rates at ANY n (unlike the normal
    * approximation, it never leaves [0, 1] and behaves at s = 0 or
    * s = n). For s successes of n trials at critical value z:
    * center = (p̂ + z²/2n) / (1 + z²/n), half-width =
    * z/(1 + z²/n) · √(p̂(1−p̂)/n + z²/4n²). One map-side-combined
    * aggregation to (n, s) per group; everything after is scan-side
    * rational arithmetic plus one IEEE-exact sqrt, so results are
    * bit-stable. NULL outcomes are refused work (dropped from n). */
  def wilsonInterval(df: DataFrame, groupCols: Seq[String],
      successCol: Column, z: Double = 2.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(z > 0, "z must be > 0")
    val ok = successCol.cast("boolean")
    val z2 = z * z
    val agg = df.where(ok.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(ok.cast("long")).as("s"))
    val n = col("n").cast("double")
    val p = col("s").cast("double") / n
    val denom = lit(1.0) + lit(z2) / n
    val center = (p + lit(z2) / (lit(2.0) * n)) / denom
    val half = (lit(z) / denom) *
      sqrt(p * (lit(1.0) - p) / n + lit(z2) / (lit(4.0) * n * n))
    agg.withColumn("p_hat", p)
      .withColumn("lo", greatest(center - half, lit(0.0)))
      .withColumn("hi", least(center + half, lit(1.0)))
  }

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code"): per group (problem) with `n` attempts
    * of which `c` succeed, `pass@k = 1 − C(n−c, k) / C(n, k)` — the
    * probability that a random size-k subset of the attempts contains
    * a success. One row per group per requested k:
    * `(groupCols…, k, n, c, num, den, pass_at_k)` where
    * `num = Π_{i<k}(n−c−i)` and `den = Π_{i<k}(n−i)` are the exact
    * LONG binomial products (num clamps at 0 when c > n−k, i.e.
    * pass@k = 1) and `pass_at_k = 1 − num/den`. k > n rows emit NULLs
    * (the estimator needs at least k attempts).
    *
    * One map-side-combined aggregation to (n, c) per group, then a
    * scan-side explode onto the literal k list — the products fold
    * over `sequence(0, k−1)` inside codegen. Caller contract:
    * `n^max(k)` must fit a LONG (ANSI overflow throws otherwise) —
    * with the usual n ≤ 100, k ≤ 10 this holds with room. */
  def passAtK(df: DataFrame, groupCols: Seq[String],
      successCol: Column, ks: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 64),
      "each k must be in [1, 64]")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(successCol.cast("long")).as("c"))
    val prod = (base: Column) => aggregate(
      sequence(lit(0L), col("k") - 1),
      lit(1L), (acc, i) => acc * greatest(base - i, lit(0L)))
    agg.select(col("*"),
        explode(typedLit(ks.map(_.toLong))).as("k"))
      .withColumn("num",
        when(col("k") <= col("n"), prod(col("n") - col("c"))))
      .withColumn("den",
        when(col("k") <= col("n"), prod(col("n"))))
      .withColumn("pass_at_k",
        lit(1.0) - col("num").cast("double") / col("den"))
  }

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955) — the
    * ORDERED-dose companion to [[twoProportionTest]] and
    * [[graft.ops.Profile.chiSquareGof]]: "does pass rate rise
    * MONOTONICALLY with quality bucket / model size / dedup
    * aggressiveness?" A plain r×2 χ² burns its power on any
    * departure; the trend test spends all of it on the ordered
    * alternative. For categories with numeric scores wᵢ, nᵢ trials
    * and rᵢ successes (N = Σnᵢ, R = Σrᵢ, p̄ = R/N):
    *
    *   T = Σ wᵢ (rᵢ − nᵢ p̄),
    *   Var(T) = p̄(1 − p̄) (Σ wᵢ² nᵢ − (Σ wᵢ nᵢ)²/N),   z = T/√Var
    *
    * Returns one row `(n, k, t, var_t, z)` — z NULL when Var = 0 (all
    * successes, all failures, or a single score level). NULL
    * scores/outcomes are refused work.
    *
    * Shape: one score-keyed count fold (score-bounded cells — doses
    * are a handful of levels), then a one-row assembly whose w-moment
    * sums run through [[graft.api.functions.exact_sum]] —
    * bit-identical on any partitioning. */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
      successCol: Column): DataFrame = {
    import graft.api.{functions => gfn}
    val w = scoreCol.cast("double")
    val s = successCol.cast("boolean")
    val cells = df.where(w.isNotNull && s.isNotNull)
      .groupBy(w.as("__w"))
      .agg(count(lit(1)).as("__ni"), sum(s.cast("long")).as("__ri"))
    val agg = cells.agg(
      coalesce(sum(col("__ni")), lit(0L)).as("n"),
      count(lit(1)).as("k"),
      coalesce(sum(col("__ri")), lit(0L)).as("__r"),
      gfn.exact_sum(col("__w") * col("__ni")).as("__swn"),
      gfn.exact_sum(col("__w") * col("__w") * col("__ni")).as("__sw2n"),
      gfn.exact_sum(col("__w") * col("__ri")).as("__swr"))
    val nD = col("n").cast("double")
    val pBar = when(col("n") > 0, col("__r") / nD)
    val t = col("__swr") - pBar * col("__swn")
    val varT = when(col("n") > 0,
      pBar * (lit(1.0) - pBar)
        * (col("__sw2n") - col("__swn") * col("__swn") / nD))
    agg.select(col("n"), col("k"), t.as("t"), varT.as("var_t"),
      when(varT > 0, t / sqrt(varT)).as("z"))
  }

  /** Fisher's exact test on a 2×2 arm × outcome table — the
    * small-count companion to [[twoProportionTest]]: when a slice has
    * 7 passes out of 12, the normal-approximation z is fiction; the
    * conditional hypergeometric tail is not. One count fold to the
    * four cells (a = A∧success, b = A∧failure, c = B∧success,
    * d = B∧failure), then the exact tails over the support
    * k ∈ [max(0, R₁+C₁−N), min(R₁, C₁)] (R₁ = a+b, C₁ = a+c):
    *
    *   p_less = Σ_{k ≤ a} h(k),  p_greater = Σ_{k ≥ a} h(k),
    *   p_two  = min(1, 2·min(p_less, p_greater))
    *
    * h(k) the hypergeometric pmf. The two-sided rule is tail
    * DOUBLING (documented choice): the alternative point-probability
    * rule compares pmfs at 1e−7 relative tolerance, which an
    * independent engine can flip on the last ulp; doubled tails are
    * reproducible arithmetic. The pmf itself is evaluated by the
    * mode-anchored multiplicative recurrence
    * h(k+1)/h(k) = (R₁−k)(C₁−k) / ((k+1)(N−R₁−C₁+k+1)) with the
    * anchor normalized so Σh = 1 — no lgamma, no cancellation, exact
    * to the last few ulps at any margin size.
    *
    * Returns one row `(a, b, c, d, p_less, p_greater, p_two,
    * odds_ratio)` — odds_ratio = ad/bc, NULL when bc = 0; p-values
    * are 1 when the support is a single point. NULL arms/outcomes are
    * refused work.
    *
    * Shape: ONE fold to four LONGs; the tail sum is a driver-side
    * loop over the support, guarded by `maxSupport` (default 1e6
    * points ≈ ms of driver arithmetic) — Fisher is a SMALL-table
    * test, and past the guard the caller should be on
    * [[twoProportionTest]] / [[mantelHaenszel]], whose approximations
    * are exact-grade at that n. */
  def fisherExact(df: DataFrame, isA: Column, success: Column,
      maxSupport: Long = 1000000L): DataFrame = {
    val arm = isA.cast("boolean")
    val s = success.cast("boolean")
    val r = df.where(arm.isNotNull && s.isNotNull).agg(
      coalesce(sum(when(arm && s, 1L)), lit(0L)),
      coalesce(sum(when(arm && !s, 1L)), lit(0L)),
      coalesce(sum(when(!arm && s, 1L)), lit(0L)),
      coalesce(sum(when(!arm && !s, 1L)), lit(0L))).collect()(0)
    val (a, b, c, d) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (r1, c1, n) = (a + b, a + c, a + b + c + d)
    val lo = math.max(0L, r1 + c1 - n)
    val hi = math.min(r1, c1)
    require(hi - lo <= maxSupport,
      s"Fisher support ${hi - lo} exceeds maxSupport=$maxSupport — " +
        "use twoProportionTest/mantelHaenszel at this scale")
    // un-normalized pmf by recurrence from the mode (ratio crosses 1
    // there), normalized by the running total: no lgamma, no overflow
    // (values are scaled relative to the mode = 1.0)
    val size = (hi - lo + 1).toInt
    val pmf = new Array[Double](size)
    if (size > 0) {
      val ratio = (k: Long) => // h(k+1)/h(k)
        ((r1 - k).toDouble * (c1 - k)) /
          ((k + 1).toDouble * (n - r1 - c1 + k + 1))
      // mode: largest k in support with ratio(k-1) >= 1
      var mode = lo
      while (mode < hi && ratio(mode) >= 1.0) mode += 1
      pmf((mode - lo).toInt) = 1.0
      var k = mode
      while (k < hi) { // upward
        pmf((k + 1 - lo).toInt) = pmf((k - lo).toInt) * ratio(k)
        k += 1
      }
      k = mode
      while (k > lo) { // downward
        pmf((k - 1 - lo).toInt) = pmf((k - lo).toInt) / ratio(k - 1)
        k -= 1
      }
    }
    val total = pmf.sum
    val ai = (a - lo).toInt
    val pLess = pmf.take(ai + 1).sum / total
    val pGreater = pmf.drop(ai).sum / total
    val pTwo = math.min(1.0, 2.0 * math.min(pLess, pGreater))
    val or: java.lang.Double =
      if (b == 0 || c == 0) null
      else (a.toDouble * d) / (b.toDouble * c)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((a, b, c, d, pLess, pGreater, pTwo, Option(or).map(_.toDouble)))
      .toDF("a", "b", "c", "d", "p_less", "p_greater", "p_two",
        "odds_ratio")
  }
}
