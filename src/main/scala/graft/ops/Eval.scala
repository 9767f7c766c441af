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
}
