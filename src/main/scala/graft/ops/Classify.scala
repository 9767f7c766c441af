package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the quality/domain/language
  * classifier pattern of corpus curation, built entirely from exact count
  * aggregation, so training is ONE corpus pass, the model is a pair of
  * vocabulary-sized frames, and both training and inference are
  * deterministic (bit-reproducible in an external engine, unlike SGD).
  *
  * score(doc, c) = ln P(c) + Σ_tokens ln((cnt(c,t)+k) / (tot(c)+k·V))
  * with add-k smoothing over the training vocabulary V.
  *
  * Scale shape: the model broadcasts (vocab × labels counts); scoring
  * explodes doc tokens once, cross-joins the (tiny) label list, and
  * aggregates per (doc, label) — the corpus never shuffles anything wider
  * than (id, label, partial-sum) rows.
  */
object Classify {

  /** The trained model: per-(label, term) token counts and per-label
    * document counts (for priors). */
  case class NbModel(termCounts: DataFrame, labelDocs: DataFrame)

  /** One-pass training on labeled documents. */
  def nbTrain(docs: DataFrame, labelCol: String, textCol: String): NbModel = {
    val toks = docs.select(col(labelCol).as("label"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    NbModel(
      toks.groupBy("label", "term").agg(count(lit(1)).as("cnt")),
      docs.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("n_docs")))
  }

  /** Per-(doc, label) log-posterior scores (unnormalized). Documents with
    * zero tokens produce no rows. */
  def nbScores(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, addK: Double = 0.5): DataFrame = {
    require(addK > 0, "addK must be > 0")
    val tot = model.termCounts.groupBy("label").agg(sum("cnt").as("tot"))
    val vocab = model.termCounts.agg(
      countDistinct(col("term")).as("v"))
    val nd = model.labelDocs.agg(sum("n_docs").as("n"))
    val toks = docs.select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tokSum = toks
      .crossJoin(broadcast(model.labelDocs.select("label")))
      .join(broadcast(model.termCounts), Seq("term", "label"), "left")
      .join(broadcast(tot), Seq("label"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol), col("label"))
      .agg(sum(log((coalesce(col("cnt"), lit(0L)) + addK) /
        (col("tot") + lit(addK) * col("v")))).as("__tok_lp"))
    tokSum
      .join(broadcast(model.labelDocs), Seq("label"))
      .crossJoin(broadcast(nd))
      .select(col(idCol), col("label"),
        (log(col("n_docs").cast("double") / col("n")) + col("__tok_lp"))
          .as("logp"))
  }

  /** Most-likely label per document: rank by score rounded to `roundTo`
    * (engine-reproducible), ties to the lexicographically smallest label.
    * Returns (idCol, label, logp). */
  def nbPredict(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, addK: Double = 0.5, roundTo: Int = 6): DataFrame = {
    val w = Window.partitionBy(idCol)
      .orderBy(round(col("logp"), roundTo).desc, col("label"))
    nbScores(docs, idCol, textCol, model, addK)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("label"), round(col("logp"), roundTo).as("logp"))
  }

  /** Distributed logistic regression by full-batch gradient descent — the
    * linear quality-classifier complement to Naive Bayes (numeric features
    * instead of token counts: length, entropy, stopword ratio, LM score…).
    *
    * Each iteration is ONE map-side-combined aggregation producing d+1
    * gradient components; the driver holds only the (tiny) weight vector.
    * No per-row state, no shuffle keyed by data — the aggregation tree is
    * the whole communication pattern, so an iteration costs a corpus scan
    * regardless of cluster width.
    *
    * Gradients use `exact_sum` (correctly-rounded Shewchuk accumulation),
    * making every iteration — and therefore the final weights —
    * independent of partitioning and task order: full-batch GD with exact
    * sums is bit-reproducible where SGD fundamentally is not, and an
    * external engine replaying the same float ops sequentially lands
    * within an ulp per iteration.
    *
    * Update (mean gradient, no regularization):
    *   p_i = 1/(1+exp(−(w·x_i)));  g = Σ_i (p_i − y_i)·x_i / n;
    *   w ← w − lr·g          (x_i has an implicit leading 1 = intercept)
    *
    * @return weights of length features.size + 1: (intercept, w_1, …) —
    *         all-zero when the input has no rows (n = 0).
    */
  def logisticFit(df: DataFrame, features: Seq[Column], label: Column,
      iterations: Int, lr: Double): Array[Double] = {
    require(features.nonEmpty, "need at least one feature")
    require(iterations >= 0, "iterations must be >= 0")
    require(lr > 0.0, "lr must be > 0")
    import graft.api.{functions => gf}
    val d = features.size
    // project once: y plus x1..xd, NULL-feature/label rows excluded so a
    // sparse bad row cannot poison the whole gradient with NULL
    val cols = when(label, 1.0).when(!label, 0.0).as("__y") +:
      features.zipWithIndex.map { case (f, j) => f.cast("double").as(s"__x$j") }
    // materialize the (y, x…) projection ONCE: every iteration re-reads
    // these d+1 doubles per row instead of re-running the upstream plan —
    // decisive when features are derived (hashed n-gram histograms cost
    // far more to recompute than to store; q157 measured 11 s → 2 s).
    // The null filter goes ABOVE the checkpoint: filtering the projection
    // directly makes Catalyst alias-substitute every `__x IS NOT NULL`
    // into a fresh copy of the feature expression — each feature computed
    // twice-plus before materialization (measured 119 s vs 19 s for the
    // same d=64 projection at 2M rows)
    val proj = df.select(cols: _*).localCheckpoint(true)
    val base = proj.where(col("__y").isNotNull &&
      (0 until d).map(j => col(s"__x$j").isNotNull).reduce(_ && _))
    val n = base.count().toDouble
    val w = new Array[Double](d + 1)
    if (n == 0) { CheckpointUtil.freeCheckpoint(proj); return w }
    var it = 0
    while (it < iterations) {
      // weights enter as ONE array literal: array literals reach the
      // generated code through the references table, so the source text —
      // and therefore the Janino compilation — is identical across
      // iterations. Inlined scalar lit()s changed the source every round
      // and recompiled the d-term expression per iteration (measured 157 s
      // → 44 s for d=64 × 5 iterations at 2M rows). Same doubles, same
      // association order — results are bit-identical.
      val warr = typedLit(w.toSeq)
      val z = (0 until d).foldLeft(element_at(warr, 1)) { (acc, j) =>
        acc + element_at(warr, j + 2) * col(s"__x$j") }
      val resid = (lit(1.0) / (lit(1.0) + exp(-z)) - col("__y")).as("__r")
      // the whole gradient folds through ONE vec_exact_sum buffer per
      // partition instead of d+1 separate aggregates — bit-identical
      // components (each is still correctly rounded), far less aggregate
      // plumbing per row at wide d
      val gvec = array(col("__r") +:
        (0 until d).map(j => col("__r") * col(s"__x$j")): _*)
      // build the gradient array in a codegen'd PROJECTION so the
      // aggregate's child is a bare attribute — TypedImperativeAggregate
      // evaluates its child interpreted per row, which at wide d would
      // otherwise dominate the iteration
      val sums = base.select(resid +: (0 until d).map(j => col(s"__x$j")): _*)
        .select(gvec.as("__g"))
        .agg(gf.vec_exact_sum(col("__g")).as("g"))
        .head().getSeq[Double](0)
      var j = 0
      while (j <= d) {
        w(j) = w(j) - lr * (sums(j) / n)
        j += 1
      }
      it += 1
    }
    CheckpointUtil.freeCheckpoint(proj)
    w
  }

  /** σ(w·x) under [[logisticFit]] weights — the score column for
    * threshold-gating ([[Eval.prAtThresholds]]) or AUC ([[Eval.auc]]). */
  def logisticScore(features: Seq[Column], weights: Array[Double]): Column = {
    require(weights.length == features.size + 1,
      s"got ${weights.length} weights for ${features.size} features")
    val z = features.zipWithIndex.foldLeft(lit(weights(0))) { case (acc, (f, j)) =>
      acc + lit(weights(j + 1)) * f.cast("double") }
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
