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
}
