package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language-model quality scoring — the CCNet-style
  * statistical filter: train n-gram counts on a (reference) corpus, score
  * every document by its average per-character log-probability, and gate or
  * bucket documents on the score. Self-scoring (train on the corpus being
  * scored) ranks documents by how "typical" their character distribution
  * is; cross-scoring (train on a trusted reference, score a crawl) is the
  * classic quality filter.
  *
  * Everything is plain DataFrame algebra: one explode pass for counts
  * (map-side combinable), broadcast model joins for scoring. No RNG, no
  * driver loops; ln() is the only transcendental and scores round to a
  * grain far coarser than engine libm drift.
  */
object LangModel {

  /** All overlapping character n-grams of `text`, in order (length−n+1 of
    * them; empty array when the text is shorter than n). */
  def charGrams(text: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array())
  }

  /** The trained model: (gram, cnt) counts over the corpus — one explode +
    * one count aggregation (partial aggregation does the heavy lifting;
    * the shuffle carries only distinct grams per partition). The model is
    * vocabulary-bounded (≪ corpus), so score-side joins broadcast it. */
  def charNgramCounts(corpus: DataFrame, textCol: String, n: Int): DataFrame =
    corpus.select(explode(charGrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Score documents under a trained model: per-doc average of
    * ln((cnt(gram)+k) / (ctxTotal+k·V)) over the doc's n-grams, add-k
    * smoothed with alphabet size `vocabSize`. Context totals derive from
    * the model itself (sum of continuations), so held-out scoring needs no
    * second corpus pass; unseen grams/contexts fall back to the smoothing
    * floor. Documents shorter than n characters have no grams and are
    * absent from the output.
    *
    * Returns (idCol, n_grams, avg_logp). The model broadcasts — the scored
    * corpus never shuffles before the per-doc aggregation. */
  def charNgramLogProb(corpus: DataFrame, idCol: String, textCol: String,
      model: DataFrame, n: Int, addK: Double = 0.5,
      vocabSize: Long = 128L): DataFrame = {
    require(addK > 0, "addK must be > 0 (unseen grams need mass)")
    require(vocabSize >= 1, "vocabSize must be >= 1")
    // ONE broadcast probe instead of two: regroup the model by its
    // (n−1)-prefix into (prefix, final-char→cnt map, context total); each
    // exploded corpus gram joins once on its prefix and resolves its own
    // count with a map lookup. Semantics match the former
    // gram-join + prefix-join pair exactly — an unseen gram under a SEEN
    // context still finds the context total (prefix matches, map lookup
    // nulls → 0), and a fully unseen context falls to the smoothing floor.
    val pre = model
      .groupBy(substring(col("gram"), 1, n - 1).as("__ctx"))
      .agg(map_from_entries(collect_list(struct(
          substring(col("gram"), n, 1).as("k"), col("cnt").as("v")))).as("__m"),
        sum("cnt").as("__tot"))
    val grams = corpus.select(col(idCol),
      explode(charGrams(col(textCol), n)).as("gram"))
    grams
      .join(broadcast(pre),
        substring(col("gram"), 1, n - 1) === col("__ctx"), "left")
      .select(col(idCol),
        log((coalesce(element_at(col("__m"),
            substring(col("gram"), n, 1)), lit(0L)) + addK) /
          (coalesce(col("__tot"), lit(0L)) + addK * vocabSize)).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), avg("__lp").as("avg_logp"))
  }

  /** One-shot self-scoring: train on the corpus, score every document
    * against it. The (tiny) model is localCheckpoint'd so its aggregation
    * runs once, not once per scoring consumer. */
  def scoreSelf(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, addK: Double = 0.5, vocabSize: Long = 128L): DataFrame =
    charNgramLogProb(corpus, idCol, textCol,
      charNgramCounts(corpus, textCol, n).localCheckpoint(), n, addK,
      vocabSize)

  /** Held-out per-group perplexity report — the standard quality-filter
    * calibration table: a deterministic 1/holdOutMod hash split holds out
    * eval docs, the model trains on the REST, and each group (language,
    * source, …) gets its doc/gram mass, the doc-weighted mean per-char
    * log-prob, and the POOLED (gram-weighted) perplexity
    * exp(−Σ lp / Σ grams) — the number actually compared across
    * tokenizer/filter configurations (doc-mean hides short-doc skew).
    *
    * Scale shape: one corpus pass for counts, one for scoring (model
    * broadcasts, q83's shape); the split is a pure hash of the id, so
    * train/eval never shuffle. Groups are bounded → the report is a
    * groups-sized aggregate. */
  def heldOutReport(corpus: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String], n: Int = 3, addK: Double = 0.5,
      vocabSize: Long = 128L, holdOutMod: Int = 10): DataFrame = {
    require(holdOutMod >= 2, "holdOutMod must be >= 2")
    require(groupCols.nonEmpty, "need at least one group column")
    val held = pmod(graft.api.functions.hash64(col(idCol)),
      lit(holdOutMod.toLong)) === 0L
    val model = charNgramCounts(corpus.where(!held), textCol, n)
      .localCheckpoint()
    val scored = charNgramLogProb(corpus.where(held), idCol, textCol,
      model, n, addK, vocabSize)
    scored
      .join(corpus.select(col(idCol) +: groupCols.map(col): _*),
        Seq(idCol))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("n_grams"),
        avg(col("avg_logp")).as("mean_logp"),
        (sum(col("avg_logp") * col("n_grams")) / sum(col("n_grams")))
          .as("pooled_logp"))
      .withColumn("pooled_ppl", exp(-col("pooled_logp")))
  }
}
