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
    gramStream(corpus, textCol, n, Seq.empty)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Exploded n-gram stream: Generate over a position sequence + a
    * codegen'd substr — identical gram multiset to
    * `explode(charGrams(...))`, but the per-row gram ARRAY (built by a
    * CodegenFallback higher-order transform, interpreted per element)
    * is never materialized; docs shorter than n emit nothing either
    * way. The public [[charGrams]] keeps the array form (it IS the
    * product there); this is the hot-path twin (r14 optimization). */
  private def gramStream(df: DataFrame, textCol: String, n: Int,
      keep: Seq[Column]): DataFrame =
    df.where(length(col(textCol)) >= n)
      .select(keep ++ Seq(col(textCol).as("__txt"),
        explode(sequence(lit(1), length(col(textCol)) - (n - 1)))
          .as("__gi")): _*)
      .select(keep :+ col("__txt").substr(col("__gi"), lit(n))
        .as("gram"): _*)

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
    val grams = gramStream(corpus, textCol, n, Seq(col(idCol)))
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
      charNgramCounts(corpus, textCol, n).localCheckpoint(eager = false), n, addK,
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
      .localCheckpoint(eager = false)
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

  // --- interpolated Kneser-Ney (word bigram) -------------------------------

  /** Per-doc word-bigram stream: adjacent (u, w) pairs of the
    * whitespace-token sequence (empties dropped BEFORE pairing, so a run
    * of whitespace doesn't break adjacency). Docs with < 2 words emit
    * nothing. `keep` columns ride along. */
  private def bigramStream(df: DataFrame, textCol: String,
      keep: Seq[Column]): DataFrame =
    df.select(keep :+
        filter(split(col(textCol), "\\s+"), x => length(x) > 0)
          .as("__ws"): _*)
      .where(size(col("__ws")) >= 2)
      .select(keep :+ explode(transform(
        sequence(lit(1), size(col("__ws")) - 1),
        j => struct(element_at(col("__ws"), j).as("u"),
          element_at(col("__ws"), j + 1).as("w")))).as("__b"): _*)
      .select(keep ++ Seq(col("__b.u").as("u"), col("__b.w").as("w")): _*)

  /** A trained interpolated Kneser-Ney bigram model (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated variant) — the standard count-LM
    * smoothing, complementing [[charNgramLogProb]]'s add-k:
    *
    *   p(w|u) = (max(c(u,w) − D, 0) + D · N1+(u,·) · pcont(w)) / c(u)
    *   pcont(w) = (N1+(·,w) + 1) / (N1+(·,·) + V)
    *
    * with fixed discount D, continuation counts N1+ (DISTINCT
    * continuations/contexts — the "how many contexts has w followed"
    * insight), and an unseen context backing off to pcont alone. The +1/+V
    * floor on pcont (V = train word types + 1) is this engine's documented
    * totality convention: every score is finite, even for unseen words.
    *
    * `bigrams` (u, w, cuw), `contexts` (u, cu, n1u), `continuations`
    * (w, n1w) are all bigram-TYPE-bounded tables (≪ corpus); `nbv` =
    * N1+(·,·) + V. */
  case class KneserNeyModel(bigrams: DataFrame, contexts: DataFrame,
      continuations: DataFrame, nbv: Long, discount: Double)

  /** Train the KN model: one bigram-type count pass over the corpus;
    * contexts/continuations re-aggregate the TYPE table, never the
    * corpus. */
  def kneserNeyTrain(train: DataFrame, textCol: String,
      discount: Double = 0.75): KneserNeyModel = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val bt = bigramStream(train, textCol, Seq.empty)
      .groupBy("u", "w").agg(count(lit(1)).as("cuw"))
      .localCheckpoint(eager = false)
    val ctx = bt.groupBy("u")
      .agg(sum("cuw").as("cu"), count(lit(1)).as("n1u"))
    val cont = bt.groupBy("w").agg(count(lit(1)).as("n1w"))
    val nb = bt.count()
    val v = train
      .select(explode(split(col(textCol), "\\s+")).as("x"))
      .where(length(col("x")) > 0)
      .agg(count_distinct(col("x"))).head.getLong(0) + 1L
    KneserNeyModel(bt, ctx, cont, nb + v, discount)
  }

  /** Score documents under a KN model: (idCol, n_bigrams, avg_logp) —
    * per-doc mean ln p(w|u) over the doc's bigram stream, rounded to 6
    * (the grain that absorbs cross-engine sum-order drift, q83's
    * convention). Docs with < 2 words are absent.
    *
    * Scale shape: the corpus bigram stream joins the three type-bounded
    * model tables by (u,w)/(u)/(w) — broadcast-able at fixture scale,
    * plain hash joins at web scale where the bigram-type table itself is
    * huge; the corpus never shuffles except the final per-doc regroup.
    * The probability is ONE division deep (numerator folded first), so
    * the oracle's identical IEEE expression reproduces every bit before
    * the ln. */
  def kneserNeyScore(corpus: DataFrame, idCol: String, textCol: String,
      m: KneserNeyModel): DataFrame = {
    val d = m.discount
    val pcont = (coalesce(col("n1w"), lit(0L)) + 1L).cast("double") /
      lit(m.nbv.toDouble)
    val p = when(col("cu").isNotNull,
      (greatest(coalesce(col("cuw"), lit(0L)).cast("double") - d,
        lit(0.0)) + lit(d) * col("n1u").cast("double") * pcont) /
        col("cu").cast("double"))
      .otherwise(pcont)
    bigramStream(corpus, textCol, Seq(col(idCol)))
      .join(m.bigrams, Seq("u", "w"), "left")
      .join(m.contexts, Seq("u"), "left")
      .join(m.continuations, Seq("w"), "left")
      .select(col(idCol), log(p).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("avg_logp"))
  }
}
