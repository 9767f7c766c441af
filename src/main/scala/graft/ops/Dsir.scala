package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Data Selection via Importance Resampling (DSIR-style) — pick the raw
  * documents that look most like a small in-domain target corpus.
  *
  * The published recipe (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"): fit two hashed n-gram bag-of-words
  * models — one on the target corpus, one on the raw pool — and weight
  * every raw document by its log importance ratio
  *
  *   score(d) = (1/|grams(d)|) · Σ_{g ∈ grams(d)}
  *                (log θ_target[h(g)] − log θ_raw[h(g)])
  *
  * (the 1/|grams| mean removes document-length bias). Positive scores mark
  * documents more probable under the target model; selection keeps the
  * top-k (the deterministic MAP variant of the paper's Gumbel resampling —
  * no RNG, so selection is a pure function of the corpora).
  *
  * Grams are whitespace-token unigrams + bigrams through the engine's own
  * shingle pipeline ([[graft.expr.TextKernels.shingleHashesPos]] — order
  * and duplicates preserved: these are COUNTS, not sets), folded into
  * `buckets` hash buckets. The hashing-trick collision is part of the
  * method: the model is over buckets, not grams.
  *
  * Scale: both models are B-row bucket tables built with ONE
  * bucket-keyed count shuffle per corpus (map-side partial counts); the
  * log-ratio table is B rows and BROADCASTS to the scoring scan, so
  * scoring ships only (id, bucket) pairs into an id-keyed exact_sum — the
  * corpus text never shuffles. exact_sum keeps every score bit-identical
  * across partitionings; top-k selection is a TakeOrdered (no global
  * sort materialization).
  */
object Dsir {

  /** Hash-bucket stream of a document's unigram+bigram shingles: long
    * array column, one entry per gram occurrence (multiset semantics).
    * Bucket = (hash >>> 1) mod `buckets` — the logical shift drops the
    * sign bit so the mod agrees across signed/unsigned engines. */
  def gramBuckets(text: Column, buckets: Int,
      bigrams: Boolean = true): Column = {
    require(buckets >= 2, "buckets must be >= 2")
    val uni = gf.shingle_hashes_pos(text, 1)
    val arr = if (bigrams) concat(uni, gf.shingle_hashes_pos(text, 2)) else uni
    transform(arr, h => pmod(shiftrightunsigned(h, 1), lit(buckets.toLong)))
  }

  /** (bucket, cnt) gram-occurrence counts of a corpus — the sufficient
    * statistic of its hashed n-gram model. One scan, one bucket-keyed
    * count shuffle (≤ `buckets` result rows). */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
      bigrams: Boolean = true): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(gramBuckets(col(textCol), buckets, bigrams))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** B-row model table: per bucket, log θ_target − log θ_raw with
    * add-alpha smoothing (θ[b] = (c_b + α)/(Σc + αB)). Buckets unseen in
    * BOTH corpora are omitted — no document references them.
    *
    * Choose α small relative to gram-mass/buckets: the SIGN of a score is
    * only meaningful when corpus grams ≫ αB (at web scale any α ≤ 1
    * qualifies; on toy corpora the αB smoothing mass otherwise drowns the
    * counts and pushes every score toward −log(T_t/T_r)). */
  def logRatioTable(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int, alpha: Double = 0.5,
      bigrams: Boolean = true): DataFrame =
    logRatioModel(raw, target, textCol, buckets, alpha, bigrams)._1

  /** [[logRatioTable]] plus the SMOOTHED-FLOOR log-ratio — the score a
    * bucket unseen in both fit corpora would take under the same add-α
    * model: log(α/(T_t+αB)) − log(α/(T_r+αB)). Pass it as
    * [[importanceWeights]]'s `missingLogRatio` when the scored pool is
    * not a subset of the fit pool, so its novel grams score as
    * maximally-out-of-target rather than being dropped. */
  def logRatioModel(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int, alpha: Double = 0.5,
      bigrams: Boolean = true): (DataFrame, Double) = {
    require(alpha > 0.0, "alpha must be > 0 (unsmoothed logs diverge)")
    val tc = bucketCounts(target, textCol, buckets, bigrams)
      .withColumnRenamed("cnt", "__tc")
    val rc = bucketCounts(raw, textCol, buckets, bigrams)
      .withColumnRenamed("cnt", "__rc")
    // two scalar totals; integer counts, so driver-side is deterministic
    val tTot = tc.agg(coalesce(sum("__tc"), lit(0L)))
      .collect()(0).getLong(0).toDouble
    val rTot = rc.agg(coalesce(sum("__rc"), lit(0L)))
      .collect()(0).getLong(0).toDouble
    val aB = alpha * buckets
    val table = tc.join(rc, Seq("bucket"), "full")
      .select(col("bucket"),
        (log((coalesce(col("__tc"), lit(0L)) + alpha) / (tTot + aB)) -
          log((coalesce(col("__rc"), lit(0L)) + alpha) / (rTot + aB)))
          .as("log_ratio"))
    val floor = math.log(alpha / (tTot + aB)) - math.log(alpha / (rTot + aB))
    (table, floor)
  }

  /** Per-document importance scores against a precomputed
    * [[logRatioTable]]: (idCol, n_grams, score). Documents with no grams
    * (empty/null text) score 0 with n_grams 0.
    *
    * Grams whose bucket is absent from `ratios` (possible only when the
    * scored pool is not a subset of the fit pool) are LEFT-joined and
    * scored at `missingLogRatio` — counted in n_grams, not silently
    * dropped (an inner join here undercounted n_grams and biased the
    * mean toward covered buckets). Pass [[logRatioModel]]'s smoothed
    * floor for model-consistent treatment; the 0.0 default is neutral. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, buckets: Int,
      bigrams: Boolean = true, missingLogRatio: Double = 0.0): DataFrame = {
    val grams = raw.select(col(idCol).as("__id"),
      explode(gramBuckets(col(textCol), buckets, bigrams)).as("bucket"))
    val scored = grams.join(broadcast(ratios), Seq("bucket"), "left")
      .groupBy("__id")
      .agg(gf.exact_sum(coalesce(col("log_ratio"), lit(missingLogRatio)))
        .as("__sum"),
        count(lit(1)).as("__ng"))
    raw.select(col(idCol).as("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__ng"), lit(0L)).as("n_grams"),
        coalesce(col("__sum") / col("__ng"), lit(0.0)).as("score"))
  }

  /** End-to-end convenience: fit both models and score the raw pool.
    * Every scored bucket is in the fit pool by construction, but the
    * smoothed floor is threaded through anyway for consistency. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int, alpha: Double,
      bigrams: Boolean): DataFrame = {
    val (table, floor) =
      logRatioModel(raw, target, textCol, buckets, alpha, bigrams)
    importanceWeights(raw, idCol, textCol, table, buckets, bigrams, floor)
  }

  /** Deterministic MAP selection: top `k` documents by (score desc,
    * id asc) — a TakeOrdered, not a global sort. */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights.orderBy(col("score").desc, col(idCol)).limit(k)
}
