package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.{functions => gf}

/** Benchmark decontamination: remove training documents that overlap an
  * evaluation/benchmark set, the standard hygiene pass before LLM training
  * (n-gram collision test as in GPT-3 appendix C / PaLM §B).
  *
  * Contamination test: a training doc is contaminated when it shares at
  * least `minShared` distinct `windowTokens`-token runs with ANY benchmark
  * document. Spans are the same 64-bit rolling token-window hashes used by
  * exact-span dedup ([[Dedup.spanPairs]]), so the collision argument (64-bit
  * hash over token boundaries) carries over unchanged.
  *
  * Scale shape: the benchmark side is an eval set — thousands of documents,
  * KB–MB of distinct span hashes — so its distinct-gram set is broadcast
  * and the 100 TB corpus side NEVER shuffles: explode → broadcast-hash
  * semi-probe → per-doc count, all map-side until the final per-doc
  * aggregation (which ships only (id, count) pairs for docs that matched).
  * Set `broadcastBench = false` only if the "benchmark" is itself huge;
  * that path shuffles both sides on the span hash.
  */
object Decontaminate {

  /** Per-contaminated-doc span-overlap counts:
    * (idCol, shared_spans) for corpus docs sharing ≥ `minShared` distinct
    * token windows with the benchmark. Docs with zero overlap are absent.
    */
  def sharedSpans(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, windowTokens: Int = 8, minShared: Long = 1,
      broadcastBench: Boolean = true): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    require(minShared >= 1, "minShared must be >= 1")
    require(!corpus.columns.contains("__g"),
      "corpus may not contain reserved column __g")
    val bg0 = bench
      .select(explode(gf.shingle_hashes(col(textCol), windowTokens)).as("__g"))
      .distinct()
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    corpus
      .select(col(idCol), explode(
        gf.shingle_hashes(col(textCol), windowTokens)).as("__g"))
      .join(bg, Seq("__g"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("shared_spans"))
      .where(col("shared_spans") >= minShared)
  }

  /** Contamination attribution: (idCol, bench_id, shared_spans) — which
    * benchmark document each contaminated training doc overlaps, and by how
    * many distinct spans. Same broadcast shape as [[sharedSpans]] (the
    * (bench_id, gram) table is still eval-set-sized); the corpus side
    * shuffles only the matched (corpus_id, bench_id) pairs. */
  def overlapPairs(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, windowTokens: Int = 8, minShared: Long = 1,
      broadcastBench: Boolean = true): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    require(minShared >= 1, "minShared must be >= 1")
    require(!corpus.columns.exists(Set("__g", "bench_id")),
      "corpus may not contain reserved columns __g, bench_id")
    val bg0 = bench.select(col(idCol).as("bench_id"), explode(
      gf.shingle_hashes(col(textCol), windowTokens)).as("__g"))
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    corpus
      .select(col(idCol), explode(
        gf.shingle_hashes(col(textCol), windowTokens)).as("__g"))
      .join(bg, Seq("__g"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("shared_spans"))
      .where(col("shared_spans") >= minShared)
  }

  /** The corpus minus contaminated documents (anti-join on the flag set) —
    * the actual decontamination pass. Column set is preserved. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, windowTokens: Int = 8, minShared: Long = 1,
      broadcastBench: Boolean = true): DataFrame = {
    val flagged = sharedSpans(corpus, bench, idCol, textCol, windowTokens,
      minShared, broadcastBench).select(idCol)
    corpus.join(broadcastMaybe(flagged, broadcastBench), Seq(idCol),
      "left_anti")
  }

  // the flag set is bounded by the benchmark's reach — tiny next to the
  // corpus — so the anti-join broadcasts whenever the gram set did
  private def broadcastMaybe(df: DataFrame, b: Boolean): DataFrame =
    if (b) broadcast(df) else df

  /** Per-document novelty against a reference corpus: the fraction of the
    * doc's DISTINCT `windowTokens`-token windows found nowhere in `ref` —
    * the curation signal for "is this shard new material or a rehash"
    * (and, inverted, a memorization-risk score against an already-trained
    * corpus). Output: (idCol, total_grams, seen_grams, novelty) for EVERY
    * corpus doc — zero-overlap docs score 1.0, docs too short to form a
    * single window have total_grams = 0 and NULL novelty.
    *
    * Same 64-bit rolling window hashes and scale shape as [[sharedSpans]]:
    * the reference's distinct-gram set broadcasts (or both sides shuffle
    * on the gram when `broadcastRef = false`), the corpus side is
    * explode → probe → per-doc count with map-side partials — the corpus
    * never shuffles its text. Novelty is one IEEE division of exact
    * counts, so scores are engine- and partitioning-exact. */
  def noveltyScores(corpus: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, windowTokens: Int = 8,
      broadcastRef: Boolean = true): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    require(!corpus.columns.exists(Set("__g", "__hit")),
      "corpus may not contain reserved columns __g, __hit")
    val rg0 = ref
      .select(explode(gf.shingle_hashes(col(textCol), windowTokens)).as("__g"))
      .distinct().withColumn("__hit", lit(1))
    val rg = if (broadcastRef) broadcast(rg0) else rg0
    corpus
      .select(col(idCol), explode_outer(array_distinct(
        gf.shingle_hashes(col(textCol), windowTokens))).as("__g"))
      .join(rg, Seq("__g"), "left")
      .groupBy(idCol)
      .agg(count(col("__g")).as("total_grams"),
        count(col("__hit")).as("seen_grams"))
      .withColumn("novelty", when(col("total_grams") > 0,
        lit(1.0) - col("seen_grams").cast("double") / col("total_grams")))
  }
}
