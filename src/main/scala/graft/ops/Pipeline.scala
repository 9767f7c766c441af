package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** End-to-end corpus preparation: the composition a training-data pipeline
  * actually runs, as one call. Stages (each optional via thresholds):
  *
  *  1. quality filter    — drop docs below `minQuality` (quality_score);
  *  2. exact dedup       — normalized-hash groupBy, keep min-id;
  *  3. near-dup removal  — MinHash+LSH pairs ≥ `jaccardThreshold`,
  *     connected components, keep the min-id doc per cluster.
  *
  * Every stage is deterministic (hash-based, no RNG) and shuffle-lean
  * (see [[Dedup]]); the same call scales from the 500-row fixture to a
  * full corpus.
  */
object Pipeline {

  case class CleanReport(input: Long, afterQuality: Long, afterExact: Long,
      afterNearDup: Long)

  /** Returns (cleaned corpus with a `quality` column, stage-count report). */
  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, jaccardThreshold: Double = 0.8,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32):
      (DataFrame, CleanReport) = {
    // cache the scored frame so the regex-heavy quality pass runs once for
    // both the report counts and the downstream filter
    val scored = docs.withColumn("quality", gf.quality_score(col(textCol))).cache()
    val firstCounts = scored.agg(count(lit(1)),
      count(when(col("quality") >= minQuality, 1))).head()
    val input = firstCounts.getLong(0)
    val afterQuality = firstCounts.getLong(1)
    val kept = scored.where(col("quality") >= minQuality)

    val exact = Dedup.exact(kept, idCol, textCol).cache()

    val pairs = Dedup.minhashPairs(exact, idCol, textCol,
      shingleN, numHashes, bands, jaccardThreshold)
    val comp = Dedup.components(pairs, allIds = Some(exact.select(idCol)))
      .localCheckpoint()
    // component IS the min reachable id at convergence, and comp carries one
    // row per exact-surviving doc — so BOTH report counts come off the
    // checkpointed label frame in one agg (no separate pass over `exact`),
    // and the returned corpus stays lazy: callers that only read the report
    // never pay for the final join
    val cnts = comp.agg(count(lit(1)), countDistinct(col("component"))).head()
    val afterExact = cnts.getLong(0)
    val afterNearDup = cnts.getLong(1)
    val canonical = comp.select(col("component").as(idCol)).distinct()
    // lazy result: materializing it later re-runs the quality+dedup lineage
    // once (the caches below are released here, not leaked)
    val cleaned = exact.join(canonical, Seq(idCol), "left_semi")
    scored.unpersist(); exact.unpersist()

    (cleaned, CleanReport(input, afterQuality, afterExact, afterNearDup))
  }

  case class PrepareReport(input: Long, afterDedup: Long,
      afterDecontam: Long, sampled: Long)

  /** Web-corpus preparation v2 — the stages a crawl-to-training-set run
    * chains AFTER near-dup removal ([[cleanCorpus]]): markup stripping,
    * exact dedup on the CLEANED text (stripping creates new duplicates),
    * benchmark decontamination, and source-mixture sampling to the
    * training recipe. Deterministic end to end: every stage is hash-based
    * column algebra, so two runs — or two engines — produce identical
    * membership.
    *
    * Scale shape: stripHtml is a row-local expression chain at the scan;
    * dedup is one text-keyed shuffle; decontamination broadcasts the eval
    * gram set (corpus side stays map-side); the mixture is a
    * WindowGroupLimit rank filter. Nothing quadratic, nothing driver-side
    * but the 4 report counts. */
  def prepareCorpus(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, sourceCol: String, targets: Seq[(String, Double)],
      totalRows: Long, stripMarkup: Boolean = true, windowTokens: Int = 8,
      minShared: Long = 1): (DataFrame, PrepareReport) = {
    val cleaned0 =
      if (stripMarkup) docs.withColumn(textCol, Text.stripHtml(col(textCol)))
      else docs
    val input = cleaned0.count()
    // checkpoint each stage output: the report needs a count per stage, and
    // without lineage truncation stage k's count would re-execute stages
    // 1..k−1 — O(stages²) corpus passes at 100 TB. With it, every stage
    // runs exactly once and its count reads the materialized result.
    val deduped = Dedup.exact(cleaned0, idCol, textCol).localCheckpoint()
    val afterDedup = deduped.count()
    val decontam = Decontaminate.decontaminate(deduped, bench, idCol,
      textCol, windowTokens, minShared).localCheckpoint()
    val afterDecontam = decontam.count()
    val sampled = Sampling.mixtureSample(decontam, col(sourceCol),
      col(idCol), targets, totalRows)
    (sampled, PrepareReport(input, afterDedup, afterDecontam,
      sampled.count()))
  }

  /** Split-contamination report: near-duplicate pairs that STRADDLE a
    * train/val/test boundary — the leakage check every split must pass
    * before an eval number is trusted (a test doc whose near-dup sits in
    * train inflates the score). Candidates come from
    * [[Dedup.minhashPairs]] (banded LSH + exact-Jaccard verification —
    * the corpus never self-joins), then each id picks up its split label
    * by equi-join on the SMALL (id, split) projection, and only
    * cross-split pairs survive. Output: (idA, idB, splitA, splitB,
    * jaccard). Pair split labels come from the same deterministic
    * `splitCol` the training job uses, so the report is reproducible
    * run-to-run. */
  /** Deterministic train/val/test split with the leakage already removed:
    * assign splits with [[Sampling.hashSplit]] (first entry of `splits`
    * is the training split by convention), find cross-split near-dup
    * pairs with [[splitLeakage]], then drop every NON-train member of a
    * leaking pair — training mass is kept, and an eval doc whose
    * near-dup sits anywhere else can no longer inflate a score (a
    * val↔test pair loses both sides). The drop set is leak-sized (tiny
    * next to the corpus), so the final filter is a broadcast anti-join;
    * everything upstream is [[splitLeakage]]'s banded-LSH shape.
    * Returns the corpus + `splitCol`, minus dropped rows —
    * deterministic under any partitioning, like both ingredients. */
  def leakFreeSplit(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val trainLabel = splits.head._1
    val assigned = Sampling.hashSplit(docs, col(idCol), splits, splitCol)
    val leaks = splitLeakage(assigned, idCol, textCol, splitCol, shingleN,
      numHashes, bands, threshold, seed)
    val drop = leaks.select(col("idA").as(idCol), col("splitA").as("__sp"))
      .unionAll(leaks.select(col("idB").as(idCol), col("splitB").as("__sp")))
      .where(col("__sp") =!= trainLabel)
      .select(idCol).distinct()
    assigned.join(broadcast(drop), Seq(idCol), "left_anti")
  }

  /** Quality-filter funnel audit: apply `rules` (name → keep-predicate) IN
    * ORDER and report, per stage, how many docs entered, failed, and
    * survived — plus how many fail the rule against the WHOLE corpus
    * (`n_fail_alone`, the overlap diagnostic: a rule whose sequential
    * `n_fail` is far below its standalone count is shadowed by earlier
    * rules). The table every filter-cascade tuning session starts from.
    *
    * Output: (stage, rule, n_in, n_fail, n_out, n_fail_alone), stage 1..k.
    *
    * Scale shape: ONE corpus scan — every cumulative conjunction and
    * standalone failure count is a conditional sum in a single
    * aggregation; the collected row is 2k+1 longs (k = #rules, bounded),
    * and the k-row result is built driver-side from it. Nothing shuffles
    * but the one-row aggregate. */
  def filterFunnel(docs: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val cums = rules.scanLeft(lit(true))((acc, r) => acc && coalesce(r._2,
      lit(false))).tail
    val aggs =
      count(lit(1)).as("__total") +:
      cums.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__cum_$i")
      } ++:
      rules.zipWithIndex.map { case ((_, r), i) =>
        sum(when(coalesce(r, lit(false)), 0L).otherwise(1L)).as(s"__alone_$i")
      }
    val row = docs.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    val k = rules.length
    val out = (0 until k).map { i =>
      val nIn = if (i == 0) total else row.getLong(i) // __cum_{i-1}
      val nOut = row.getLong(i + 1)
      val alone = row.getLong(1 + k + i)
      (i + 1L, rules(i)._1, nIn, nIn - nOut, nOut, alone)
    }
    val session = docs.sparkSession
    import session.implicits._
    out.toDF("stage", "rule", "n_in", "n_fail", "n_out", "n_fail_alone")
  }

  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      splitCol: String, shingleN: Int = 3, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.7,
      seed: Long = 42L): DataFrame = {
    val pairs = Dedup.minhashPairs(docs, idCol, textCol, shingleN,
      numHashes, bands, threshold, seed)
    val labels = docs.select(col(idCol), col(splitCol))
    pairs
      .join(labels.select(col(idCol).as("idA"), col(splitCol).as("splitA")),
        Seq("idA"))
      .join(labels.select(col(idCol).as("idB"), col(splitCol).as("splitB")),
        Seq("idB"))
      .where(col("splitA") =!= col("splitB"))
      .select(col("idA"), col("idB"), col("splitA"), col("splitB"),
        col("jaccard"))
  }

  /** Incremental corpus processing — the "only touch what changed" step
    * every recurring-crawl pipeline needs: [[Dedup.snapshotDiff]]
    * classifies ids against the previous snapshot, `process` (any
    * deterministic ROW-LOCAL transform: cleaning, feature extraction,
    * tokenization) runs ONLY over added/changed rows, unchanged rows
    * reuse the previous output by id, removed rows drop. For a row-local
    * `process` the result provably equals `process(newCorpus)` — at a
    * cost proportional to the DELTA, not the corpus: the diff ships
    * (id, hash64, marker) rows, the reuse path ships previous OUTPUT
    * rows, and only delta-sized text reaches `process`.
    *
    * Not for corpus-global transforms (dedup, df-based filters): those
    * depend on rows outside the delta — run them on the merged result. */
  def incrementalProcess(oldCorpus: DataFrame, newCorpus: DataFrame,
      prevOutput: DataFrame, idCol: String, textCol: String)(
      process: DataFrame => DataFrame): DataFrame = {
    val diff = Dedup.snapshotDiff(oldCorpus, newCorpus, idCol, textCol)
    val delta = diff.where(col("status").isin("added", "changed"))
      .select(idCol)
    val unchanged = diff.where(col("status") === "unchanged").select(idCol)
    val fresh = process(newCorpus.join(delta, Seq(idCol)))
    val reused = prevOutput.join(unchanged, Seq(idCol))
    fresh.unionByName(reused)
  }
}
