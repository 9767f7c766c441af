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
}
