package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Similarity-ordered context packing — the "related documents share a
  * context window" construction of In-Context Pretraining (Shi et al.
  * 2023): instead of packing documents in arbitrary corpus order, route
  * each document to its nearest semantic cluster, order each cluster's
  * documents by proximity to the cluster core, and contiguous-fill
  * token-budget bins WITHIN clusters — so every training window reads
  * as a run of topically related documents, and no window straddles two
  * clusters.
  *
  * Determinism/portability: cluster assignment is argmax cosine against
  * a FIXED codebook (ties to the lowest centroid index — the
  * [[gf.nearest_centroids]] contract), the within-cluster order is
  * (round-6 cosine DESC, id ASC) so an external engine reproduces the
  * exact sequence, and the running token total is a grouped LONG-exact
  * prefix sum ([[Packing.groupedPrefixSumLong]] — two-level ranks, no
  * single-partition window).
  *
  * Scale shape: one scan computes assignment + cosine scan-side against
  * the broadcast codebook literal (no shuffle), then ONE range
  * shuffle keyed (cluster, order) feeds the distributed prefix sum —
  * the same shape as the curriculum sharder. The codebook is the output
  * of any clustering pass ([[Similarity.kmeansFit]] at k up to a few
  * thousand); documents and vectors never pairwise-join.
  */
object InContext {

  /** Adds (cluster, cosine, n_tokens, cum_tokens, bin) to `df`:
    * bin = ⌊(cum_tokens − n_tokens) / budget⌋ within the document's
    * cluster, over the (cosine DESC, id) order. `bin_global` combines
    * (cluster, bin) into one sortable long (cluster · 2^40 + bin). */
  def packByCluster(df: DataFrame, idCol: Column, tokensCol: Column,
      vecCol: Column, codebook: Seq[Seq[Double]], budget: Long,
      roundTo: Int = 6): DataFrame = {
    require(codebook.nonEmpty, "empty codebook")
    require(budget >= 1, "budget must be >= 1")
    val cb = typedLit(codebook)
    val assigned = df
      .withColumn("cluster",
        element_at(gf.nearest_centroids(vecCol, cb, 1), 1))
      .withColumn("cosine",
        round(gf.vec_cosine(vecCol.cast("array<double>"),
          element_at(cb, col("cluster") + 1)), roundTo))
      .withColumn("n_tokens", tokensCol.cast("long"))
    Packing.groupedPrefixSumLong(assigned, col("cluster"),
        -col("cosine"), idCol, col("n_tokens"), "cum_tokens")
      .withColumn("bin", call_function("div",
        col("cum_tokens") - col("n_tokens"), lit(budget)))
      .withColumn("bin_global",
        col("cluster").cast("long") * lit(1099511627776L) + col("bin"))
  }
}
