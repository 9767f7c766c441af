package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Deterministic training-shard output — the sink side of the pipeline:
  * after cleaning/dedup/mixing, a corpus ships to the trainer as N
  * self-describing shards plus a manifest the consuming job verifies
  * before it burns GPU-hours on a truncated copy.
  *
  * Everything is a pure function of the data (no RNG, no task identity):
  *  - shard assignment hashes the id onto [[graft.ops.Sampling]]'s 2^20
  *    bucket grid and folds it mod nShards — any engine, any retry, any
  *    partitioning produces the same membership (the same contract as
  *    hashSplit; the ≤ 2^-20-relative bucket-grid nonuniformity is
  *    irrelevant at shard granularity);
  *  - files are written `partitionBy(shard)` so a trainer reads shard k
  *    by path with no filter scan;
  *  - the manifest is per-shard (rows, token sum, id/text 64-bit xor
  *    checksums) — order-insensitive receipts that catch truncation,
  *    duplication, and reordering-with-loss, computable identically by
  *    any engine (xor is associative/commutative, so it is also the rare
  *    checksum that parallel aggregation reproduces bit-for-bit).
  */
object Shards {

  /** Add a deterministic `shardCol` (0 until nShards) keyed on `key`. */
  def assignShards(df: DataFrame, key: Column, nShards: Int,
      shardCol: String = "shard"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    df.withColumn(shardCol,
      (graft.ops.Sampling.bucket(key) % nShards).cast("int"))
  }

  /** Add `shardCol` (0 until nShards) by GLOBAL RANK in `(order, tie)`
    * order — curriculum sharding: shard 0 holds the lowest-ranked
    * nDocs/nShards rows, shard k−1 the highest, so a trainer consuming
    * shards in index order sees the corpus in (e.g.) easiest-to-hardest
    * order. The exact rank comes from [[graft.ops.Quality.rankBuckets]]'
    * two-level range rank with a constant group (ONE range shuffle,
    * partition-local ranks stitched by broadcast offsets — no global
    * window), and shard = (rank−1)·nShards div n in LONG arithmetic, so
    * shard sizes differ by at most one row and the assignment is
    * bit-deterministic at any parallelism. `tie` must make the ranking
    * total (unique — the usual doc id). */
  def assignShardsOrdered(df: DataFrame, order: Column, tie: Column,
      nShards: Int, shardCol: String = "shard"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    graft.ops.Quality.rankBuckets(df, lit(0), order, tie,
        headPct = 0, midPct = 0)
      .withColumn(shardCol,
        call_function("div",
          ((col("rank_in_group") - 1) * nShards).cast("long"),
          col("n_group").cast("long")).cast("int"))
      .drop("rank_in_group", "n_group", "bucket")
  }

  /** Deterministic per-epoch shuffle — the data-order story a multi-epoch
    * trainer needs: epoch `seed` orders the corpus by
    * `hash64("<seed>:<id>")` (a distinct pseudo-random permutation per
    * seed, bit-reproducible across runs and parallelisms), then stripes
    * that order across `nShards`: `shard = rank % nShards`,
    * `posCol = rank / nShards` (0-based rank). Striding — unlike
    * [[assignShardsOrdered]]'s contiguous rule — makes every shard an
    * even subsample of the permuted order, so a trainer that consumes
    * shards in parallel and each shard in `posCol` order sees a globally
    * well-mixed stream, and shard sizes differ by at most one row.
    *
    * Scale shape: [[assignShardsOrdered]]'s — ONE range shuffle for the
    * exact global rank (two-level: partition-local ranks + broadcast
    * offsets, no global window), then scan-side modular arithmetic. A
    * new epoch costs exactly one more pass; nothing is materialized per
    * epoch but the assignment itself. */
  def epochShuffle(df: DataFrame, id: Column, seed: Long, nShards: Int,
      shardCol: String = "shard", posCol: String = "pos_in_shard")
      : DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val key = gf.hash64(concat(lit(s"$seed:"), id.cast("string")))
    graft.ops.Quality.rankBuckets(df, lit(0), key, id,
        headPct = 0, midPct = 0)
      .withColumn(shardCol,
        pmod(col("rank_in_group") - 1, lit(nShards)).cast("int"))
      .withColumn(posCol, call_function("div",
        (col("rank_in_group") - 1).cast("long"), lit(nShards.toLong)))
      .drop("rank_in_group", "n_group", "bucket")
  }

  /** Deterministic proportional interleave — the row-level data-mixing
    * schedule a trainer consumes: each source's rows shuffle into their
    * epoch order (`hash64("<seed>:<id>")`, ties by id — [[epochShuffle]]'s
    * permutation, per source), then the k-th row of source `s` (0-based,
    * weight `w_s`, running offset `cum_s`, `W = Σ w`) takes global slot
    *
    *   `slot = (k / w_s) · W + cum_s + (k mod w_s)`
    *
    * so EVERY consecutive block of `W` slots carries exactly `w_s` rows
    * of each source while that source lasts — consuming in slot order
    * yields the mixture at batch granularity, not just in expectation.
    * Slots are unique by construction; an exhausted source leaves its
    * later slots vacant (consumers read in slot order and skip gaps —
    * re-ranking to densify would cost a second shuffle for no trainer
    * benefit). Rows whose source is not in `weights` are dropped.
    *
    * Scale shape: one range shuffle for the per-source exact rank (the
    * two-level machinery — no global window), then scan-side modular
    * arithmetic against broadcast weight/offset literal maps. */
  def mixtureInterleave(df: DataFrame, sourceCol: String, id: Column,
      weights: Seq[(String, Long)], seed: Long,
      slotCol: String = "slot"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 1L), "weights must be >= 1")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in $weights")
    val total = weights.map(_._2).sum
    val cums = weights.scanLeft(0L)(_ + _._2).init
    val wMap = map(weights.flatMap { case (s0, w0) =>
      Seq(lit(s0), lit(w0)) }: _*)
    val cMap = map(weights.zip(cums).flatMap { case ((s0, _), c0) =>
      Seq(lit(s0), lit(c0)) }: _*)
    val kept = df.where(col(sourceCol).isin(weights.map(_._1): _*))
    val key = gf.hash64(concat(lit(s"$seed:"), id.cast("string")))
    graft.ops.Quality.rankBuckets(kept, col(sourceCol), key, id,
        headPct = 0, midPct = 0)
      .withColumn("__k", (col("rank_in_group") - 1).cast("long"))
      .withColumn("__w", element_at(wMap, col(sourceCol)))
      .withColumn(slotCol,
        call_function("div", col("__k"), col("__w")) * lit(total) +
          element_at(cMap, col(sourceCol)) + pmod(col("__k"), col("__w")))
      .drop("rank_in_group", "n_group", "bucket", "__k", "__w")
  }

  /** Token-weighted mixture schedule — [[mixtureInterleave]] with the
    * recipe expressed in TOKENS, the unit production mixing recipes
    * actually use: source `s` owes `w_s` tokens out of every
    * `W = Σ w` -token block. Each source's rows take their seeded epoch
    * order; a row whose per-source cumulative token count starts at `c`
    * belongs to round `c / w_s` (contiguous token fill per source —
    * [[graft.ops.Packing.packByTokenBudget]]'s rule, per source), and
    * the consumption order is `(round, src_order, cum_tokens)` where
    * `src_order` is the source's index in `weights`. Every round
    * carries ≈ `w_s` tokens of each source (exact up to one straddling
    * document per source per round — rows are atomic) while that
    * source lasts.
    *
    * Output adds: `round`, `src_order`, `cum_tokens` (per-source
    * cumulative INCLUDING the row — with (round, src_order) it makes
    * the consumption order total), and `n_tokens` (the row's counted
    * tokens). Rows whose source is not in `weights` are dropped.
    *
    * Scale shape: ONE range shuffle on (source, hash, id) for the
    * grouped LONG-exact prefix sum ([[graft.ops.Packing
    * .groupedPrefixSumLong]] — per-(partition, source) totals collected,
    * offsets broadcast, no global window), then scan-side arithmetic. */
  def mixtureInterleaveTokens(df: DataFrame, sourceCol: String,
      id: Column, tokens: Column, weights: Seq[(String, Long)],
      seed: Long): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 1L), "token weights must be >= 1")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in $weights")
    val wMap = map(weights.flatMap { case (s0, w0) =>
      Seq(lit(s0), lit(w0)) }: _*)
    val oMap = map(weights.zipWithIndex.flatMap { case ((s0, _), i) =>
      Seq(lit(s0), lit(i.toLong)) }: _*)
    val kept = df.where(col(sourceCol).isin(weights.map(_._1): _*))
      .withColumn("n_tokens", tokens.cast("long"))
    val key = gf.hash64(concat(lit(s"$seed:"), id.cast("string")))
    graft.ops.Packing.groupedPrefixSumLong(kept, col(sourceCol), key,
        id, col("n_tokens"), "cum_tokens")
      .withColumn("round", call_function("div",
        col("cum_tokens") - col("n_tokens"),
        element_at(wMap, col(sourceCol))))
      .withColumn("src_order", element_at(oMap, col(sourceCol)))
  }

  /** Write `df` as `nShards` hash shards under `path` (parquet,
    * `shard=k/` directories). One shuffle keyed by shard; rows sort
    * within each shard by `key` so re-runs lay out byte-stable files. */
  def writeShards(df: DataFrame, key: Column, nShards: Int,
      path: String): Unit = {
    val assigned = assignShards(df, key, nShards)
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), key)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Per-shard manifest of a written shard layout: (shard, n_rows,
    * n_tokens, id_xor, text_xor), one aggregation over the read-back.
    * Token counts use the whitespace tokenizer ([[gf.token_count]]);
    * checksums are xors of `hash64` so the receipt is order-insensitive
    * and engine-reproducible. */
  def manifest(spark: SparkSession, path: String, idCol: String,
      textCol: String): DataFrame =
    manifestOf(spark.read.parquet(path), idCol, textCol)

  /** Manifest of an already-assigned frame (must carry a `shard` col). */
  def manifestOf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(gf.token_count(col(textCol)).cast("long")).as("n_tokens"),
        bit_xor(gf.hash64(col(idCol))).as("id_xor"),
        bit_xor(gf.hash64(col(textCol))).as("text_xor"))
      .orderBy("shard")
}
