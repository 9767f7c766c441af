package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two tiers, same output schema (query_id, neighbor_id, cosine, rank):
  *  - [[bruteForceTopK]] — exact: broadcast the query set against the corpus
  *    (one pass over the corpus, no corpus shuffle; correct baseline and the
  *    right plan whenever |queries| is broadcast-sized, even at 100 TB corpus);
  *  - [[lshTopK]] — approximate: SRP-LSH bucket join, so corpus rows shuffle
  *    only by small (table, sig) keys and each query only scores its bucket
  *    collisions. Recall tunable via bits/tables.
  */
object Similarity {

  /** Exact top-k cosine neighbors per query. `queries` must be small enough
    * to broadcast (driver guard: required for the nested-loop plan to be the
    * intended one). Excludes self-matches when ids collide. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gf.vec_cosine(col("__qv"), col("__cv")), roundTo).as("cosine"))
    topK(scored, k)
  }

  /** Approximate top-k via SRP-LSH OR-amplified candidate generation.
    * Candidates = corpus rows sharing any of `tables` signature buckets with
    * the query; scored and ranked like the exact path. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 12, tables: Int = 8,
      seed: Long = 42L, roundTo: Int = 6): DataFrame = {
    def banded(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v), posexplode(
        transform(sequence(lit(0), lit(tables - 1)),
          t => gf.srp_signature(col(vecCol), bits, xxhash64(t, lit(seed))))))
        .toDF(id, v, "__table", "__sig")
    // dedupe candidate pairs BEFORE scoring so each (query, neighbor) pays
    // one cosine regardless of how many tables it collided in
    val cb = banded(corpus, "neighbor_id", "__cv").select("__table", "__sig", "neighbor_id")
    val qb = banded(queries, "query_id", "__qv").select("__table", "__sig", "query_id")
    val cand = cb.join(qb, Seq("__table", "__sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gf.vec_cosine(col("__qv"), col("__cv")), roundTo).as("cosine"))
    topK(scored, k)
  }

  /** IVF-flat index: a deterministic hashed sample of corpus vectors as the
    * codebook, plus the corpus with each row assigned to its nearest
    * centroid. At scale, write `assigned` partitioned/bucketed by
    * `centroid` so a search touches only the probed buckets' files. */
  case class IvfIndex(codebook: Seq[Seq[Double]], assigned: DataFrame)

  /** Build an IVF index. Centroid selection is hash-ordered (deterministic,
    * no RNG): the `nCenters` corpus vectors with smallest xxhash64(id, seed).
    * Assignment is one codebook pass per row — no shuffle. */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nCenters: Int = 64, seed: Long = 42L): IvfIndex = {
    val centroidRows = corpus
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("__h", xxhash64(col("__id"), lit(seed)))
      .orderBy("__h", "__id").limit(nCenters)
      .select("v").collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val codebookCol = typedLit(centroidRows)
    val assigned = corpus.withColumn("centroid",
      element_at(gf.nearest_centroids(col(vecCol), codebookCol, 1), 1))
    IvfIndex(centroidRows, assigned)
  }

  /** Approximate top-k over an IVF index: each query probes its `nProbe`
    * nearest centroids and scores only those buckets — corpus rows shuffle
    * once on the small centroid key; queries broadcast. */
  def ivfTopK(index: IvfIndex, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    val codebookCol = typedLit(index.codebook)
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("centroid",
        explode(gf.nearest_centroids(col("__qv"), codebookCol, nProbe)))
    val c = index.assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("centroid"))
    val scored = c.join(broadcast(probed), Seq("centroid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gf.vec_cosine(col("__qv"), col("__cv")), roundTo).as("cosine"))
    topK(scored, k)
  }

  /** A fitted k-means model: the codebook plus the corpus with each row's
    * `centroid` assignment (0-based codebook index). */
  case class KMeansModel(codebook: Seq[Seq[Double]], assigned: DataFrame,
      iterations: Int)

  /** Lloyd's k-means over an embedding column, fully deterministic:
    *  - init: the k vectors with the smallest ids (no RNG);
    *  - assignment: max-cosine centroid (ties → lowest index), one codebook
    *    pass per row via the same codegen'd [[graft.expr.NearestCentroids]]
    *    kernel IVF uses — no shuffle;
    *  - update: per-(cluster, dim) EXACT mean — dimension values fold into
    *    [[graft.api.functions.exact_sum]]'s fixed-point superaccumulator,
    *    whose rounded total is a function of the value multiset alone, so
    *    the fit is bit-identical across partitionings, retries, and cluster
    *    sizes WITHOUT ordering anything. (Floating-point adds are not
    *    order-associative; an earlier design pinned summation order with a
    *    rows×dim running-sum window — a per-iteration sort-shuffle that
    *    would dominate codebook training at scale. The exact sum keeps the
    *    determinism and drops the sort: see [[kmeansIterStats]].)
    *
    * Scale shape per iteration: one posexplode (rows × dim slim rows of
    * (cluster, dim, x)), partial aggregation map-side (≤ partitions × k×dim
    * ~1 KB buffers ride the wire), ONE shuffle on (cluster, dim), no sort,
    * no window; the driver holds only k×dim centroid stats (= the codebook
    * it must hold anyway). Empty clusters keep their previous centroid.
    * Stops at codebook fixpoint or `maxIters`. */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 10): KMeansModel = {
    require(k >= 1, "k must be >= 1")
    val base = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    var codebook: Seq[Seq[Double]] = base
      .orderBy("__id").limit(k)
      .select(col("__v").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    require(codebook.nonEmpty, "corpus is empty")
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val stats = kmeansIterStats(base, codebook).collect()
      val next = Array.tabulate(codebook.length)(i => codebook(i).toArray)
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      val newCb: Seq[Seq[Double]] = next.map(_.toSeq).toSeq
      converged = newCb == codebook
      codebook = newCb
      iter += 1
    }
    val assigned = corpus.withColumn("centroid",
      element_at(gf.nearest_centroids(col(vecCol), typedLit(codebook), 1), 1))
    KMeansModel(codebook, assigned, iter)
  }

  /** One Lloyd's update step as a DataFrame: per-(cluster, dim) exact sum
    * and count of `base` = (__id, __v) against `codebook`. Exposed for plan
    * tests: the physical plan must contain NO Sort and NO Window — just
    * scan → posexplode → partial ObjectHashAggregate → one Exchange on the
    * k×dim key → final aggregate. */
  private[graft] def kmeansIterStats(base: DataFrame,
      codebook: Seq[Seq[Double]]): DataFrame =
    base.select(
        element_at(gf.nearest_centroids(col("__v"), typedLit(codebook), 1), 1)
          .as("__c"),
        posexplode(col("__v").cast("array<double>")).as(Seq("__d", "__x")))
      .groupBy("__c", "__d")
      .agg(gf.exact_sum(col("__x")).as("__tot"), count(lit(1)).as("__n"))

  /** Deterministic sign random projection (Achlioptas 2003): out[i] =
    * Σ_d vec[d] · s(i,d) with s(i,d) ∈ {−1,+1} derived from the engine's
    * splitmix64 hash of (seed, i, d) — a Johnson–Lindenstrauss dimension
    * reduction with NO stored matrix and NO RNG state: any task (or any
    * engine) regenerates the same projection from the seed. Use it to cut
    * embedding width before ANN/near-dup passes. Pure column expression;
    * the fold over dimensions runs left-to-right, so sums are
    * bit-reproducible. Output is array<double> of length `outDim`
    * (unnormalized; divide by √outDim for distance-preserving scale). */
  def signProjection(vec: Column, outDim: Int, seed: Long = 42L): Column = {
    require(outDim >= 1, "outDim must be >= 1")
    val proj = transform(sequence(lit(0), lit(outDim - 1)), i =>
      aggregate(
        zip_with(vec.cast("array<double>"),
          sequence(lit(0L), size(vec).cast("long") - 1),
          (v, d) => v * (gf.hash64(i.cast("long") * 1000003L + d * 7L + seed)
            .bitwiseAND(lit(1L)) * 2L - 1L).cast("double")),
        lit(0.0), (acc, x) => acc + x))
    // empty input: sequence(0, size-1) would count DOWN [0,-1] and zip_with
    // would null-pad — guard to the mathematically right all-zero projection
    when(vec.isNull, lit(null).cast("array<double>"))
      .when(size(vec) > 0, proj)
      .otherwise(array_repeat(lit(0.0), lit(outDim)))
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings by nearest centroid, then compare
    * pairs ONLY within a cluster — the cluster granularity bounds the
    * quadratic pair blow-up, exactly the paper's trick. Returns
    * (idA, idB, cluster, cosine) for within-cluster pairs with
    * cosine ≥ `tau`, idA < idB, cosine rounded to `roundTo`.
    *
    * Scale shape: one codebook pass per row (no shuffle), ONE shuffle on the
    * small cluster key (both sides SHUFFLE_HASH so AQE reuses the assignment
    * exchange), per-cluster equi-join. Size k so corpus/k rows fit a task's
    * quadratic budget (the paper uses k ≈ √n · c for exactly this reason). */
  def semanticPairs(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[Seq[Double]], tau: Double, roundTo: Int = 6): DataFrame = {
    require(codebook.nonEmpty, "codebook must be non-empty")
    val cb = typedLit(codebook)
    val assigned = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      element_at(gf.nearest_centroids(col(vecCol), cb, 1), 1).as("__c"))
    val a = assigned.select(col("__c"), col("__id").as("idA"), col("__v").as("__va"))
    val b = assigned.select(col("__c"), col("__id").as("idB"), col("__v").as("__vb"))
    a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"), Seq("__c"))
      .where(col("idA") < col("idB"))
      .withColumn("__cos", gf.vec_cosine(col("__va"), col("__vb")))
      .where(col("__cos") >= tau)
      .select(col("idA"), col("idB"), col("__c").as("cluster"),
        round(col("__cos"), roundTo).as("cosine"))
  }

  /** Per-group mean embedding (centroid) — the summary behind a
    * source/language similarity map or a cluster prototype table. One
    * posexplode pass, one shuffle keyed by the SMALL (group, dim) key with
    * map-side combine (the corpus never shuffles vectors); per-dim sums
    * fan in through `exact_sum`, and the mean is one IEEE division — so
    * centroids are bit-identical under any partitioning. Output: (group,
    * centroid array<double>, n_vectors). Null groups/vectors are dropped;
    * empty vectors contribute nothing; with ragged dimensions each dim
    * averages over the vectors that HAVE it (uniform-width embeddings are
    * the expected input). */
  def groupCentroids(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame =
    df.where(groupCol.isNotNull && vecCol.isNotNull)
      .select(groupCol.as("group"),
        posexplode(vecCol.cast("array<double>")).as(Seq("__d", "__x")))
      .groupBy("group", "__d")
      .agg(gf.exact_sum(col("__x")).as("__tot"), count(lit(1)).as("__n"))
      .groupBy("group")
      .agg(transform(
          array_sort(collect_list(struct(col("__d"), (col("__tot") / col("__n")).as("__m")))),
          e => e.getField("__m")).as("centroid"),
        max(col("__n")).as("n_vectors"))

  /** Pairwise cosine similarity between [[groupCentroids]] — which
    * sources/languages are semantically close (mixture design, redundancy
    * maps). The centroid table is group-count-sized, so the pair join is a
    * trivially broadcast k×k; output (group_a, group_b, cosine) for
    * group_a < group_b, cosine rounded to `roundTo`. */
  def centroidCosines(df: DataFrame, groupCol: Column, vecCol: Column,
      roundTo: Int = 6): DataFrame = {
    val cent = groupCentroids(df, groupCol, vecCol)
    val a = cent.select(col("group").as("group_a"), col("centroid").as("__ca"))
    val b = cent.select(col("group").as("group_b"), col("centroid").as("__cb"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        round(gf.vec_cosine(col("__ca"), col("__cb")), roundTo).as("cosine"))
  }

  /** Embedding drift between two corpus slices — the semantic-space
    * counterpart of `Drift.categoricalDrift`: did the new snapshot MEAN
    * anything different, even where token statistics look stable? One row:
    * cosine between the two slices' mean embeddings, both centroid L2
    * norms (a norm collapse flags degenerate/duplicated content), and the
    * slice sizes. Built on [[groupCentroids]] over the boolean slice flag,
    * so the corpus never shuffles vectors and the centroids are
    * bit-reproducible; the final comparison is a 2-row join. */
  def centroidShift(df: DataFrame, vecCol: Column, isA: Column,
      roundTo: Int = 6): DataFrame = {
    val cent = groupCentroids(df.where(isA.isNotNull), isA, vecCol)
    val a = cent.where(col("group") === true)
      .select(col("centroid").as("__ca"), col("n_vectors").as("n_a"))
    val b = cent.where(col("group") === false)
      .select(col("centroid").as("__cb"), col("n_vectors").as("n_b"))
    a.crossJoin(b).select(
      round(gf.vec_cosine(col("__ca"), col("__cb")), roundTo).as("cosine"),
      round(gf.vec_norm(col("__ca")), roundTo).as("norm_a"),
      round(gf.vec_norm(col("__cb")), roundTo).as("norm_b"),
      col("n_a"), col("n_b"))
  }

  /** Dimension-truncation (matryoshka) retrieval report — how much
    * recall survives indexing only the first d dimensions? The receipt
    * read before shrinking an ANN index (truncated-then-rerank is the
    * standard matryoshka serving pattern; this measures the truncation
    * side). For each d in `dims`: brute-force top-k over vectors sliced
    * to their first d components vs the full-dimension top-k truth;
    * recall@k per query, aggregated per d. Queries are a BOUNDED panel
    * (the eval set), so the brute-force scans are |queries| broadcast
    * passes over the corpus — the same oracle-baseline shape as
    * [[bruteForceTopK]]; rank ties break on rounded cosine then id, so
    * the sets are engine-independent.
    *
    * Returns one row per d: (dim, k, n_queries, mean_recall,
    * min_recall); the full-width entry (d = vector width) scores 1.0 by
    * construction — a built-in sanity row. */
  def dimTruncationReport(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dims: Seq[Int],
      k: Int = 10): DataFrame = {
    require(dims.nonEmpty, "dims must be non-empty")
    require(dims.forall(_ >= 1), "dims must be >= 1")
    require(dims.distinct.size == dims.size, "dims must be distinct")
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
      .localCheckpoint()
    val perDim = dims.map { d =>
      val cT = corpus.select(col(idCol),
        slice(col(vecCol), 1, d).as("__tv"))
      val qT = queries.select(col(idCol),
        slice(col(vecCol), 1, d).as("__tv"))
      bruteForceTopK(cT, qT, idCol, "__tv", k)
        .select(lit(d).as("dim"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    perDim
      .join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy("dim", "query_id")
      .agg((coalesce(sum(col("__hit")), lit(0L)).cast("double") / k)
        .as("__recall"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n_queries"),
        (gf.exact_sum(col("__recall")) / count(lit(1))).as("mean_recall"),
        min(col("__recall")).as("min_recall"))
      .withColumn("k", lit(k))
      .select(col("dim"), col("k"), col("n_queries"), col("mean_recall"),
        col("min_recall"))
  }

  /** Per-group embedding outlier flagging — the data-cleaning receipt for
    * a 100 TB embedded corpus: rows whose vector sits far from their
    * group's mean direction are mislabeled, off-topic, or corrupted
    * content (the SemDeDup-family "semantic outlier" prune). Distance =
    * 1 − cosine(vec, group centroid), z-scored WITHIN the group (a tight
    * group flags at a much smaller absolute distance than a diffuse one).
    *
    * Scale shape: two corpus passes — [[groupCentroids]]'s one
    * (group, dim) exact-sum shuffle, then a scan-side distance pass with
    * the group-count-sized centroid and stats tables BROADCAST — the
    * corpus itself never shuffles and no vector moves twice. Distance
    * moments come from the one-pass summary_stats sketch (exact Pébay
    * combine, partitioning-invariant). z is NULL (and the row never
    * flags) when the group's distance spread is zero or the group has
    * < 2 rows.
    *
    * Returns (group, idCol, cosine_dist, z, is_outlier). */
  def embeddingOutliers(df: DataFrame, idCol: String, groupCol: Column,
      vecCol: Column, zThreshold: Double = 3.0): DataFrame = {
    val cent = groupCentroids(df, groupCol, vecCol)
    val rows = df.where(groupCol.isNotNull && vecCol.isNotNull)
      .select(col(idCol).as("__id"), groupCol.as("group"),
        vecCol.cast("array<double>").as("__v"))
    // narrow (group, id, dist) frame is read twice (moments + final z) —
    // checkpoint it so the vector scan and centroid broadcast run ONCE,
    // and what persists is 3 scalar columns, not the vectors
    val dists = rows
      .join(broadcast(cent.select(col("group"), col("centroid"))),
        Seq("group"))
      .select(col("group"), col("__id"),
        (lit(1.0) - gf.vec_cosine(col("__v"), col("centroid")))
          .as("__dist"))
      .localCheckpoint()
    val stats = dists.groupBy("group")
      .agg(gf.summary_stats(col("__dist")).as("__st"))
      .select(col("group"), gf.stats_mean(col("__st")).as("__mu"),
        gf.stats_std(col("__st"), 1).as("__sd"))
    dists.join(broadcast(stats), Seq("group"))
      .select(col("group"), col("__id").as(idCol),
        col("__dist").as("cosine_dist"),
        // NaN sorts ABOVE every double in Spark SQL, so a bare sd > 0
        // would pass the single-row group (ddof-1 std = 0/0 = NaN)
        when(!isnan(col("__sd")) && col("__sd") > 0,
          (col("__dist") - col("__mu")) / col("__sd")).as("z"))
      .withColumn("is_outlier",
        coalesce(col("z") > zThreshold, lit(false)))
  }

  /** Semantic dedup: drop all but one representative of every semantic-dup
    * group (connected components over [[semanticPairs]], keep the minimum
    * id — deterministic). Returns the corpus minus dropped rows. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[Seq[Double]], tau: Double): DataFrame = {
    val pairs = semanticPairs(corpus, idCol, vecCol, codebook, tau)
    val drop = Dedup.components(pairs.select("idA", "idB"))
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Product-quantization codebooks: `m` sub-codebooks, one per contiguous
    * `dim/m` slice of the vector. Spherical variant — sub-assignment is
    * max-cosine, consistent with the cosine ANN stack (classic PQ uses L2;
    * for normalized-embedding corpora the spherical form ranks the same
    * inner products the searcher uses). */
  type PqCodebooks = Seq[Seq[Seq[Double]]]

  /** Train PQ codebooks: all `m` subspaces advance TOGETHER — one corpus
    * scan per Lloyd's iteration, one shuffle on the small (subspace,
    * cluster, dim) key, with the same exact_sum update [[kmeansFit]] uses.
    * (m independent fits would scan the corpus m times per iteration; at
    * 100 TB the scans, not the k×dim driver state, are the bill.)
    *
    * Per-subspace codebooks are IDENTICAL to independent [[kmeansFit]] runs
    * over the sliced corpus (spec-verified): each subspace's assignment and
    * update touch only its own slice, the Lloyd's update is idempotent at a
    * fixpoint — a subspace that converged early just reproduces its
    * codebook while stragglers finish — and exact_sum makes every total a
    * pure function of its value multiset. The driver holds only
    * m·ksub·subDim doubles. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      subDim: Int, ksub: Int, maxIters: Int = 10): PqCodebooks = {
    require(m >= 1 && ksub >= 1, "m and ksub must be >= 1")
    val base = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    // init: per-subspace slices of the ksub smallest-id vectors — exactly
    // kmeansFit's rule applied to each sliced frame
    val initRows = base.orderBy("__id").limit(ksub)
      .select("__v").collect().map(_.getSeq[Double](0))
    require(initRows.nonEmpty, "corpus is empty")
    var books: IndexedSeq[Seq[Seq[Double]]] = (0 until m).map(s =>
      initRows.map(v => v.slice(s * subDim, (s + 1) * subDim).toSeq).toSeq)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val perSub = (0 until m).map { s =>
        val sv = slice(col("__v"), s * subDim + 1, subDim)
        struct(lit(s).as("s"),
          element_at(gf.nearest_centroids(sv, typedLit(books(s)), 1), 1).as("c"),
          sv.as("sv"))
      }
      val stats = base
        .select(explode(array(perSub: _*)).as("a"))
        .select(col("a.s").as("__s"), col("a.c").as("__c"),
          posexplode(col("a.sv")).as(Seq("__d", "__x")))
        .groupBy("__s", "__c", "__d")
        .agg(gf.exact_sum(col("__x")).as("__tot"), count(lit(1)).as("__n"))
        .collect()
      val next = books.map(cb => cb.map(_.toArray).toArray).toArray
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDouble(3) / r.getLong(4)
      }
      val newBooks: IndexedSeq[Seq[Seq[Double]]] =
        next.map(cb => cb.map(_.toSeq).toSeq).toIndexedSeq
      converged = newBooks == books
      books = newBooks
      iter += 1
    }
    books
  }

  /** Encode a vector into its `m` sub-codes (0-based centroid indices,
    * ties to the lowest index) — a pure column expression: the 100 TB
    * corpus encodes at the scan, no shuffle. Codes are `m` small ints per
    * row (e.g. 64-dim float → 4 bytes-ish), the representation ADC search
    * and IVF-PQ lists store. */
  def pqEncode(vec: Column, codebooks: PqCodebooks, subDim: Int): Column =
    array(codebooks.zipWithIndex.map { case (cb, i) =>
      element_at(gf.nearest_centroids(
        slice(vec, i * subDim + 1, subDim), typedLit(cb), 1), 1)
    }: _*)

  /** Asymmetric-distance (ADC) scoring: per query, a lookup table of
    * partial inner products query-slice·centroid (m·ksub doubles) replaces
    * the full vectors; each encoded corpus row is scored by summing its m
    * table entries. The LUT frame broadcasts; the corpus side ships only
    * (id, sub, code) rows into the per-(query, id) sum. Returns
    * (query_id, idCol, adc_dot) — the approximate inner product PQ search
    * ranks by. */
  def pqAdcScores(encoded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codesCol: String, codebooks: PqCodebooks,
      subDim: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val cbRows = for ((cb, i) <- codebooks.zipWithIndex.toSeq;
                      (c, j) <- cb.zipWithIndex)
      yield (i, j, c)
    val cbDf = cbRows.toDF("__sub", "__code", "__centroid")
    val lut = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(cbDf)
      .select(col("query_id"), col("__sub"), col("__code"),
        gf.vec_dot(slice(col("__qv"), col("__sub") * subDim + 1, lit(subDim)),
          col("__centroid")).as("__partial"))
    encoded
      .select(col(idCol), posexplode(col(codesCol)).as(Seq("__sub", "__code")))
      .join(broadcast(lut), Seq("__sub", "__code"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("__partial").as("adc_dot"))
  }

  /** IVF-PQ index: coarse centroids route queries to inverted lists; PQ
    * codes stand in for the vectors inside each list. `assigned` =
    * (idCol, centroid, codes) — at scale, write it partitioned by
    * `centroid` so a search reads only the probed lists' files, and the
    * codes column (m small ints) instead of the raw vectors is what makes
    * the lists cheap to scan. */
  case class IvfPqIndex(centroids: Seq[Seq[Double]], codebooks: PqCodebooks,
      subDim: Int, assigned: DataFrame)

  /** Build an IVF-PQ index: deterministic hash-selected coarse centroids
    * ([[ivfBuild]]'s rule) + per-subspace PQ codebooks ([[pqTrain]]), then
    * one scan that both routes and encodes every vector. */
  def ivfPqBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nCenters: Int, m: Int, subDim: Int, ksub: Int, seed: Long = 42L,
      maxIters: Int = 10): IvfPqIndex = {
    val coarse = ivfBuild(corpus, idCol, vecCol, nCenters, seed)
    val cbs = pqTrain(corpus, idCol, vecCol, m, subDim, ksub, maxIters)
    val assigned = corpus.select(col(idCol),
      element_at(gf.nearest_centroids(col(vecCol),
        typedLit(coarse.codebook), 1), 1).as("centroid"),
      pqEncode(col(vecCol), cbs, subDim).as("codes"))
    IvfPqIndex(coarse.codebook, cbs, subDim, assigned)
  }

  /** Persist an IVF-PQ index as parquet under `path`: `assigned/` holds
    * the corpus-sized (id, centroid, codes) table written PARTITIONED BY
    * centroid — so at scale a search touching nProbe cells prunes to
    * nProbe/nCenters of the files at the directory level before any scan
    * — and `meta/` holds one row of driver-side structures (coarse
    * centroids, PQ codebooks, subDim). Indexes train once and serve many
    * search jobs; persistence is what decouples the two. */
  def saveIvfPqIndex(index: IvfPqIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite")
      .partitionBy("centroid").parquet(s"$path/assigned")
    Seq((index.centroids.map(_.toSeq).toSeq,
        index.codebooks.map(_.map(_.toSeq).toSeq).toSeq, index.subDim))
      .toDF("centroids", "codebooks", "sub_dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Append new vectors to a persisted [[saveIvfPqIndex]] layout — the
    * FAISS `add()` lifecycle: quantizers (coarse centroids + PQ
    * codebooks) are FROZEN at train time and come from the stored meta,
    * never from the new shard, so the grown index is indistinguishable
    * from one assigned whole (gate-pinned, q226) and search results can
    * never fork on who did the adding. New rows land as additional files
    * under their `centroid=` partition directories — directory-level
    * probe pruning keeps working. O(shard) per append; ids must be
    * globally unique across build and appends (caller-owned). Not
    * crash-atomic: rerun a failed append rather than reading half. */
  def appendToIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val idx = loadIvfPqIndex(spark, path)
    df.select(col(idCol),
        element_at(gf.nearest_centroids(col(vecCol),
          typedLit(idx.centroids), 1), 1).as("centroid"),
        pqEncode(col(vecCol), idx.codebooks, idx.subDim).as("codes"))
      .write.mode("append").partitionBy("centroid")
      .parquet(s"$path/assigned")
  }

  /** Load an index written by [[saveIvfPqIndex]]. The assigned table
    * comes back lazily (searches prune its centroid partitions); the
    * meta row is collected to the driver. */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfPqIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    // Row nests arrays as MUTABLE ArraySeq — convert level by level
    def vec(a: Any): Seq[Double] =
      a.asInstanceOf[scala.collection.Seq[Double]].toSeq
    val centroids = meta.getAs[scala.collection.Seq[Any]](0).toSeq.map(vec)
    val codebooks: PqCodebooks =
      meta.getAs[scala.collection.Seq[Any]](1).toSeq.map(
        _.asInstanceOf[scala.collection.Seq[Any]].toSeq.map(vec))
    IvfPqIndex(centroids, codebooks, meta.getInt(2),
      spark.read.parquet(s"$path/assigned"))
  }

  /** IVF-PQ search: each query probes its `nProbe` nearest coarse cells
    * and ADC-scores ONLY those cells' codes — the corpus contributes
    * (id, centroid, codes) rows, never vectors; the per-query LUT and the
    * probe set broadcast. Ranking is by the ADC approximate inner product
    * rounded to `roundTo` (engine-reproducible), ties to the lower id.
    * Returns (query_id, idCol, adc_dot, rank). */
  def ivfPqTopK(index: IvfPqIndex, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val probed = q.select(col("query_id"), explode(
      gf.nearest_centroids(col("__qv"), typedLit(index.centroids), nProbe))
      .as("centroid"))
    val cbRows = for ((cb, i) <- index.codebooks.zipWithIndex.toSeq;
                      (c, j) <- cb.zipWithIndex)
      yield (i, j, c)
    val lut = q.crossJoin(cbRows.toDF("__sub", "__code", "__centroid"))
      .select(col("query_id"), col("__sub"), col("__code"),
        gf.vec_dot(slice(col("__qv"), col("__sub") * index.subDim + 1,
          lit(index.subDim)), col("__centroid")).as("__partial"))
    val cand = index.assigned
      .join(broadcast(probed), Seq("centroid"))
      .select(col("query_id"), col(idCol),
        posexplode(col("codes")).as(Seq("__sub", "__code")))
    val scored = cand
      .join(broadcast(lut), Seq("query_id", "__sub", "__code"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("__partial").as("adc_dot"))
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("adc_dot"), roundTo).desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        round(col("adc_dot"), roundTo).as("adc_dot"), col("rank"))
  }

  /** IVF-PQ search WITH an exact re-rank stage — standard ANN practice:
    * ADC ranks are quantized (each sub-slice snaps to one of ksub
    * centroids), so the true nearest neighbor can sit a few places down
    * the ADC list; re-scoring the top `rerank` ADC candidates against
    * their TRUE vectors and taking the exact top-k recovers it whenever
    * it entered the candidate list at all (recall is then bounded only by
    * the coarse probe, not by quantization).
    *
    * Scale shape: the ADC stage is [[ivfPqTopK]] unchanged (codes, never
    * vectors); the refinement joins the queries × rerank candidate id set
    * — BROADCAST, it is the small side by construction — against the
    * corpus, so only the candidates' vectors ever leave the scan, and the
    * exact scoring window is rerank rows per query. Returns
    * (query_id, idCol, cosine, rank) ranked by exact cosine (round
    * `roundTo`, ties to the lower id). */
  def ivfPqTopKRefined(index: IvfPqIndex, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      rerank: Int, nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    require(k >= 1 && rerank >= k, "need rerank >= k >= 1")
    val cand = ivfPqTopK(index, queries, idCol, vecCol, rerank, nProbe,
      roundTo).select(col("query_id"), col(idCol))
    val cv = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val exact = cv.join(broadcast(cand), Seq(idCol))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col(idCol),
        round(gf.vec_cosine(col("__qv"), col("__cv")), roundTo).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col(idCol))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cosine"), col("rank"))
  }

  /** Rank scored pairs into top-k per query with a deterministic tie-break
    * (cosine desc, neighbor_id asc). */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  // --- INT8 scalar quantization (SQ8) --------------------------------------
  //
  // The third compression point on the ANN memory/recall curve, between
  // full vectors and PQ codes: each dimension stores one byte, so a
  // 64-dim float32 corpus shrinks 4x (256 B -> 64 B/vector) with far less
  // quantization error than PQ's 4x16-dim codebooks. At 100 TB this is the
  // difference between shipping 25 TB and 100 TB through the candidate
  // join; ranges train in ONE (dim)-keyed aggregation pass and broadcast
  // as d-sized literals, so encoding is a pure scan-side map.

  /** Per-dimension [lo, hi] training ranges: one posexplode +
    * (dim)-keyed min/max aggregation — output is d rows, corpus-size
    * independent. min/max of floats is exact (no fp accumulation), so two
    * engines agree bit-for-bit. */
  def sqRanges(df: DataFrame, vecCol: Column): DataFrame =
    df.select(posexplode(vecCol).as(Seq("dim", "__x")))
      .groupBy("dim")
      .agg(min(col("__x").cast("double")).as("lo"),
        max(col("__x").cast("double")).as("hi"))
      .orderBy("dim")

  /** Quantize a float vector to int codes 0..255 under driver-side
    * per-dim ranges (d-sized, from [[sqRanges]]): floor((x−lo)/(hi−lo)·256)
    * clamped — floor, not round, so engines can't disagree on half-way
    * cases. Degenerate dims (hi == lo) code to 0. */
  def sqQuantize(vec: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    require(lo.length == hi.length, "lo/hi must have equal length")
    val loL = typedLit(lo)
    val hiL = typedLit(hi)
    transform(vec, (x, i) => {
      val l = element_at(loL, (i + 1).cast("int"))
      val h = element_at(hiL, (i + 1).cast("int"))
      when(h <= l, lit(0)).otherwise(
        least(lit(255), greatest(lit(0),
          floor((x.cast("double") - l) / (h - l) * 256.0))).cast("int"))
    })
  }

  /** Midpoint-reconstruct a code vector: lo + (q + 0.5)/256 · (hi − lo).
    * The decode every SQ score path shares. */
  def sqDecode(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    require(lo.length == hi.length, "lo/hi must have equal length")
    val loL = typedLit(lo)
    val hiL = typedLit(hi)
    transform(codes, (q, i) => {
      val l = element_at(loL, (i + 1).cast("int"))
      val h = element_at(hiL, (i + 1).cast("int"))
      l + (q.cast("double") + 0.5) / 256.0 * (h - l)
    })
  }

  /** Approximate top-k over an SQ8-encoded corpus: queries broadcast (full
    * precision), corpus rows decode on the fly and score by cosine. Same
    * output shape and tie-break as [[bruteForceTopK]]; only (id, codes)
    * rows — 1 byte/dim — ever leave the corpus scan. */
  def sqTopK(corpusCodes: DataFrame, queries: DataFrame, idCol: String,
      codesCol: String, vecCol: String, lo: Seq[Double], hi: Seq[Double],
      k: Int, roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val c = corpusCodes.select(col(idCol).as("neighbor_id"),
      sqDecode(col(codesCol), lo, hi).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gf.vec_cosine(col("__qv"), col("__cv")), roundTo).as("cosine"))
    topK(scored, k)
  }

  /** Two-stage SQ8 search, mirroring [[ivfPqTopKRefined]]: the top-`rerank`
    * decoded-cosine candidates from [[sqTopK]] join their TRUE vectors by
    * id and re-rank exactly — recall can only improve (the exact-best k of
    * a candidate superset), and only the rerank-sized candidate set ever
    * ships full-precision vectors. */
  def sqTopKRefined(corpusCodes: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, codesCol: String, vecCol: String,
      lo: Seq[Double], hi: Seq[Double], k: Int, rerank: Int = -1,
      roundTo: Int = 6): DataFrame = {
    val r = if (rerank > 0) rerank else 4 * k
    require(r >= k, s"rerank ($r) must be >= k ($k)")
    val cand = sqTopK(corpusCodes, queries, idCol, codesCol, vecCol,
        lo, hi, r, roundTo)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(gf.vec_cosine(col("__qv"), col("__cv")), roundTo).as("cosine"))
    topK(scored, k)
  }

  /** Hard-negative mining for contrastive/retrieval training: per query,
    * the top-`k` most cosine-similar corpus docs that are NOT lexical
    * near-duplicates of it — semantically close (informative negatives)
    * but textually distinct (not just the same doc again; a near-dup
    * labelled "negative" teaches the model the wrong lesson).
    *
    * Shape: candidate generation is [[bruteForceTopK]] over `candidates`
    * ≥ k neighbors (swap in [[sqTopK]]/[[ivfPqTopK]] upstream for the
    * indexed path — any (query_id, neighbor_id, cosine) frame re-ranks the
    * same way via [[hardNegativesFrom]]); only the candidate-sized id set
    * ever joins back to TEXT (corpus text never shuffles wholesale), the
    * n-gram Jaccard verify runs per candidate pair, and survivors re-rank
    * to the final k. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, textCol: String, k: Int, candidates: Int = 0,
      shingleN: Int = 3, tau: Double = 0.5, roundTo: Int = 6): DataFrame = {
    val cand = if (candidates > 0) candidates else 4 * k
    require(cand >= k, s"candidates ($cand) must be >= k ($k)")
    val scored = bruteForceTopK(corpus, queries, idCol, vecCol, cand, roundTo)
    hardNegativesFrom(scored, corpus, queries, idCol, textCol, k,
      shingleN, tau)
  }

  /** Re-rank any candidate frame (query_id, neighbor_id, cosine) into
    * hard negatives: drop pairs whose texts are near-dups
    * (ngram_jaccard ≥ tau), keep the top-k survivors per query. */
  def hardNegativesFrom(scored: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, textCol: String, k: Int,
      shingleN: Int = 3, tau: Double = 0.5): DataFrame = {
    val ct = corpus.select(col(idCol).as("neighbor_id"),
      col(textCol).as("__nt"))
    val qt = queries.select(col(idCol).as("query_id"),
      col(textCol).as("__qt"))
    val verified = scored
      .join(ct, Seq("neighbor_id"))
      .join(broadcast(qt), Seq("query_id"))
      .withColumn("jaccard",
        gf.ngram_jaccard(col("__qt"), col("__nt"), shingleN))
      .where(col("jaccard") < tau)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("jaccard"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    verified.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019 "margin
    * criterion") between two embedding corpora — the bitext/near-parallel
    * miner: raw cosine over-selects hub vectors whose similarity to
    * EVERYTHING is high, so each pair's cosine is normalized by the mean
    * of both endpoints' top-k neighborhoods:
    * margin(a,b) = cos(a,b) / ((avgTopK_a + avgTopK_b) / 2).
    * Pairs with margin ≥ minMargin keep only the per-a argmax (max-margin
    * strategy). Brute-force A×B scoring — the oracle baseline; at scale
    * feed [[marginPairsFrom]] ANN candidates instead (the standard
    * candidate-set approximation of the same criterion). */
  def marginPairs(a: DataFrame, b: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, minMargin: Double = 1.0, roundTo: Int = 6): DataFrame = {
    val av = a.select(col(idCol).as("a_id"),
      col(vecCol).cast("array<double>").as("__av"))
    val bv = b.select(col(idCol).as("b_id"),
      col(vecCol).cast("array<double>").as("__bv"))
    val scored = av.crossJoin(bv)
      .select(col("a_id"), col("b_id"),
        round(gf.vec_cosine(col("__av"), col("__bv")), roundTo).as("cosine"))
    marginPairsFrom(scored, k, minMargin, roundTo)
  }

  /** Margin re-scoring of any (a_id, b_id, cosine) candidate frame — see
    * [[marginPairs]]. Neighborhood means use each side's top-k WITHIN the
    * frame; margins round to `roundTo` before thresholding/ranking so
    * selection is engine-reproducible. Returns (a_id, b_id, cosine,
    * margin), one row per a_id (its max-margin partner). */
  def marginPairsFrom(scored: DataFrame, k: Int = 4,
      minMargin: Double = 1.0, roundTo: Int = 6): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val wA = Window.partitionBy("a_id").orderBy(desc("cosine"), asc("b_id"))
    val wB = Window.partitionBy("b_id").orderBy(desc("cosine"), asc("a_id"))
    // ONE streamed evaluation, zero joins, zero checkpoint: each side's
    // top-k neighborhood mean rides a window over the SAME partitions as
    // its rank (avg of the rank-gated cosine — nulls outside the top-k
    // are ignored, and rank 1 always exists, so the mean is never null).
    // History: r13 re-evaluated the scoring subtree once per consumer
    // (3× BroadcastNestedLoopJoin Cross in q151's plan); r14 checkpointed
    // it, which materializes the QUADRATIC brute-arm frame into block
    // storage — 2× slower at sf0.1 (driver bench) and a job-killer at
    // 100 TB. The window form needs only the two exchanges the ranks
    // already paid (the unordered mean windows reuse the rank windows'
    // partitioning AND sort order) and keeps nothing.
    val m = scored
      .withColumn("__ra", row_number().over(wA))
      .withColumn("__avgA", avg(when(col("__ra") <= k, col("cosine")))
        .over(Window.partitionBy("a_id")))
      .withColumn("__rb", row_number().over(wB))
      .withColumn("__avgB", avg(when(col("__rb") <= k, col("cosine")))
        .over(Window.partitionBy("b_id")))
      .where(col("__avgA") + col("__avgB") > 0)
      .withColumn("margin", round(col("cosine") /
        ((col("__avgA") + col("__avgB")) / 2), roundTo))
      .where(col("margin") >= minMargin)
    val wBest = Window.partitionBy("a_id")
      .orderBy(desc("margin"), asc("b_id"))
    m.withColumn("rank", row_number().over(wBest))
      .where(col("rank") === 1)
      .select(col("a_id"), col("b_id"), col("cosine"), col("margin"))
  }

  /** The SCALE path of margin mining — what a 100 TB corpus pair actually
    * runs: SQ8-encode side B once (1 byte/dim through the candidate scan,
    * [[sqRanges]]/[[sqQuantize]]), take each a's top-`kCand` decoded-cosine
    * candidates ([[sqTopK]] — swap in [[ivfPqTopK]] upstream to go
    * sub-quadratic in candidate GENERATION too), re-score only those
    * candidate pairs on TRUE vectors, and apply the margin criterion
    * within the candidate frame ([[marginPairsFrom]] — neighborhood means
    * are the standard candidate-set approximation of Artetxe & Schwenk's
    * top-k means). Only kCand rows per query ever carry full-precision
    * vectors; nothing quadratic materializes. [[marginPairs]] is the
    * brute-force oracle baseline this approximates. */
  def marginPairsAnn(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, kCand: Int = 16, k: Int = 4, minMargin: Double = 1.0,
      roundTo: Int = 6): DataFrame = {
    val ranges = sqRanges(a.select(col(vecCol))
        .unionAll(b.select(col(vecCol))), col(vecCol))
      .orderBy("dim").collect()
    val lo = ranges.map(_.getDouble(1)).toSeq
    val hi = ranges.map(_.getDouble(2)).toSeq
    val codedB = b.select(col(idCol),
      sqQuantize(col(vecCol), lo, hi).as("__codes"))
    val cand = sqTopK(codedB, a, idCol, "__codes", vecCol, lo, hi,
        kCand, roundTo)
      .select(col("query_id").as("a_id"), col("neighbor_id").as("b_id"))
    // plain hash joins keyed by id: the candidate frame is |A|·kCand rows,
    // and BOTH endpoint tables can be huge in bitext mining — no broadcast
    // hint here (AQE still promotes genuinely small sides on its own)
    val scored = cand
      .join(b.select(col(idCol).as("b_id"),
        col(vecCol).cast("array<double>").as("__bv")), Seq("b_id"))
      .join(a.select(col(idCol).as("a_id"),
        col(vecCol).cast("array<double>").as("__av")), Seq("a_id"))
      .select(col("a_id"), col("b_id"),
        round(gf.vec_cosine(col("__av"), col("__bv")), roundTo).as("cosine"))
    marginPairsFrom(scored, k, minMargin, roundTo)
  }

  // --- PCA / whitening over embedding columns ------------------------------
  //
  // Dimensionality reduction for the embedding side of the pipeline:
  // project 768-dim encoder outputs to the 64 dims that carry the
  // variance before ANN indexing / near-dup search, or whiten them so
  // cosine stops being dominated by the encoder's anisotropic top
  // directions. The expensive half (second moments of the corpus) is ONE
  // aggregation-shaped job; the eigensolve runs on the driver over a
  // d×d matrix ([[graft.core.Jacobi]] — deterministic cyclic sweeps), and
  // projection is a pure scan-side expression.

  /** Second-moment frame behind PCA: one row per (i, j) with j ≥ i holding
    * the exact sum of x_i·x_j, plus per-dim (i, −1) rows holding the exact
    * sum of x_i, and the observation count. Computed by the one-pass
    * [[graft.agg.GramAgg]] aggregate: every term folds IN PLACE into a
    * d(d+3)/2-cell ExactSum buffer per partition (no per-row struct
    * generation — the explode formulation of the same moments measured
    * 256 s for 500k×64-dim vs seconds for the fold), one ~MB buffer per
    * partition ships through the shuffle, and every cell remains a
    * correctly-rounded function of the corpus multiset — bit-identical
    * under any partitioning. Vectors must share one width (ragged input
    * fails fast); null/empty vectors are dropped.
    *
    * `exact = false` switches [[graft.agg.GramAgg]] to its plain-double
    * buffer — mandatory reading at encoder widths: the superaccumulator
    * buffer is ~130 MB/partition at d=768 (4 GB of aggregation state at
    * 32 partitions), the double buffer ~2.4 MB, at the cost of ~1e-12
    * relative fp drift in the moments (and thus last-ulp variation across
    * partitionings). */
  private[graft] def covMoments(df: DataFrame, vecCol: Column,
      exact: Boolean = true): DataFrame = {
    val v = df.select(vecCol.cast("array<double>").as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) > 0)
    v.agg(gf.gram_agg(col("__v"), exact).as("g"))
      .select(col("g.n").as("__n"), explode(col("g.terms")).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.s").as("s"),
        col("__n").as("n"))
  }

  /** Population covariance matrix of an embedding column, upper triangle:
    * (dim_a, dim_b, n, cov) for dim_a ≤ dim_b, cov = E[x_a·x_b] −
    * E[x_a]·E[x_b]. Distributed output (the matrix is d²-sized, not
    * corpus-sized); the corpus is touched exactly once. */
  def covarianceMatrix(df: DataFrame, vecCol: Column,
      exact: Boolean = true): DataFrame = {
    val m = covMoments(df, vecCol, exact)
    val means = m.where(col("j") === -1)
      .select(col("i").as("__k"), (col("s") / col("n")).as("__mean"))
    m.where(col("j") >= 0)
      .join(broadcast(means), col("i") === col("__k"))
      .withColumnRenamed("__mean", "__ma").drop("__k")
      .join(broadcast(means), col("j") === col("__k"))
      .withColumnRenamed("__mean", "__mb").drop("__k")
      .select(col("i").as("dim_a"), col("j").as("dim_b"), col("n"),
        (col("s") / col("n") - col("__ma") * col("__mb")).as("cov"))
  }

  /** Driver-held PCA model: corpus mean, eigenvalues (variance per
    * component, descending) and unit principal components (components(k)
    * is the k-th eigenvector over the original dims). */
  final case class PcaModel(nRows: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  /** Fit PCA: one corpus-scan moment job ([[covMoments]]) + a driver-side
    * deterministic Jacobi eigensolve of the d×d covariance. `k` bounds the
    * retained components (0 = all d). The model is d·(k+1) doubles — ship
    * it anywhere. */
  def pcaFit(df: DataFrame, vecCol: Column, k: Int = 0,
      exact: Boolean = true): PcaModel = {
    val rows = covMoments(df, vecCol, exact).collect()
    require(rows.nonEmpty, "pcaFit: empty corpus")
    val d = rows.iterator.map(_.getInt(0)).max + 1
    val n = rows.find(r => r.getInt(1) == -1).map(_.getLong(3)).getOrElse(0L)
    require(n > 0, "pcaFit: no observations")
    val sums = new Array[Double](d)
    val prods = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val s = r.getDouble(2)
      if (j == -1) sums(i) = s else { prods(i)(j) = s; prods(j)(i) = s }
    }
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      prods(i)(j) / n - mean(i) * mean(j))
    val (evals, evecs) = graft.core.Jacobi.symEigen(cov)
    val kk = if (k > 0) math.min(k, d) else d
    PcaModel(n, mean, evals.take(kk), evecs.take(kk))
  }

  /** Project a vector onto the model's first `k` components (0 = all
    * retained), scan-side: component c's coordinate is dot(v−μ, c),
    * computed as dot(v, c) − dot(μ, c) so the centering is a precomputed
    * scalar and the whole projection stays one fused codegen'd pass over
    * the vector (algebraically identical; ulp-level fp rearrangement). */
  def pcaProject(vec: Column, model: PcaModel, k: Int = 0): Column = {
    val kk = if (k > 0) math.min(k, model.components.length)
      else model.components.length
    array((0 until kk).map { c =>
      val comp = model.components(c)
      var off = 0.0
      var i = 0
      while (i < comp.length) { off += model.mean(i) * comp(i); i += 1 }
      gf.vec_dot(vec.cast("array<double>"), typedLit(comp.toSeq)) - lit(off)
    }: _*)
  }

  /** Whitened projection: each PCA coordinate divided by √eigenvalue, so
    * every retained direction carries unit variance (the anisotropy fix
    * for cosine over encoder embeddings). Components with eigenvalue ≤ 0
    * (numerically degenerate directions) yield 0.0 rather than an
    * explosion. */
  def pcaWhiten(vec: Column, model: PcaModel, k: Int = 0): Column = {
    val kk = if (k > 0) math.min(k, model.components.length)
      else model.components.length
    array((0 until kk).map { c =>
      val ev = model.eigenvalues(c)
      if (ev <= 0.0) lit(0.0)
      else {
        val comp = model.components(c)
        var off = 0.0
        var i = 0
        while (i < comp.length) { off += model.mean(i) * comp(i); i += 1 }
        (gf.vec_dot(vec.cast("array<double>"), typedLit(comp.toSeq)) -
          lit(off)) / lit(math.sqrt(ev))
      }
    }: _*)
  }

  /** Calibrate a near-dup similarity threshold from TARGET PAIR RATES —
    * the step that turns "dedup at cosine ≥ τ" from folklore into a
    * measured choice: given a (sampled) candidate-pair similarity
    * distribution, the threshold for rate r is its (1−r) quantile (exact
    * Catalyst `percentile` — interpolated, engine-standard), reported with
    * the pair count at-or-above it (on 6-dp-rounded similarities, so the
    * census is reproducible across engines).
    *
    * Scale: run it on the ANN/LSH candidate pairs (already bounded), not
    * all pairs; the exact percentile sorts only the similarity COLUMN.
    * NULL/NaN similarities are excluded. */
  def thresholdForRate(pairSims: DataFrame, simCol: Column,
      rates: Seq[Double]): DataFrame = {
    require(rates.nonEmpty && rates.forall(r => r > 0.0 && r < 1.0),
      "rates must be in (0, 1)")
    val sims = pairSims.select(simCol.cast("double").as("__s"))
      .where(col("__s").isNotNull && !isnan(col("__s")))
      .localCheckpoint(true)
    val n = sims.count()
    import pairSims.sparkSession.implicits._
    if (n == 0) {
      CheckpointUtil.freeCheckpoint(sims)
      return Seq.empty[(Double, Double, Long, Long)]
        .toDF("rate", "threshold", "n_pairs", "n_above")
    }
    val aggCols = rates.zipWithIndex.map { case (r, i) =>
      round(percentile(col("__s"), lit(1.0 - r)), 6).as(s"__t$i") }
    val t = sims.agg(aggCols.head, aggCols.tail: _*).head()
    val out = rates.zipWithIndex.map { case (r, i) =>
      val th = t.getDouble(i)
      val above = sims.where(round(col("__s"), 6) >= lit(th)).count()
      (r, th, n, above)
    }
    CheckpointUtil.freeCheckpoint(sims)
    out.toDF("rate", "threshold", "n_pairs", "n_above")
  }

  /** Cross-moment matrix M = Σ x·yᵀ over paired vectors — the sufficient
    * statistic of orthogonal Procrustes alignment. ONE pass: the flattened
    * outer product (d² doubles per row, built in a codegen'd projection)
    * folds through `vec_exact_sum`, so every cell is correctly rounded and
    * partitioning-independent; width consistency is enforced in the same
    * aggregation (NULL/ragged rows fail fast, not silently skew M).
    * Row-major d_x × d_y result on the driver (d² doubles — alignment
    * dims, not corpus data). */
  def crossMoments(pairs: DataFrame, xCol: Column,
      yCol: Column): Array[Array[Double]] = {
    val proj = pairs.select(xCol.cast("array<double>").as("__x"),
        yCol.cast("array<double>").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val outer = flatten(transform(col("__x"),
      xi => transform(col("__y"), yi => xi * yi)))
    val row = proj
      .select(outer.as("__o"), size(col("__x")).as("__dx"),
        size(col("__y")).as("__dy"))
      .agg(gf.vec_exact_sum(col("__o")).as("m"),
        min("__dx").as("dx0"), max("__dx").as("dx1"),
        min("__dy").as("dy0"), max("__dy").as("dy1"))
      .head()
    if (row.isNullAt(0))
      return Array.empty
    require(row.getInt(1) == row.getInt(2) && row.getInt(3) == row.getInt(4),
      "crossMoments: ragged vector widths")
    val (dx, dy) = (row.getInt(1), row.getInt(3))
    val flat = row.getSeq[Double](0)
    Array.tabulate(dx, dy)((i, j) => flat(i * dy + j))
  }

  /** Orthogonal Procrustes fit: the rotation(+reflection) W minimizing
    * ‖XW − Y‖_F over paired vectors — the embedding-space MIGRATION map
    * (encoder v1 → v2, or bilingual alignment à la Artetxe/Conneau:
    * fit W on anchor pairs, then [[procrustesAlign]] re-embeds the whole
    * corpus scan-side and every ANN/dedup structure keeps working).
    *
    * W = U·Vᵀ from the SVD of M = XᵀY, computed deterministically:
    * M via [[crossMoments]] (exact cells), V and σ² from
    * [[graft.core.Jacobi.symEigen]] on MᵀM (fixed sweep order, fixed sign
    * convention), U = M·V·Σ⁻¹. Components with σ ≤ `tol`·σ_max (null
    * directions — only when the pairs don't span the space) are DROPPED
    * from the sum, mapping that subspace to 0; pass vectors that span ℝᵈ
    * for a true orthogonal map.
    *
    * @return row-major d×d W, so aligned = x·W ([[procrustesAlign]])
    */
  def procrustesFit(pairs: DataFrame, xCol: Column, yCol: Column,
      tol: Double = 1e-12): Array[Array[Double]] = {
    val m = crossMoments(pairs, xCol, yCol)
    if (m.isEmpty) return Array.empty
    val d = m.length
    require(m(0).length == d,
      s"procrustes needs square spaces (got ${d}×${m(0).length})")
    val mtm = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < d) { s += m(k)(i) * m(k)(j); k += 1 }
      s
    }
    val (lam, vRows) = graft.core.Jacobi.symEigen(mtm)
    val sigma = lam.map(l => math.sqrt(math.max(l, 0.0)))
    val sMax = if (sigma.isEmpty) 0.0 else sigma.max
    val w = Array.fill(d, d)(0.0)
    var k = 0
    while (k < d) {
      if (sigma(k) > tol * sMax && sigma(k) > 0.0) {
        // u_k = M v_k / σ_k ; W += u_k v_kᵀ
        val v = vRows(k)
        val u = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0
          var j = 0
          while (j < d) { s += m(i)(j) * v(j); j += 1 }
          u(i) = s / sigma(k)
          i += 1
        }
        i = 0
        while (i < d) {
          var j = 0
          while (j < d) { w(i)(j) += u(i) * v(j); j += 1 }
          i += 1
        }
      }
      k += 1
    }
    w
  }

  /** Apply a [[procrustesFit]] map scan-side: out_j = Σ_i x_i·W_ij, one
    * fused dot per output dim against a broadcast literal column — no
    * shuffle, no UDF. */
  def procrustesAlign(vec: Column, w: Array[Array[Double]]): Column = {
    require(w.nonEmpty, "empty alignment map")
    val d = w.length
    array((0 until w(0).length).map { j =>
      gf.vec_dot(vec.cast("array<double>"),
        typedLit((0 until d).map(i => w(i)(j))))
    }: _*)
  }

  /** Semi-hard triplet mining for metric-learning training data
    * (Schroff et al. 2015, FaceNet §3.2): per anchor, positive = the
    * most-similar SAME-label vector, negative = the most-similar
    * DIFFERENT-label vector inside the semi-hard band
    * `cos_pos − margin < cos_neg < cos_pos` (harder than "easy", not yet
    * violating); when the band is empty, fall back to the hardest
    * negative overall with `semi_hard = false` — the standard
    * batch-all fallback, flagged so a trainer can weight it.
    *
    * Anchors with no same-label peer produce no triplet. All argmaxes
    * break ties deterministically by LOWEST candidate id, and every
    * band comparison runs on cosines rounded to `roundTo` — the exact
    * values an external engine reproduces, so selection is
    * engine-portable (no hidden ulp-sensitive branches).
    *
    * This entry is the brute-force in-gate truth (anchors × corpus
    * scored pairs). At scale, generate per-anchor candidates with the
    * indexed paths ([[sqTopK]]/[[ivfPqTopK]] for negatives, the same
    * within-label) and feed the (anchor_id, cand_id, cosine,
    * same_label) frame through [[tripletsFrom]] — selection semantics
    * are identical on any candidate superset that contains the
    * positive and the band. */
  def tripletMine(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, labelCol: String, margin: Double,
      roundTo: Int = 6): DataFrame = {
    val a = anchors.select(col(idCol).as("anchor_id"),
      col(vecCol).cast("array<double>").as("__av"),
      col(labelCol).as("__al"))
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("__cv"),
      col(labelCol).as("__cl"))
    val scored = c.join(broadcast(a), col("anchor_id") =!= col("cand_id"))
      .select(col("anchor_id"), col("cand_id"),
        round(gf.vec_cosine(col("__av"), col("__cv")), roundTo)
          .as("cosine"),
        (col("__al") === col("__cl")).as("same_label"))
    tripletsFrom(scored, margin)
  }

  /** Select triplets from any scored candidate frame
    * (anchor_id, cand_id, cosine, same_label) — see [[tripletMine]].
    * Two group-keyed aggregations (positive pick, then negative pick
    * against the broadcast-sized positive table is NOT assumed —
    * the join is anchor-keyed and shuffles candidate rows once). */
  def tripletsFrom(scored: DataFrame, margin: Double): DataFrame = {
    require(margin > 0, "margin must be > 0")
    // ONE streamed evaluation, zero joins, zero checkpoint: the positive
    // pick rides a window over the SAME anchor partitions the negative
    // aggregation groups by, so the scored frame (quadratic in the brute
    // arm) crosses a single exchange and keeps nothing. History: r13
    // evaluated the subtree once per pick; r14 checkpointed it (block
    // storage of the quadratic frame — the VERDICT-flagged scale trap).
    // max(struct(...)) aggregation is exact (no FP-order sensitivity),
    // so results are bit-identical to the two-pick + join formulation:
    // anchors lacking a same-label peer have a null __p and drop (the
    // old inner join), anchors lacking a different-label peer produce
    // no group row (the old neg aggregation).
    // deterministic argmax: max(struct(cosine, -id)) orders by cosine
    // then by LOWEST id among ties
    val withPos = scored.withColumn("__p",
      max(when(col("same_label"),
        struct(col("cosine").as("c"), (-col("cand_id")).as("nid"))))
        .over(Window.partitionBy("anchor_id")))
    withPos.where(!col("same_label") && col("__p").isNotNull)
      .withColumn("__semi",
        (col("cosine") < col("__p.c")) &&
          (col("cosine") > col("__p.c") - lit(margin)))
      .groupBy("anchor_id")
      .agg(max(col("__p")).as("__pp"),
        max(struct(col("__semi").as("s"), col("cosine").as("c"),
          (-col("cand_id")).as("nid"))).as("__n"))
      .select(col("anchor_id"), (-col("__pp.nid")).as("pos_id"),
        (-col("__n.nid")).as("neg_id"), col("__pp.c").as("cos_pos"),
        col("__n.c").as("cos_neg"), col("__n.s").as("semi_hard"))
  }

  /** `(id, bag)` rows where each token vector is paired with its
    * PRE-COMPUTED L2 norm — the norm is a per-token invariant, so it is
    * evaluated once per row here instead of once per
    * (query-token, doc-token) pair inside the scoring fold (that
    * recomputation roughly doubled the arithmetic of the MaxSim hot
    * path). Zero-norm tokens are DROPPED (their cosine is undefined; a
    * NaN would poison `greatest` and, because NaN orders above every
    * double in Spark, could rank a degenerate document first) and rows
    * whose bag is empty after the drop are refused work — the sibling
    * ops' NULL contract applied to token bags. */
  private def tokenBags(df: DataFrame, idCol: String, vecsCol: String,
      idOut: String, bagOut: String): DataFrame = {
    val toks = filter(
      transform(col(vecsCol).cast("array<array<double>>"),
        v => struct(v.as("v"),
          sqrt(aggregate(v, lit(0.0), (s, x) => s + x * x)).as("n"))),
      t => t.getField("n") > 0)
    df.select(col(idCol).as(idOut), toks.as(bagOut))
      .where(size(col(bagOut)) > 0)
  }

  /** The shared MaxSim fold over two [[tokenBags]] columns:
    * `Σ_q max_d dot(q,d) / (|q|·|d|)`. Keeping the division (rather
    * than pre-dividing the vectors) preserves the exact floating-point
    * sequence of the naive cosine form, so the brute and candidate-fed
    * paths — and the round-6 rank grain — agree bit-for-bit; only the
    * norm COMPUTATION is hoisted into [[tokenBags]]. */
  private def maxSimScore(qBag: Column, dBag: Column): Column = aggregate(
    transform(qBag, qt =>
      aggregate(dBag, lit(Double.MinValue),
        (best, dt) => greatest(best,
          aggregate(zip_with(qt.getField("v"), dt.getField("v"),
            (x, y) => x * y), lit(0.0), (s, x) => s + x)
            / (qt.getField("n") * dt.getField("n"))))),
    lit(0.0), (s, x) => s + x)

  /** Top-k per query at the 1e-6 rounded grain, id ties ascending (the
    * q43 engine-portability convention) — runs as WindowGroupLimit, so
    * each partition keeps only k candidate rows before the shuffle. */
  private def maxSimRank(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("maxsim"), 6).desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Late-interaction (ColBERT-style, Khattab & Zaharia 2020) MaxSim
    * scoring: query and document are each a BAG of token vectors, and
    * `score = Σ_{q∈Q} max_{d∈D} cos(q, d)` — every query token finds
    * its best document token, so fine-grained term matches survive
    * pooling. Returns the top-k documents per query with rank
    * assigned at the 1e-6 rounded grain, id ties ascending (the q43
    * engine-portability convention).
    *
    * This is the brute-force TRUTH path: queries broadcast (bounded —
    * a query batch, never a corpus) and each corpus partition scores
    * its documents scan-side via codegen'd HOF folds; the shuffle is
    * the top-k WindowGroupLimit over (query, score) — candidate rows,
    * not token vectors. The production path is [[maxSimTopKFrom]],
    * which feeds candidates from an ANN index into the same scoring
    * fold. Empty and zero-norm token bags are refused work
    * ([[tokenBags]]). */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecsCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val q = tokenBags(queries, idCol, vecsCol, "query_id", "__qb")
    val c = tokenBags(corpus, idCol, vecsCol, "doc_id", "__db")
    val scored = c.join(broadcast(q), col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"),
        maxSimScore(col("__qb"), col("__db")).as("maxsim"))
    maxSimRank(scored, k)
  }

  /** [[maxSimTopK]]'s PRODUCTION twin (the [[marginPairsFrom]] split):
    * MaxSim-score ONLY a `(query_id, doc_id)` candidate frame — e.g.
    * [[sqTopKRefined]] or [[ivfPqTopK]] over pooled per-document
    * vectors — and return the top-k per query among those candidates.
    * Nothing here is corpus × query: document token bags join onto the
    * candidate rows (ONE candidate-keyed shuffle — bags move for
    * candidates only, never the corpus), query bags broadcast (a query
    * batch), and the top-k runs as WindowGroupLimit over candidate
    * rows. The scoring fold is byte-shared with the brute path, so any
    * (query, doc) pair both paths score gets the identical round-6
    * rank key.
    *
    * Recall against the brute truth is a property of the CANDIDATE
    * GENERATOR, not of this operator — measure it in-gate (a q255-style
    * full-outer agreement receipt against [[maxSimTopK]] on the same
    * inputs), don't assume it. */
  def maxSimTopKFrom(candidates: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecsCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val q = tokenBags(queries, idCol, vecsCol, "query_id", "__qb")
    val c = tokenBags(corpus, idCol, vecsCol, "doc_id", "__db")
    // dedup inside the operator: token-level generators naturally emit
    // the same (query, doc) pair once per matching token, and duplicate
    // scored rows would occupy multiple top-k rank slots
    val scored = candidates.select(col("query_id"), col("doc_id"))
      .distinct()
      .join(c, Seq("doc_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        maxSimScore(col("__qb"), col("__db")).as("maxsim"))
    maxSimRank(scored, k)
  }

  /** Greedy k-center coreset selection (Gonzalez 1985; the diversity
    * sampler of Sener & Savarese 2018's core-set active learning):
    * seed with the smallest id, then k−1 times pick the point FARTHEST
    * from its nearest already-chosen center — a 2-approximation of the
    * optimal covering radius, and the standard "maximally diverse
    * subset" pass over an embedded corpus. Returns one row per center:
    * `(round, center_id, sel_dist)` where `sel_dist` is the max-min
    * SQUARED distance that round (NULL for the seed), plus a final
    * `(k, NULL, radius)` row — the covering radius receipt.
    *
    * Determinism contract: selection compares distances at the 1e-6
    * ROUNDED grain with id tie-breaks (the q43 convention), so
    * engine-level ulp differences cannot flip a pick. Each round is
    * one scan against the BROADCAST center list (≤ k vectors, literal)
    * + a TakeOrdered(1) — k scans total, no shuffle of vectors, no
    * pairwise matrix; the k argmax collects are 1-row (the accepted
    * bounded-collect class).
    *
    * Scale guard: k sequential full-input scans are inherent to
    * Gonzalez, so the input must be BOUNDED — the op counts it first
    * and fails fast above `maxRows` (the `jsMatrix`/`bradleyTerry`
    * guard convention) instead of silently running k corpus scans.
    * For an open-ended corpus use [[kCenterFrom]]: greedy over a
    * bounded candidate frame, exact covering radius over the full
    * corpus. */
  def kCenterGreedy(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, maxRows: Long = 2000000L): DataFrame = {
    val base = prepKCenter(corpus, idCol, vecCol, maxRows, "input")
    val centers = selectCenters(base, k)
    finishKCenter(corpus.sparkSession, centers, base, k)
  }

  /** Candidate-fed [[kCenterGreedy]] (the [[marginPairsFrom]] split):
    * run the k greedy selection scans over a BOUNDED `sample` frame —
    * [[graft.ops.Sampling.uniformSample]], a quality pre-filter, any
    * deterministic slice — but compute the final covering radius over
    * the FULL corpus in one scan against the broadcast center list.
    * The radius row is therefore an EXACT receipt of how well the
    * sampled centers cover everything, not just the sample: sampling
    * weakens the 2-approximation bound, and this is the measurement
    * that says by how much. Output shape matches [[kCenterGreedy]]
    * (`sel_dist` for rounds ≥ 1 is the max-min distance WITHIN the
    * sample; the last row is the corpus-wide radius). */
  def kCenterFrom(sample: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, maxRows: Long = 2000000L): DataFrame = {
    val sbase = prepKCenter(sample, idCol, vecCol, maxRows, "sample")
    val centers = selectCenters(sbase, k)
    val cbase = corpus.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    finishKCenter(corpus.sparkSession, centers, cbase, k)
  }

  private def prepKCenter(df: DataFrame, idCol: String, vecCol: String,
      maxRows: Long, what: String): DataFrame = {
    require(maxRows >= 1, "maxRows must be >= 1")
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val n = base.count()
    require(n <= maxRows,
      s"$n $what rows exceeds maxRows=$maxRows — greedy k-center runs " +
        "k full scans of its input; pre-filter (Sampling.uniformSample " +
        "+ kCenterFrom keeps the exact corpus-radius receipt) or raise " +
        "maxRows deliberately")
    base
  }

  /** Squared distance from `__v` to a literal center vector. */
  private def sqDistTo(c: Seq[Double]): Column = aggregate(
    zip_with(col("__v"), typedLit(c), (x, y) => (x - y) * (x - y)),
    lit(0.0), (acc, x) => acc + x)

  /** The k greedy selection rounds over a prepared (`__id`, `__v`)
    * frame — shared verbatim by the full and candidate-fed paths. */
  private def selectCenters(base: DataFrame,
      k: Int): Vector[(Long, Seq[Double], Option[Double])] = {
    require(k >= 1 && k <= 256, "k must be in [1, 256]")
    val seed = base.orderBy("__id").limit(1)
      .select(col("__id"), col("__v")).collect()
    require(seed.nonEmpty, "selection input is empty")
    var centers = Vector((seed(0).getLong(0), seed(0).getSeq[Double](1)
      .toSeq, Option.empty[Double]))
    var r = 1
    while (r < k) {
      val minDist = centers.map(c => sqDistTo(c._2))
        .reduce((a, b) => least(a, b))
      val pick = base
        .where(!col("__id").isin(centers.map(_._1): _*))
        .select(col("__id"), minDist.as("__d"))
        .orderBy(round(col("__d"), 6).desc, col("__id"))
        .limit(1).collect()
      require(pick.nonEmpty, s"selection input exhausted at round $r")
      // re-fetch the picked vector (1-row lookup) for the next round
      val v = base.where(col("__id") === pick(0).getLong(0))
        .select(col("__v")).collect()(0).getSeq[Double](0).toSeq
      centers :+= ((pick(0).getLong(0), v, Some(pick(0).getDouble(1))))
      r += 1
    }
    centers
  }

  /** One radius scan over `radiusBase` + the output frame. */
  private def finishKCenter(spark: org.apache.spark.sql.SparkSession,
      centers: Vector[(Long, Seq[Double], Option[Double])],
      radiusBase: DataFrame, k: Int): DataFrame = {
    val radius = radiusBase
      .select(centers.map(c => sqDistTo(c._2))
        .reduce((a, b) => least(a, b)).as("__d"))
      .agg(max(col("__d"))).collect()(0).getDouble(0)
    import spark.implicits._
    val rows = centers.zipWithIndex.map { case ((id, _, d), i) =>
      (i.toLong, Option(id), d)
    } :+ ((k.toLong, Option.empty[Long], Some(radius)))
    rows.toDF("round", "center_id", "sel_dist")
  }
}
