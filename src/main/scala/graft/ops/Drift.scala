package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Distribution-drift measurement between two slices of a corpus — the
  * monitoring side of a training-data pipeline: is this week's crawl
  * token-distributed like last week's? does shard 7 look like the rest?
  * did a source swap change the language mix?
  *
  * Everything is computed from ONE categorical count aggregation (one
  * shuffle keyed by category, map-side combine shrinks it to
  * distinct-categories × partitions rows); the count table — vocabulary
  * bounded, corpus-size independent — is localCheckpoint'd so totals and
  * per-category terms never re-scan the corpus. The divergence scalars
  * fan in through [[graft.api.functions.exact_sum]], so results are
  * bit-identical under any partitioning, task retry, or merge tree.
  *
  * Probabilities are additive-smoothed over the OBSERVED vocabulary
  * (union of both sides): `p_i = (cnt_i + alpha) / (N + alpha·V)`.
  * A category present on one side only gets `alpha` pseudo-mass on the
  * other, keeping the KL terms finite; the reference "what changed"
  * pipelines (CCNet, RefinedWeb quality dashboards) use the same rule.
  */
object Drift {

  /** One-row drift summary between the `isA === true` slice (A) and the
    * `isA === false` slice (B) of `df`, over the categorical column
    * `cat`: both KL directions, Jensen–Shannon divergence, and total
    * variation distance (all natural-log, all smoothed), plus the side
    * totals and observed-vocabulary size. Null categories and null
    * side flags are excluded. `alpha` must be positive — it is what
    * keeps one-sided categories finite. */
  def categoricalDrift(df: DataFrame, cat: Column, isA: Column,
      alpha: Double = 0.5): DataFrame = {
    val (cnts, na, nb, v) = sideCounts(df, cat, isA, alpha)
    val (pa, pb) = smoothed(na, nb, v, alpha)
    val m = (pa + pb) / lit(2.0)
    cnts.select(
        (pa * log(pa / pb)).as("__klab"),
        (pb * log(pb / pa)).as("__klba"),
        (lit(0.5) * (pa * log(pa / m) + pb * log(pb / m))).as("__js"),
        (lit(0.5) * abs(pa - pb)).as("__tv"))
      .agg(gf.exact_sum(col("__klab")).as("kl_ab"),
        gf.exact_sum(col("__klba")).as("kl_ba"),
        gf.exact_sum(col("__js")).as("js_div"),
        gf.exact_sum(col("__tv")).as("tv_dist"))
      .select(col("kl_ab"), col("kl_ba"), col("js_div"), col("tv_dist"),
        lit(na).as("n_a"), lit(nb).as("n_b"), lit(v).as("vocab"))
  }

  /** The `k` categories contributing most to the Jensen–Shannon
    * divergence — the "what changed" diagnostic behind
    * [[categoricalDrift]]'s scalar. Output: category, both counts, both
    * smoothed probabilities, the JS contribution, and a dense 1-based
    * rank; ordered by (contribution desc, category asc) so ties are
    * deterministic. Ranking runs as a TakeOrdered (per-partition top-k,
    * k-row driver merge), never a global sort. */
  def topDrifters(df: DataFrame, cat: Column, isA: Column, k: Int,
      alpha: Double = 0.5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val (cnts, na, nb, v) = sideCounts(df, cat, isA, alpha)
    val (pa, pb) = smoothed(na, nb, v, alpha)
    val m = (pa + pb) / lit(2.0)
    val scored = cnts.select(col("category"), col("cnt_a"), col("cnt_b"),
      pa.as("p_a"), pb.as("p_b"),
      (lit(0.5) * (pa * log(pa / m) + pb * log(pb / m))).as("js_term"))
    // the window input is the TakeOrdered limit(k) frame — ≤ k rows by
    // construction, so a single-partition rank is the right plan; the
    // literal partition key declares that intent (and keeps WindowExec's
    // move-everything-to-one-partition warning out of corpus-scale logs)
    scored.orderBy(desc("js_term"), asc("category")).limit(k)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(lit(0))
        .orderBy(desc("js_term"), asc("category"))))
  }

  /** Numeric-column drift via the Population Stability Index — the
    * standard "did this score/length/feature distribution move" monitor.
    * The value range is cut into `bins` equal-population bins by EXACT
    * quantiles of the COMBINED (A ∪ B) distribution (Catalyst
    * `percentile`, the same (n−1)·q interpolation DuckDB's
    * `quantile_cont` computes bit-identically), each row is assigned the
    * bin counting the edges strictly below its value (ties go left), and
    * the binned frame flows through [[categoricalDrift]] — PSI is exactly
    * the symmetrized KL `kl_ab + kl_ba` on those bins. Output adds `psi`
    * and renames the category count to `bins_used` (bins left empty by
    * skew/ties are absent from the observed set, and the α smoothing
    * keeps one-sided bins finite).
    *
    * Scale shape: one exact-quantile aggregation (driver collects
    * `bins−1` doubles), then the one count shuffle of
    * [[categoricalDrift]] keyed by ≤ `bins` values. For corpora whose
    * single-column sort-in-buffer percentile is too hot, compute edges
    * with the t-digest path and pass pre-binned data to
    * [[categoricalDrift]] directly. */
  def numericDrift(df: DataFrame, value: Column, isA: Column,
      bins: Int = 10, alpha: Double = 0.5): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val base = df.where(value.isNotNull && isA.isNotNull)
      .select(value.cast("double").as("__x"), isA.as("__a"))
    val qs = (1 until bins).map(_.toDouble / bins)
    val eRow = base.agg(percentile(col("__x"), typedLit(qs))).collect()(0)
    val edges: Seq[Double] =
      if (eRow.isNullAt(0)) Seq.empty else eRow.getSeq[Double](0).toSeq
    val binCol = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("__x") > lit(e), 1).otherwise(0) }
    categoricalDrift(base.select(binCol.as("__bin"), col("__a")),
        col("__bin"), col("__a"), alpha)
      .select((col("kl_ab") + col("kl_ba")).as("psi"),
        col("kl_ab"), col("kl_ba"), col("js_div"), col("tv_dist"),
        col("n_a"), col("n_b"), col("vocab").as("bins_used"))
  }

  /** Time-series drift: each tumbling event-time window's categorical
    * distribution compared to the PREVIOUS window's — the "did last
    * night's crawl change the mix" monitor, one row per window that has a
    * predecessor: (window_start, js_div, tv_dist, n_prev, n_cur, vocab).
    * Smoothing is over the UNION vocabulary of the two windows (same rule
    * as [[categoricalDrift]] per pair), so a category appearing or
    * vanishing registers as finite drift.
    *
    * Scale shape: ONE (window, category)-keyed count shuffle over the
    * corpus (map-side combined); everything after runs on the
    * windows × categories count table (localCheckpoint'd, corpus-size
    * independent); per-window scalars fan in through `exact_sum`.
    * Tumbling windows only — `windowDuration` must be a valid
    * `INTERVAL` string (e.g. "1 day"). */
  def windowedDrift(df: DataFrame, ts: Column, cat: Column,
      windowDuration: String, alpha: Double = 0.5): DataFrame =
    driftFromCounts(windowedCounts(df, ts, cat, windowDuration),
      windowDuration, alpha)

  /** The corpus-touching HALF of [[windowedDrift]]: the per-(tumbling
    * window, category) count table — (window_start, category, n). This is
    * the only stage whose cost scales with the corpus, and it is a plain
    * windowed count aggregation, so it runs UNCHANGED as a Structured
    * Streaming stateful aggregation: `readStream → withWatermark(tsCol, …)
    * → windowedCounts → writeStream` (append mode finalizes each window
    * once the watermark passes it; state is one counter per open
    * (window, category) — O(open windows × vocabulary), never O(rows),
    * and eviction on window close keeps it from growing). Feed the sink
    * table to [[driftFromCounts]] — the same code path batch uses, so
    * streaming and batch drift agree bit-for-bit on the same counts. */
  def windowedCounts(df: DataFrame, ts: Column, cat: Column,
      windowDuration: String): DataFrame =
    df.where(cat.isNotNull && ts.isNotNull)
      .groupBy(window(ts, windowDuration).as("__w"), cat.as("category"))
      .agg(count(lit(1)).as("n"))
      .select(col("__w.start").as("window_start"), col("category"), col("n"))

  /** The count-table HALF of [[windowedDrift]]: consecutive-window JS/TV
    * from a (window_start, category, n) frame ([[windowedCounts]]'s shape,
    * batch or streamed into a sink). Corpus-size independent — every
    * operand is windows × vocabulary. */
  def driftFromCounts(counts: DataFrame, windowDuration: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, "alpha must be > 0")
    val cnts = counts.select(col("window_start").as("__ws"),
        col("category").as("__c"), col("n").as("__n"))
      .localCheckpoint()
    val step = expr(s"INTERVAL $windowDuration")
    val wins = cnts.select(col("__ws")).distinct()
    // windows whose predecessor window exists
    val paired = wins.join(
      wins.select((col("__ws") + step).as("__ws")), Seq("__ws"), "left_semi")
    // union vocabulary per (current) window: categories of w ∪ w−1
    val un = paired
      .join(cnts.select(col("__ws"), col("__c"))
          .unionAll(cnts.select((col("__ws") + step).as("__ws"), col("__c"))),
        Seq("__ws"))
      .select(col("__ws"), col("__c")).distinct()
    val tot = cnts.groupBy("__ws").agg(sum("__n").as("__t"))
    val vsz = un.groupBy("__ws").agg(count(lit(1)).as("__v"))
    val cur = cnts.withColumnRenamed("__n", "__ncur")
    val prv = cnts.select((col("__ws") + step).as("__ws"), col("__c"),
      col("__n").as("__nprv"))
    val g = un
      .join(cur, Seq("__ws", "__c"), "left")
      .join(prv, Seq("__ws", "__c"), "left")
      .join(tot.withColumnRenamed("__t", "__tc"), Seq("__ws"))
      .join(tot.select((col("__ws") + step).as("__ws"),
        col("__t").as("__tp")), Seq("__ws"))
      .join(vsz, Seq("__ws"))
    val pa = (coalesce(col("__nprv"), lit(0L)) + lit(alpha)) /
      (col("__tp") + lit(alpha) * col("__v"))
    val pb = (coalesce(col("__ncur"), lit(0L)) + lit(alpha)) /
      (col("__tc") + lit(alpha) * col("__v"))
    val m = (pa + pb) / lit(2.0)
    g.select(col("__ws"), col("__tc"), col("__tp"), col("__v"),
        (lit(0.5) * (pa * log(pa / m) + pb * log(pb / m))).as("__js"),
        (lit(0.5) * abs(pa - pb)).as("__tv"))
      .groupBy(col("__ws").as("window_start"))
      .agg(gf.exact_sum(col("__js")).as("js_div"),
        gf.exact_sum(col("__tv")).as("tv_dist"),
        max(col("__tp")).as("n_prev"), max(col("__tc")).as("n_cur"),
        max(col("__v")).as("vocab"))
  }

  /** Pairwise Jensen–Shannon divergence between ALL groups' categorical
    * distributions — the distribution counterpart of
    * `Similarity.centroidCosines`: which sources/languages/shards are
    * distributed alike (mixture design, redundancy maps, "which feeds
    * look the same"). One count aggregation builds the (group, category)
    * table; a dense group × observed-vocabulary grid (zero-filled,
    * α-smoothed over the GLOBAL vocabulary so every pair is comparable)
    * self-joins on category — the grid is groups × vocabulary, corpus-size
    * independent — and per-pair terms fan in through `exact_sum`. Output:
    * (group_a, group_b, js_div) for group_a < group_b, symmetric,
    * deterministic under any partitioning.
    *
    * The grid is groups × GLOBAL vocabulary: fine for the intended
    * category columns (sources, languages, shards, buckets), ruinous for
    * an unbounded one (raw tokens, URLs). `maxVocab` makes that misuse
    * fail fast instead of materializing a billion-cell grid — pre-bucket
    * the category (top-V by count + an "other" bucket) or raise the cap
    * deliberately. */
  def jsMatrix(df: DataFrame, cat: Column, group: Column,
      alpha: Double = 0.5, maxVocab: Long = 1L << 20): DataFrame = {
    require(alpha > 0.0, "alpha must be > 0")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val cnts = df.where(cat.isNotNull && group.isNotNull)
      .groupBy(group.as("__g"), cat.as("__c"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(eager = false)
    val groups = cnts.select(col("__g")).distinct()
    val vocab = cnts.select(col("__c")).distinct()
    val v = vocab.count()
    require(v <= maxVocab,
      s"jsMatrix would build a groups x $v category grid (maxVocab=" +
        s"$maxVocab): the category column looks unbounded - bucket it " +
        "(top-V by count + 'other') or raise maxVocab explicitly")
    val totals = cnts.groupBy("__g").agg(sum("__n").as("__tot"))
    // dense grid: every (group, category) with its smoothed probability
    val grid = groups.crossJoin(vocab)
      .join(cnts, Seq("__g", "__c"), "left")
      .join(totals, Seq("__g"))
      .select(col("__g"), col("__c"),
        ((coalesce(col("__n"), lit(0L)) + lit(alpha)) /
          (col("__tot") + lit(alpha * v))).as("__p"))
    val a = grid.select(col("__g").as("group_a"), col("__c"),
      col("__p").as("__pa"))
    val b = grid.select(col("__g").as("group_b"), col("__c"),
      col("__p").as("__pb"))
    val m = (col("__pa") + col("__pb")) / lit(2.0)
    a.join(b, Seq("__c")).where(col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        (lit(0.5) * (col("__pa") * log(col("__pa") / m)
          + col("__pb") * log(col("__pb") / m))).as("__t"))
      .groupBy("group_a", "group_b")
      .agg(gf.exact_sum(col("__t")).as("js_div"))
  }

  /** Convenience: token-distribution drift — whitespace-tokenize
    * `text` (empty tokens dropped, the corpus tokenization every text
    * op here uses) and delegate to [[categoricalDrift]]. */
  def tokenDrift(df: DataFrame, text: Column, isA: Column,
      alpha: Double = 0.5): DataFrame = {
    val toks = df.select(isA.as("__a"),
        explode(split(text, "\\s+")).as("__w"))
      .where(length(col("__w")) > 0)
    categoricalDrift(toks, col("__w"), col("__a"), alpha)
  }

  /** One count pass: (category, cnt_a, cnt_b) plus the collected side
    * totals and vocabulary size. The checkpoint pins the vocabulary-sized
    * count table so the totals job and the callers' term scans reuse it
    * instead of re-scanning the corpus. */
  private def sideCounts(df: DataFrame, cat: Column, isA: Column,
      alpha: Double): (DataFrame, Long, Long, Long) = {
    require(alpha > 0.0, "alpha must be > 0 (it keeps one-sided categories finite)")
    val cnts = df.where(cat.isNotNull && isA.isNotNull)
      .groupBy(cat.as("category"))
      .agg(count(when(isA, 1)).as("cnt_a"),
        count(when(!isA, 1)).as("cnt_b"))
      .localCheckpoint(eager = false)
    // empty-frame sums are NULL under ANSI; an empty corpus is a valid
    // "no drift observed" input and must not throw
    val t = cnts.agg(coalesce(sum("cnt_a"), lit(0L)),
      coalesce(sum("cnt_b"), lit(0L)), count(lit(1))).collect()(0)
    (cnts, t.getLong(0), t.getLong(1), t.getLong(2))
  }

  /** Two-sample Kolmogorov–Smirnov test between side A and side B of
    * one numeric column — the distribution-shift test that needs no
    * binning (complements [[numericDrift]]'s PSI):
    * `D = max_v |F_A(v) − F_B(v)|`, computed EXACTLY as the integer
    * `d_num = max |c_A·n_B − c_B·n_A|` over cumulative per-distinct-
    * value counts, plus the asymptotic p-value
    * `2·exp(−2D²·n_A·n_B/(n_A+n_B))`. The cross products are held in
    * DECIMAL(38,0) (the [[Eval.auc]] convention — c_A·n_B overflows
    * Int64 past ~3·10⁹ rows per side and would throw under ANSI), so
    * `d_num` is exact at any corpus size; the one float division
    * happens at the very end. One (value)-keyed count aggregation (the
    * only data-keyed shuffle), then cumulatives over the DISTINCT-VALUE
    * cell frame via the distributed two-level prefix sum
    * ([[Packing.withPrefixSumsLong]]) — for a CONTINUOUS score column
    * distinct values ≈ rows, so that frame is itself corpus-sized, and
    * this plan keeps it fully parallel (no single-task global window).
    * For drift tests on raw continuous model scores at scale, prefer
    * [[ksTestSketch]] — two broadcast t-digest blobs, no cell frame at
    * all — and gate it against this exact arm. Returns one row:
    * (n_a, n_b, d_num DECIMAL(38,0), d, p_value). */
  def ksTest(df: DataFrame, value: Column, isA: Column): DataFrame =
    ksTestFromCounts(sideCells(df, value, isA))

  /** [[ksTest]] from an ALREADY-AGGREGATED per-distinct-value count
    * table (columns v, da, db) — the entry point for a streaming
    * monitor whose micro-batches append count PARTIALS (a monoid):
    * fold the partials with one groupBy(v)/sum and hand them here;
    * the result equals the one-shot test exactly. */
  def ksTestFromCounts(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val cum = cumFromCells(cells)
    cum.agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(col("__ca").cast(dec) * col("__nb") -
          col("__cb").cast(dec) * col("__na"))).as("d_num"))
      .withColumn("d", col("d_num").cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double")))
      .withColumn("p_value",
        least(lit(1.0), lit(2.0) * exp(lit(-2.0) * col("d") * col("d")
          * (col("n_a").cast("double") * col("n_b").cast("double"))
          / (col("n_a") + col("n_b")).cast("double"))))
  }

  /** 1-D Wasserstein (earth-mover) distance between side A and side B
    * of one numeric column — the drift number with UNITS (how far mass
    * moved, in the column's own scale), where KS only says whether:
    * `W₁ = ∫ |F_A − F_B| dv = Σ |cumdiff| · Δv` over consecutive
    * distinct values. CONTRACT: the value column must be
    * integer-valued (token counts, lengths, cents — rescale first),
    * so the numerator `Σ |c_A·n_B − c_B·n_A| · Δv` is an exact
    * integer; fractional values would truncate in the Δv cast. The
    * cross products and the Δv-weighted sum are held in DECIMAL(38,0)
    * (the [[Eval.auc]] convention — the product overflows Int64 past
    * ~3·10⁹ rows per side). Same shape as [[ksTest]]: one count
    * shuffle, then one distributed prefix-sum pass that also threads
    * the next-distinct-value lead through its broadcast partition
    * chain. For continuous (non-integer) values use
    * [[wasserstein1Sketch]], whose quantile formulation needs no
    * integer contract. Returns one row:
    * (n_a, n_b, w1_num DECIMAL(38,0), w1). */
  def wasserstein1(df: DataFrame, value: Column,
      isA: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cum = cumFromCells(sideCells(df, value, isA),
      leadOut = Some("__nextv"))
    cum
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        coalesce(sum(when(col("__nextv").isNotNull,
          abs(col("__ca").cast(dec) * col("__nb") -
            col("__cb").cast(dec) * col("__na"))
            * (col("__nextv") - col("__v")).cast(dec))),
          lit(0).cast(dec)).as("w1_num"))
      .withColumn("w1", col("w1_num").cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double")))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) between side A
    * and side B of one numeric column — the distribution-free location
    * test that completes the two-sample family: [[ksTest]] answers
    * "any difference anywhere", [[wasserstein1]] "how much mass moved",
    * this answers "is A stochastically larger" with an effect size.
    * Tie-aware midranks in exact integers (2·midrank = 2·cum_before +
    * f + 1, the q161/zipf convention), so with n_A rows of A:
    *
    *   2R_A = Σ_cells d_A·(2·cum_before + f + 1)      (DECIMAL(38,0))
    *   U_A  = R_A − n_A(n_A+1)/2
    *   σ²   = n_A·n_B/12 · (n+1 − Σ(f³−f)/(n(n−1)))   (tie-corrected)
    *   z    = (U_A − n_A·n_B/2)/σ
    *   r_rb = 2·U_A/(n_A·n_B) − 1                      (rank-biserial)
    *
    * Same scale shape as [[ksTest]]: ONE corpus shuffle into
    * per-distinct-value side counts, then cumulatives over the cell
    * frame via the distributed two-level prefix sum (fully parallel
    * even when continuous scores make that frame corpus-sized); every
    * count product is DECIMAL(38,0) (the ~3·10⁹-rows-per-side LONG
    * bound does not apply). z NULL when σ = 0 (all values tied or a
    * side empty). For raw continuous scores at scale prefer
    * [[mannWhitneySketch]]. Returns one row: (n_a, n_b, u_a, z, r_rb). */
  def mannWhitney(df: DataFrame, value: Column, isA: Column): DataFrame =
    mannWhitneyFromCounts(sideCells(df, value, isA))

  /** [[mannWhitney]] from an ALREADY-AGGREGATED per-distinct-value
    * count table (columns v, da, db) — the monoid entry point, same
    * contract as [[ksTestFromCounts]]: fold micro-batch partials with
    * one groupBy(v)/sum and the result equals the one-shot test. */
  def mannWhitneyFromCounts(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val cum = cumFromCells(cells)
    val f = (col("__da") + col("__db")).cast(dec)
    val cumBefore = (col("__ca") + col("__cb")).cast(dec) - f
    val agg = cum.agg(
      max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
      coalesce(sum(col("__da").cast(dec) *
        (lit(2).cast(dec) * cumBefore + f + lit(1).cast(dec))),
        lit(0).cast(dec)).as("__r2a"),
      coalesce(sum(f * f * f - f), lit(0).cast(dec)).as("__ties"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    // U_A = (2R_A − 2·nA(nA+1)/2)/2, kept doubled until the final halve
    val uA = (col("__r2a").cast("double") - na * (na + 1)) / 2.0
    val sigma2 = na * nb / 12.0 *
      (n + 1 - col("__ties").cast("double") / (n * (n - 1)))
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, uA).as("u_a"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0,
        (uA - na * nb / 2.0) / sqrt(sigma2)).as("z"),
      when(col("n_a") > 0 && col("n_b") > 0,
        lit(2.0) * uA / (na * nb) - 1.0).as("r_rb"))
  }

  /** Shared reduction of the two-sample SKETCH arms: ONE side-tagged
    * scan folds BOTH sides into t-digests in a single aggregation (the
    * aggregate skips null inputs, so each digest sees only its side),
    * KB-scale blobs deserialized driver-side. The whole corpus is read
    * once; nothing shuffles but sketch partials. */
  private def sideDigests(df: DataFrame, value: Column, isA: Column,
      compression: Double): (graft.core.TDigest, graft.core.TDigest) = {
    val v = value.cast("double")
    val a = isA.cast("boolean")
    val row = df.where(v.isNotNull && a.isNotNull)
      .select(v.as("__v"), a.as("__a"))
      .agg(gf.tdigest(when(col("__a"), col("__v")), lit(1.0), compression),
        gf.tdigest(when(!col("__a"), col("__v")), lit(1.0), compression))
      .head
    (graft.core.TDigest.deserialize(row.getAs[Array[Byte]](0)),
      graft.core.TDigest.deserialize(row.getAs[Array[Byte]](1)))
  }

  private def oneRow(df: DataFrame)(cols: Column*): DataFrame =
    df.sparkSession.range(1).select(cols: _*)

  /** [[ksTest]]'s PRODUCTION twin for CONTINUOUS score columns — the
    * §8.3 dual-path convention ([[Robust.quantileNormalizeSketch]]'s
    * shape): the exact arm's distinct-value cell frame is corpus-sized
    * when scores are continuous; this arm needs no cell frame at all.
    * ONE side-tagged scan folds both sides into t-digests; D̂ is the
    * max of |F̂_A(x) − F̂_B(x)| over the UNION of both digests'
    * `probes`-point quantile grids (the candidate set that brackets
    * the digests' own CDF breakpoints), evaluated driver-side on the
    * two KB blobs. Error is the digests' CDF error (~1% at compression
    * 200) — gate it against the exact arm (q333's receipt), don't
    * assume it. The asymptotic p-value uses the same formula as
    * [[ksTest]]. Returns one row: (n_a, n_b, d, p_value) — NULL
    * d/p_value when either side is empty. */
  def ksTestSketch(df: DataFrame, value: Column, isA: Column,
      compression: Double = 200.0, probes: Int = 1024): DataFrame = {
    require(probes >= 2 && probes <= 65536, "probes must be in [2, 65536]")
    val (ta, tb) = sideDigests(df, value, isA, compression)
    val (na, nb) = (math.round(ta.totalSize), math.round(tb.totalSize))
    if (na == 0 || nb == 0)
      return oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(null).cast("double").as("d"),
        lit(null).cast("double").as("p_value"))
    val grid = (0 to probes).map(_.toDouble / probes).toArray
    val xs = (ta.quantiles(grid) ++ tb.quantiles(grid)).distinct
    val d = xs.map(x => math.abs(ta.cdf(x) - tb.cdf(x))).max
    val nAB = na.toDouble * nb.toDouble
    val p = math.min(1.0, 2.0 * math.exp(-2.0 * d * d * nAB / (na + nb)))
    oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"), lit(d).as("d"),
      lit(p).as("p_value"))
  }

  /** [[wasserstein1]]'s PRODUCTION twin — and the arm WITHOUT the
    * integer-value contract: the quantile formulation
    * `W₁ = ∫₀¹ |Q_A(p) − Q_B(p)| dp`, evaluated by the midpoint rule
    * on `probes` equispaced p's over the two driver-side digests, is
    * well-defined for any continuous column. Same single side-tagged
    * scan as [[ksTestSketch]]; gate the approximation against the
    * exact arm where that arm's contract holds. Returns one row:
    * (n_a, n_b, w1) — NULL w1 when either side is empty. */
  def wasserstein1Sketch(df: DataFrame, value: Column, isA: Column,
      compression: Double = 200.0, probes: Int = 4096): DataFrame = {
    require(probes >= 2 && probes <= 65536, "probes must be in [2, 65536]")
    val (ta, tb) = sideDigests(df, value, isA, compression)
    val (na, nb) = (math.round(ta.totalSize), math.round(tb.totalSize))
    if (na == 0 || nb == 0)
      return oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(null).cast("double").as("w1"))
    val mids = Array.tabulate(probes)(i => (i + 0.5) / probes)
    val (qa, qb) = (ta.quantiles(mids), tb.quantiles(mids))
    var acc = 0.0
    var i = 0
    while (i < probes) { acc += math.abs(qa(i) - qb(i)); i += 1 }
    oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"),
      lit(acc / probes).as("w1"))
  }

  /** [[mannWhitney]]'s PRODUCTION twin: `U_A/(n_A·n_B) = P(A > B) +
    * ½P(A = B) = E_A[midCDF_B(x)]`, evaluated by the midpoint rule —
    * average of `F̂_B(Q̂_A(p))` over `probes` equispaced p's (the
    * digest CDF interpolates mid-rank at point masses, matching the
    * exact arm's midrank convention). The normal z uses the
    * UNCORRECTED σ² = n_A·n_B·(n+1)/12 — tie correction needs the
    * per-value tie census the sketch deliberately does not keep; for
    * heavily tied (discrete) columns use the exact arm, whose cell
    * frame is bounded there anyway. Same single side-tagged scan.
    * Returns one row: (n_a, n_b, u_a, z, r_rb) — NULL when a side is
    * empty, z NULL when σ = 0. */
  def mannWhitneySketch(df: DataFrame, value: Column, isA: Column,
      compression: Double = 200.0, probes: Int = 4096): DataFrame = {
    require(probes >= 2 && probes <= 65536, "probes must be in [2, 65536]")
    val (ta, tb) = sideDigests(df, value, isA, compression)
    val (na, nb) = (math.round(ta.totalSize), math.round(tb.totalSize))
    if (na == 0 || nb == 0)
      return oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(null).cast("double").as("u_a"),
        lit(null).cast("double").as("z"),
        lit(null).cast("double").as("r_rb"))
    val mids = Array.tabulate(probes)(i => (i + 0.5) / probes)
    val cdfs = tb.cdfs(ta.quantiles(mids))
    var acc = 0.0
    var i = 0
    while (i < probes) { acc += cdfs(i); i += 1 }
    val uFrac = acc / probes
    val nAB = na.toDouble * nb.toDouble
    val uA = uFrac * nAB
    val sigma2 = nAB * (na + nb + 1.0) / 12.0
    val z =
      if (sigma2 > 0) lit((uA - nAB / 2.0) / math.sqrt(sigma2))
      else lit(null).cast("double")
    oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"), lit(uA).as("u_a"),
      z.as("z"), lit(2.0 * uFrac - 1.0).as("r_rb"))
  }

  /** Welch's unequal-variance t-test (Welch 1947) between side A and
    * side B of one numeric column — the mean-shift test to reach for
    * when KS/U answer "differently distributed" but the question is
    * "how far apart are the MEANS, in units of their noise":
    *
    *   t  = (x̄_A − x̄_B) / √(s²_A/n_A + s²_B/n_B)
    *   ν  = (s²_A/n_A + s²_B/n_B)² /
    *          [(s²_A/n_A)²/(n_A−1) + (s²_B/n_B)²/(n_B−1)]
    *
    * plus the standardized effect sizes the test statistic alone
    * hides: Cohen's d on the pooled SD and its small-sample Hedges' g
    * correction `g = d·(1 − 3/(4(n_A+n_B) − 9))`. Returns one row
    * `(n_a, n_b, mean_a, mean_b, var_a, var_b, t, dof, cohen_d,
    * hedges_g)` — mean NULL on an empty side, var/t/dof NULL when
    * either side has < 2 members, d/g NULL when the pooled SD is 0.
    *
    * Shape: ONE moment fold (count/Σx/Σx² per side through
    * [[graft.api.functions.exact_sum]]) — no cell frame at all, so no
    * distinct-value-cardinality contract; bit-identical on any
    * partitioning. */
  def welchTTest(df: DataFrame, value: Column, isA: Column): DataFrame = {
    val v = value.cast("double")
    val a = isA.cast("boolean")
    val agg = df.where(v.isNotNull && a.isNotNull).agg(
      count(when(a, 1)).as("n_a"), count(when(!a, 1)).as("n_b"),
      gf.exact_sum(when(a, v)).as("__sa"),
      gf.exact_sum(when(a, v * v)).as("__qa"),
      gf.exact_sum(when(!a, v)).as("__sb"),
      gf.exact_sum(when(!a, v * v)).as("__qb"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val meanA = when(col("n_a") > 0, col("__sa") / na)
    val meanB = when(col("n_b") > 0, col("__sb") / nb)
    val varA = when(col("n_a") >= 2,
      (col("__qa") - col("__sa") * col("__sa") / na) / (na - 1))
    val varB = when(col("n_b") >= 2,
      (col("__qb") - col("__sb") * col("__sb") / nb) / (nb - 1))
    val se2 = varA / na + varB / nb
    val t = when(se2 > 0, (meanA - meanB) / sqrt(se2))
    val dof = when(se2 > 0, se2 * se2 /
      (varA * varA / (na * na * (na - 1))
        + varB * varB / (nb * nb * (nb - 1))))
    val sp2 = when(col("n_a") + col("n_b") >= 3,
      ((na - 1) * varA + (nb - 1) * varB) / (na + nb - 2))
    val d = when(sp2 > 0, (meanA - meanB) / sqrt(sp2))
    agg.select(col("n_a"), col("n_b"),
      meanA.as("mean_a"), meanB.as("mean_b"),
      varA.as("var_a"), varB.as("var_b"), t.as("t"), dof.as("dof"),
      d.as("cohen_d"),
      (d * (lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9)))
        .as("hedges_g"))
  }

  /** Paired t-test on per-row differences `x − y` — [[welchTTest]]'s
    * PAIRED sibling, for the design where both measurements live on
    * the SAME row (model A's score and model B's score of one
    * document): pairing removes the between-item variance the
    * unpaired test must power through. One exact_sum moment fold on
    * d = x − y:
    *
    *   t = d̄ / (s_d / √n),   dof = n − 1
    *
    * Returns one row `(n, mean_diff, sd_diff, t, dof)` — sd/t NULL
    * when n < 2 or s_d = 0 (all pairs differ identically — report the
    * exact mean_diff, not a fabricated infinite t). Rows with either
    * side NULL are refused work (no silent zero-fill of a missing
    * measurement). */
  def pairedTTest(df: DataFrame, xCol: Column, yCol: Column)
      : DataFrame = {
    val d = xCol.cast("double") - yCol.cast("double")
    val agg = df.where(xCol.isNotNull && yCol.isNotNull).agg(
      count(lit(1)).as("n"),
      gf.exact_sum(d).as("__s"),
      gf.exact_sum(d * d).as("__q"))
    val n = col("n").cast("double")
    val meanD = when(col("n") > 0, col("__s") / n)
    val varD = when(col("n") >= 2,
      (col("__q") - col("__s") * col("__s") / n) / (n - 1))
    val t = when(varD > 0, meanD / sqrt(varD / n))
    agg.select(col("n"), meanD.as("mean_diff"),
      sqrt(varD).as("sd_diff"), t.as("t"),
      when(col("n") >= 2, n - 1).as("dof"))
  }

  /** Two-sample Cramér–von Mises criterion (Anderson 1962) between
    * side A and side B of one numeric column — the whole-curve
    * companion to [[ksTest]]: where KS scores only the single worst
    * CDF gap, CvM integrates the squared gap over the pooled sample,
    * so many small shifts register that a one-point excursion-seeker
    * misses:
    *
    *   T = n_A·n_B/(n_A+n_B)² · Σ_v f_v · (F_A(v) − F_B(v))²
    *
    * summed over the distinct pooled values with multiplicity `f_v`
    * and right-continuous CDFs at `v` (the tie convention: ties
    * contribute their full post-tie gap once per tied row — the same
    * cells [[ksTest]] maxes over). Returns one row
    * `(n_a, n_b, t_stat)` — NULL t_stat when either side is empty.
    * Under H₀, `T` concentrates near 1/6; values ≳ 0.46 reject at 5%.
    *
    * Shape: the shared cell-frame recipe — one distinct-value count
    * shuffle, cumulatives from the distributed prefix sum, exact
    * DECIMAL(38,0) cross products per cell (one float division each),
    * terms fanned in through exact_sum. */
  def cramerVonMises(df: DataFrame, value: Column, isA: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val cum = cumFromCells(sideCells(df, value, isA))
    val diff = (col("__ca").cast(dec) * col("__nb")
      - col("__cb").cast(dec) * col("__na")).cast("double")
    val nab = col("__na").cast("double") * col("__nb").cast("double")
    val term = (col("__da") + col("__db")).cast("double") *
      (diff / nab) * (diff / nab)
    val agg = cum.agg(max(col("__na")).as("n_a"),
      max(col("__nb")).as("n_b"), gf.exact_sum(term).as("__s"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        na * nb / ((na + nb) * (na + nb)) * col("__s")).as("t_stat"))
  }

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952) — [[mannWhitney]]'s
    * k-group generalization and [[Profile.anovaF]]'s rank-based
    * sibling: "do these k sources/shards draw from the same score
    * distribution?", robust to the heavy tails that wreck a mean-based
    * F. Tie-aware midranks over the pooled sample:
    *
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
    *   C = 1 − Σ_v (f_v³ − f_v)/(N³ − N),   h_adj = H / C
    *
    * Returns one row `(n, k, h, c_ties, h_adj)` — H NULL when k < 2 or
    * N ≤ 1; h_adj NULL when every value is tied (C = 0). Under H₀,
    * H ~ χ²(k−1). NULL categories/values are refused work.
    *
    * Shape: one distinct-value census (midranks integral as 2·midrank
    * via the distributed prefix sum — the [[mannWhitney]] convention),
    * one (group, value) count shuffle joined back on value, per-group
    * rank sums in DECIMAL(38,0) (2·R_g ≤ 2N² overflows Int64 past
    * ~2·10⁹ rows), tie cubes in DECIMAL(38,0); floats only in the
    * final one-row assembly. */
  def kruskalWallis(df: DataFrame, cat: Column, value: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val v = value.cast("double")
    val base = df.where(cat.isNotNull && v.isNotNull)
      .select(cat.as("__g"), v.as("__v"))
    val vCells = base.groupBy(col("__v")).agg(count(lit(1)).as("__f"))
    val cum = Packing.withPrefixSumsLong(vCells, Seq("__v"),
        sums = Seq("__f" -> "__cf"), totals = Seq("__f" -> "__n"))
      .withColumn("__mr2", lit(2) * col("__cf") - col("__f") + 1)
    val tie = cum.agg(
      coalesce(sum(col("__f").cast(dec) * col("__f") * col("__f")
        - col("__f")), lit(0).cast(dec)).as("__ties"),
      coalesce(max(col("__n")), lit(0L)).as("__nTot")).collect()(0)
    val (ties, nTot) =
      (tie.getDecimal(0), tie.getLong(1))
    val gv = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__ngv"))
      .join(cum.select(col("__v"), col("__mr2")), Seq("__v"))
    val perG = gv.groupBy(col("__g")).agg(
      sum(col("__ngv")).as("__ng"),
      sum(col("__ngv").cast(dec) * col("__mr2").cast(dec)).as("__r2"))
    val agg = perG.agg(
      coalesce(sum(col("__ng")), lit(0L)).as("n"),
      count(lit(1)).as("k"),
      gf.exact_sum(col("__r2").cast("double") * col("__r2").cast("double")
        / (lit(4.0) * col("__ng").cast("double"))).as("__s"))
    val nD = col("n").cast("double")
    val h = when(col("k") >= 2 && col("n") > 1,
      lit(12.0) / (nD * (nD + 1)) * col("__s") - lit(3.0) * (nD + 1))
    // C from the driver-collected exact decimals: N³−N is exact there
    val c =
      if (nTot <= 1) lit(null).cast("double")
      else lit(java.math.BigDecimal.ONE.subtract(
        ties.divide(java.math.BigDecimal.valueOf(nTot).pow(3)
          .subtract(java.math.BigDecimal.valueOf(nTot)),
          java.math.MathContext.DECIMAL64)).doubleValue())
    agg.select(col("n"), col("k"), h.as("h"), c.as("c_ties"),
      when(c > 0, h / c).as("h_adj"))
  }

  /** Per-distinct-value side counts (v, da, db) from a raw two-sided
    * feed — the one corpus-sized shuffle of the KS/W₁ family. NULL
    * values/sides are refused work. */
  private def sideCells(df: DataFrame, value: Column,
      isA: Column): DataFrame = {
    val v = value.cast("double")
    val a = isA.cast("boolean")
    df.where(v.isNotNull && a.isNotNull)
      .groupBy(v.as("v"))
      .agg(sum(a.cast("long")).as("da"),
        sum((!a).cast("long")).as("db"))
  }

  /** Shared KS/W₁/U frame: cumulative side counts over the distinct-
    * value cell frame plus the side totals. The cumulatives run through
    * [[Packing.withPrefixSumsLong]]'s two-level distributed prefix sum
    * (range shuffle + partition-local windows + broadcast offsets) — for
    * a CONTINUOUS score column the cell frame is corpus-sized, and a
    * global single-partition window would serialize it through one
    * task; this plan is fully parallel and bit-exact regardless. The
    * optional `leadOut` threads W₁'s next-distinct-value through the
    * same pass. */
  private def cumFromCells(cellsIn: DataFrame,
      leadOut: Option[String] = None): DataFrame = {
    val cells = cellsIn.select(col("v").cast("double").as("__v"),
      col("da").cast("long").as("__da"),
      col("db").cast("long").as("__db"))
    Packing.withPrefixSumsLong(cells, Seq("__v"),
      sums = Seq("__da" -> "__ca", "__db" -> "__cb"),
      totals = Seq("__da" -> "__na", "__db" -> "__nb"),
      leadOut = leadOut)
  }

  /** EWMA control chart (Roberts 1959; the NIST-handbook formulation
    * with finite-history normalization) over per-group ordered series —
    * the pipeline-monitoring pass that flags "today's ingest volume /
    * dedup rate / mean quality is off its own recent baseline":
    *
    *   baseline_t = Σ_{j=1..m} (1−α)^(j−1) · x_{t−j} / Σ (1−α)^(j−1)
    *   ewvar_t    = Σ w_j (x_{t−j} − baseline_t)² / Σ w_j
    *   z_t        = (x_t − baseline_t) / √ewvar_t,  flag = |z| > k
    *
    * The baseline uses only PRECEDING points (a monitor must not let
    * today's anomaly defend itself), truncated to the last `window`
    * points and weight-normalized over the history that exists, so
    * early points are usable immediately. First point of each series
    * (no history) reports NULL baseline/z, flag false; zero variance
    * (constant history) flags any deviation, reporting z = NULL.
    *
    * Scale shape: the series are GROUPED (one window exchange,
    * group-bounded partitions); the preceding frame materializes ≤
    * `window` doubles per row and folds scan-side, so cost is rows ×
    * window, not rows². Deterministic: folds run in frame order —
    * which requires a TOTAL order. When `(groupCols, orderCol)` keys
    * can repeat, pass `tieCol` (the [[Reward.discountedReturns]]
    * convention) so the preceding-history frame does not depend on
    * partitioning; without it, uniqueness of the keys is the caller's
    * contract. */
  def ewmaMonitor(df: DataFrame, groupCols: Seq[String],
      orderCol: Column, valueCol: Column, alpha: Double = 0.3,
      window: Int = 32, k: Double = 3.0,
      tieCol: Option[Column] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(window >= 1 && window <= 1024, "window must be in [1, 1024]")
    require(k > 0, "k must be > 0")
    val reserved = Seq("ewma", "ewvar", "z", "flag", "__h", "__x")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(orderCol +: tieCol.toSeq: _*)
      .rowsBetween(-window, -1)
    val x = valueCol.cast("double")
    val hist = collect_list(x).over(w) // oldest → newest, ≤ window
    val base = df.withColumn("__h", hist).withColumn("__x", x)
    val n = size(col("__h"))
    // weight of element i (0-based, oldest first) is (1−α)^(n−1−i)
    def wgt(i: Column) = pow(lit(1.0 - alpha), (n - 1 - i).cast("double"))
    val idx = sequence(lit(0), n - 1)
    val wsum = aggregate(idx, lit(0.0), (s, i) => s + wgt(i))
    val wx = aggregate(idx, lit(0.0),
      (s, i) => s + wgt(i) * element_at(col("__h"), i + 1))
    val withBase = base
      .withColumn("ewma", when(n > 0, wx / wsum))
      .withColumn("ewvar", when(n > 0, aggregate(idx, lit(0.0),
        (s, i) => s + wgt(i) *
          (element_at(col("__h"), i + 1) - col("ewma")) *
          (element_at(col("__h"), i + 1) - col("ewma"))) / wsum))
    withBase
      .withColumn("z",
        when(col("ewvar") > 0, (col("__x") - col("ewma")) /
          sqrt(col("ewvar"))))
      .withColumn("flag",
        when(col("ewma").isNull, lit(false))
          .when(col("ewvar") > 0, abs(col("z")) > k)
          .otherwise(col("__x") =!= col("ewma")))
      .drop("__h", "__x")
  }

  /** Jonckheere–Terpstra test (Jonckheere 1954, Terpstra 1952) — the
    * ORDERED-alternative k-group rank test: [[kruskalWallis]] asks "do
    * these k slices differ at all?", JT spends all its power on "does
    * the value RISE with the ordered dose" (quality score vs dedup
    * aggressiveness level, loss vs data age bucket) — the rank-side
    * sibling of [[graft.ops.Eval.cochranArmitage]]. JT is the sum of
    * the k(k−1)/2 pairwise Mann–Whitney counts in dose order
    * (ties count ½):
    *
    *   JT = Σ_{i<j} Σ_v f_j(v)·(F_i(v⁻) + ½ f_i(v))
    *   E  = (N² − Σ nᵢ²)/4
    *   Var (tie-corrected, Hollander & Wolfe eq. 6.19) =
    *     A/72 + B_g·B_t/(36N(N−1)(N−2)) + C_g·C_t/(8N(N−1))
    *
    * with A = N(N−1)(2N+5) − Σᵢnᵢ(nᵢ−1)(2nᵢ+5) − Σ_v t_v(t_v−1)(2t_v+5),
    * B_g = Σᵢnᵢ(nᵢ−1)(nᵢ−2), B_t = Σ_v t_v(t_v−1)(t_v−2),
    * C_g = Σᵢnᵢ(nᵢ−1), C_t = Σ_v t_v(t_v−1). Returns one row
    * `(n, k, jt, e_jt, var_jt, z)` — z NULL when Var ≤ 0 (all values
    * tied). NULL groups/values are refused work.
    *
    * Shape: one (group, value) count shuffle; the per-group cumulative
    * layers ride ONE [[Packing.withPrefixSumsLong]] two-level pass
    * over the distinct-value frame (k prefix columns in one shuffle —
    * fully parallel even when continuous values make that frame
    * corpus-sized); every pair product is DECIMAL(38,0). Group labels
    * are collected (guarded by `maxGroups` — doses are a handful of
    * levels); group-side moment terms are exact BigInt driver
    * arithmetic on the k collected totals. */
  def jonckheereTerpstra(df: DataFrame, groupCol: Column, value: Column,
      maxGroups: Int = 64): DataFrame = {
    val dec = "decimal(38,0)"
    val g = groupCol.cast("double")
    val v = value.cast("double")
    val base = df.where(g.isNotNull && v.isNotNull)
      .select(g.as("__g"), v.as("__v"))
    val cells = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__f")).localCheckpoint(eager = false)
    val gTotals = cells.groupBy(col("__g"))
      .agg(sum(col("__f")).as("__n")).orderBy(col("__g"))
      .limit(maxGroups + 1).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    require(gTotals.length >= 2, "need at least 2 ordered groups")
    require(gTotals.length <= maxGroups,
      s"more than maxGroups=$maxGroups ordered groups — JT is a " +
        "dose-level test; bucket the dose first")
    val k = gTotals.length
    val byV = cells.groupBy(col("__v")).agg(
      coalesce(sum(when(col("__g") === gTotals(0)._1, col("__f"))),
        lit(0L)).as("__f0"),
      (1 until k).map(i =>
        coalesce(sum(when(col("__g") === gTotals(i)._1, col("__f"))),
          lit(0L)).as(s"__f$i")): _*)
    val cum = Packing.withPrefixSumsLong(byV, Seq("__v"),
      sums = (0 until k).map(i => s"__f$i" -> s"__c$i"))
    val contrib = (for { j <- 1 until k; i <- 0 until j } yield
      col(s"__f$j").cast(dec) *
        (lit(2).cast(dec) * (col(s"__c$i") - col(s"__f$i")).cast(dec)
          + col(s"__f$i").cast(dec))).reduce(_ + _)
    val tv = (0 until k).map(i => col(s"__f$i").cast(dec)).reduce(_ + _)
    val one = lit(1).cast(dec)
    val row = cum.agg(
      coalesce(sum(contrib), lit(0).cast(dec)).as("__jt2"),
      coalesce(sum(tv * (tv - one)
        * (lit(2).cast(dec) * tv + lit(5).cast(dec))),
        lit(0).cast(dec)).as("__ta"),
      coalesce(sum(tv * (tv - one) * (tv - lit(2).cast(dec))),
        lit(0).cast(dec)).as("__tb"),
      coalesce(sum(tv * (tv - one)), lit(0).cast(dec)).as("__tc"))
      .collect()(0)
    def big(i: Int): BigInt = BigInt(row.getDecimal(i).toBigInteger)
    val (jt2, tA, tB, tC) = (big(0), big(1), big(2), big(3))
    val ns = gTotals.map(t => BigInt(t._2))
    val nBig = ns.sum
    val n = nBig.toDouble
    val eNum = (nBig * nBig - ns.map(x => x * x).sum).toDouble
    val aBig = nBig * (nBig - 1) * (2 * nBig + 5) -
      ns.map(x => x * (x - 1) * (2 * x + 5)).sum - tA
    val bG = ns.map(x => x * (x - 1) * (x - 2)).sum
    val cG = ns.map(x => x * (x - 1)).sum
    val varJt =
      if (nBig < 3) Double.NaN
      else aBig.toDouble / 72.0 +
        bG.toDouble * tB.toDouble / (36.0 * n * (n - 1) * (n - 2)) +
        cG.toDouble * tC.toDouble / (8.0 * n * (n - 1))
    val jt = jt2.toDouble / 2.0
    val eJt = eNum / 4.0
    oneRow(df)(lit(nBig.toLong).as("n"), lit(k.toLong).as("k"),
      lit(jt).as("jt"), lit(eJt).as("e_jt"),
      (if (varJt > 0) lit(varJt) else lit(null).cast("double"))
        .as("var_jt"),
      (if (varJt > 0) lit((jt - eJt) / math.sqrt(varJt))
       else lit(null).cast("double")).as("z"))
  }

  /** Brunner–Munzel test (Brunner & Munzel 2000) — the
    * nonparametric-Behrens–Fisher companion to [[mannWhitney]]: MW's z
    * assumes the two sides share a variance-of-ranks; when one slice
    * is both shifted AND differently spread (a new crawl source with
    * wider quality spread), BM stays calibrated where MW over-rejects.
    * Estimates p̂ = P(X_A < X_B) + ½P(=) with a studentized statistic
    * and Welch-style dof:
    *
    *   t = n_A·n_B (R̄_B − R̄_A) / (N √(n_A S_A² + n_B S_B²))
    *   S_i² = Var over side i of (combined midrank − within-side
    *          midrank),  dof per Welch–Satterthwaite
    *
    * Returns one row `(n_a, n_b, p_hat, t, dof)` — t/dof NULL when
    * either side has < 2 members or both placement variances vanish
    * (every pair tied). NULL values/sides are refused work.
    *
    * Shape: the [[ksTest]] cell recipe — ONE corpus shuffle into
    * per-distinct-value side counts, cumulatives via the distributed
    * two-level prefix sum; placements are DOUBLED midranks
    * (2·G_B(v) = 2·cumB − dB, integers), every moment folds in
    * DECIMAL(38,0), floats only in the final one-row assembly —
    * bit-identical on any partitioning. */
  def brunnerMunzel(df: DataFrame, value: Column, isA: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val cum = cumFromCells(sideCells(df, value, isA))
    // doubled combined midrank and doubled within/cross placements —
    // all exact LONG arithmetic on the cell frame
    val mr2 = lit(2) * (col("__ca") + col("__cb")) -
      (col("__da") + col("__db")) + 1
    val xA = (lit(2) * col("__cb") - col("__db")).cast(dec) // 2·G_B(v)
    val xB = (lit(2) * col("__ca") - col("__da")).cast(dec) // 2·G_A(v)
    val agg = cum.agg(
      max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
      coalesce(sum(col("__da").cast(dec) * mr2.cast(dec)),
        lit(0).cast(dec)).as("__ra"),
      coalesce(sum(col("__db").cast(dec) * mr2.cast(dec)),
        lit(0).cast(dec)).as("__rb"),
      coalesce(sum(col("__da").cast(dec) * xA), lit(0).cast(dec))
        .as("__sa"),
      coalesce(sum(col("__da").cast(dec) * xA * xA), lit(0).cast(dec))
        .as("__qa"),
      coalesce(sum(col("__db").cast(dec) * xB), lit(0).cast(dec))
        .as("__sb"),
      coalesce(sum(col("__db").cast(dec) * xB * xB), lit(0).cast(dec))
        .as("__qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nn = na + nb
    val m1 = col("__ra").cast("double") / (lit(2.0) * na)
    val m2 = col("__rb").cast("double") / (lit(2.0) * nb)
    def sVar(s: Column, q: Column, cnt: Column): Column =
      (q.cast("double") / lit(4.0)
        - (s.cast("double") / lit(2.0)) * (s.cast("double") / lit(2.0))
          / cnt) / (cnt - 1)
    val v1 = when(col("n_a") >= 2, sVar(col("__sa"), col("__qa"), na))
    val v2 = when(col("n_b") >= 2, sVar(col("__sb"), col("__qb"), nb))
    val pooled = na * v1 + nb * v2
    val t = when(pooled > 0, na * nb * (m2 - m1) / (nn * sqrt(pooled)))
    val dof = when(pooled > 0 && na * v1 * na * v1 / (na - 1)
        + nb * v2 * nb * v2 / (nb - 1) > 0,
      pooled * pooled / (na * v1 * na * v1 / (na - 1)
        + nb * v2 * nb * v2 / (nb - 1)))
    val pHat = when(col("n_a") > 0 && col("n_b") > 0,
      (m2 - (nb + 1) / 2) / na)
    agg.select(col("n_a"), col("n_b"), pHat.as("p_hat"), t.as("t"),
      dof.as("dof"))
  }

  /** Mood's median test — the blunt-but-robust k-group location check:
    * "is each slice's share ABOVE the pooled median what it should
    * be?" Where [[kruskalWallis]] uses full rank information, Mood's
    * test only asks which side of the pooled median each row falls —
    * maximally robust to outliers and to wildly different shapes. The
    * pooled median is the LOWER median (smallest v with 2·F(v) ≥ N —
    * a real data value, deterministic, and the convention an external
    * SQL engine reproduces with one window). Per group, a 2×1 cell of
    * (≤ median, > median) counts against the margin expectation:
    *
    *   chi2_part_g = (le_g − nᵍ·LE/N)²/(nᵍ·LE/N)
    *               + (gt_g − nᵍ·GT/N)²/(nᵍ·GT/N),  Σ ~ χ²(k−1)
    *
    * Returns one row per group `(category, n_g, n_le, e_le,
    * chi2_part)` — the offender is visible, not just the total;
    * chi2_part NULL when a margin expectation is 0 (all rows on one
    * side of the median — e.g. a constant corpus). NULL
    * categories/values are refused work; an empty corpus returns an
    * empty frame.
    *
    * Shape: one distinct-value census + the two-level prefix sum to
    * find the median (no single-task window, no percentile buffering),
    * then ONE group-keyed count fold; the margin window runs over the
    * k-bounded per-group frame ([[graft.ops.Profile.chiSquareGof]]'s
    * convention). */
  def moodsMedian(df: DataFrame, cat: Column, value: Column)
      : DataFrame = {
    val v = value.cast("double")
    val base = df.where(cat.isNotNull && v.isNotNull)
      .select(cat.cast("string").as("category"), v.as("__v"))
      .localCheckpoint(eager = false)
    val cells = base.groupBy(col("__v")).agg(count(lit(1)).as("__f"))
    val cum = Packing.withPrefixSumsLong(cells, Seq("__v"),
      sums = Seq("__f" -> "__c"), totals = Seq("__f" -> "__n"))
    val medRow = cum.where(lit(2) * col("__c") >= col("__n"))
      .agg(min(col("__v"))).collect()(0)
    if (medRow.isNullAt(0))
      return base.sparkSession.emptyDataFrame
        .select(lit("").as("category"), lit(0L).as("n_g"),
          lit(0L).as("n_le"), lit(0.0).as("e_le"),
          lit(0.0).as("chi2_part")).where(lit(false))
    val med = medRow.getDouble(0)
    val perG = base.groupBy(col("category")).agg(
      count(lit(1)).as("n_g"),
      coalesce(sum((col("__v") <= med).cast("long")), lit(0L))
        .as("n_le"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)) // k group rows — bounded, not corpus-sized
    val withM = perG
      .withColumn("__N", sum(col("n_g")).over(wAll))
      .withColumn("__LE", sum(col("n_le")).over(wAll))
    val eLe = col("n_g").cast("double") * col("__LE") / col("__N")
    val eGt = col("n_g").cast("double") *
      (col("__N") - col("__LE")) / col("__N")
    val gtG = (col("n_g") - col("n_le")).cast("double")
    withM.select(col("category"), col("n_g"), col("n_le"),
      eLe.as("e_le"),
      when(eLe > 0 && eGt > 0,
        (col("n_le").cast("double") - eLe)
          * (col("n_le").cast("double") - eLe) / eLe
          + (gtG - eGt) * (gtG - eGt) / eGt).as("chi2_part"))
  }

  /** Mixture-overlap panel between side A and side B of one
    * categorical column — the BOUNDED companions to
    * [[categoricalDrift]]'s divergences (KL explodes on one-sided
    * categories; these live in [0, 1] and read as percentages):
    *
    *   overlap        = Σ min(p_i, q_i)     (1 − total variation)
    *   bhattacharyya  = Σ √(p_i·q_i)
    *   hellinger      = √(1 − BC)
    *
    * computed on the UNSMOOTHED empirical shares (a category absent
    * from one side genuinely contributes zero overlap — that is the
    * information). Returns one row `(n_a, n_b, v, overlap,
    * bhattacharyya, hellinger)` — NULL panel when either side is
    * empty. NULL categories/sides are refused work.
    *
    * Shape: ONE category-keyed count fold (vocabulary-bounded cells),
    * terms through exact_sum. */
  def mixtureOverlap(df: DataFrame, cat: Column, isA: Column)
      : DataFrame = {
    val a = isA.cast("boolean")
    val (cnts, na, nb, vSize) = sideCounts(df, cat, a, alpha = 0.5)
    if (na == 0 || nb == 0)
      return oneRow(df)(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(vSize).as("v"), lit(null).cast("double").as("overlap"),
        lit(null).cast("double").as("bhattacharyya"),
        lit(null).cast("double").as("hellinger"))
    val p = col("cnt_a").cast("double") / na
    val q = col("cnt_b").cast("double") / nb
    val agg = cnts.agg(
      gf.exact_sum(least(p, q)).as("overlap"),
      gf.exact_sum(sqrt(p * q)).as("__bc"))
    agg.select(lit(na).as("n_a"), lit(nb).as("n_b"),
      lit(vSize).as("v"), col("overlap"),
      col("__bc").as("bhattacharyya"),
      sqrt(greatest(lit(0.0), lit(1.0) - col("__bc")))
        .as("hellinger"))
  }

  /** WEIGHTED two-sample KS — [[ksTest]] for IMPORTANCE-WEIGHTED
    * corpora: once rows carry DSIR/temperature/mixture weights, the
    * unweighted ECDF tests the wrong distribution. D is the max gap
    * between the WEIGHTED ECDFs; the approximate p-value plugs each
    * side's Kish effective sample size n_eff = (Σw)²/Σw² into the
    * standard asymptotic formula — a documented heuristic (weighted
    * KS has no exact null), flagged by its own column name. Returns
    * one row `(w_a, w_b, n_eff_a, n_eff_b, d, p_approx)` — NULL
    * d/p when a side has zero total weight. NULL values/sides/weights
    * and weights ≤ 0 are refused work.
    *
    * Shape: the [[ksTest]] recipe with weighted cells — per-distinct-
    * value side WEIGHT sums fold through exact_sum, the cumulative
    * runs through [[Packing.withPrefixSumsDec]]'s two-level
    * exact-decimal pass (bit-identical at any parallelism even on a
    * corpus-sized continuous cell frame). */
  def ksTestWeighted(df: DataFrame, value: Column, isA: Column,
      weight: Column): DataFrame = {
    val v = value.cast("double")
    val a = isA.cast("boolean")
    val w = weight.cast("double")
    val cells = df.where(v.isNotNull && a.isNotNull && w.isNotNull &&
        w > 0)
      .groupBy(v.as("__v"))
      .agg(gf.exact_sum(when(a, w).otherwise(lit(0.0))).as("__wa"),
        gf.exact_sum(when(!a, w).otherwise(lit(0.0))).as("__wb"),
        gf.exact_sum(when(a, w * w).otherwise(lit(0.0))).as("__wa2"),
        gf.exact_sum(when(!a, w * w).otherwise(lit(0.0))).as("__wb2"))
      .localCheckpoint(eager = false) // reused: totals fold + cumulative pass
    val tot = cells.agg(gf.exact_sum(col("__wa")),
      gf.exact_sum(col("__wb")), gf.exact_sum(col("__wa2")),
      gf.exact_sum(col("__wb2"))).collect()(0)
    def dv(i: Int): Double =
      if (tot.isNullAt(i)) 0.0 else tot.getDouble(i)
    val (wa, wb, qa, qb) = (dv(0), dv(1), dv(2), dv(3))
    if (wa <= 0 || wb <= 0)
      return oneRow(df)(lit(wa).as("w_a"), lit(wb).as("w_b"),
        lit(null).cast("double").as("n_eff_a"),
        lit(null).cast("double").as("n_eff_b"),
        lit(null).cast("double").as("d"),
        lit(null).cast("double").as("p_approx"))
    val cum = Packing.withPrefixSumsDec(cells, Seq("__v"),
      Seq("__wa" -> "__cwa", "__wb" -> "__cwb"))
    // per-row doubles from exact decimals: identical on any
    // partitioning, and max is order-free
    val d = cum.agg(max(abs(col("__cwa").cast("double") / wa
        - col("__cwb").cast("double") / wb))).collect()(0).getDouble(0)
    val (nea, neb) = (wa * wa / qa, wb * wb / qb)
    val p = math.min(1.0,
      2.0 * math.exp(-2.0 * d * d * nea * neb / (nea + neb)))
    oneRow(df)(lit(wa).as("w_a"), lit(wb).as("w_b"),
      lit(nea).as("n_eff_a"), lit(neb).as("n_eff_b"),
      lit(d).as("d"), lit(p).as("p_approx"))
  }

  /** Per-series autocorrelation function r_1..r_maxLag — the
    * monitor-family diagnostic that answers "are these residuals/
    * ingest volumes actually independent, or does today echo
    * yesterday": every control chart here ([[ewmaMonitor]],
    * [[cusumMonitor]], [[msprt]]) calibrates its thresholds assuming
    * independent points, and autocorrelated series alarm falsely at
    * several times the nominal rate. The standard biased estimator,
    *
    *   r_k = Σ_{t>k}(x_t − x̄)(x_{t−k} − x̄) / Σ_t(x_t − x̄)²
    *
    * expanded so ONE pass computes every lag: per (group, lag k) the
    * fold carries Σx_t·x_{t−k}, the head/tail partial sums, and the
    * global moments — no second scan for the mean. Returns one row
    * per (group, lag): `(groupCols…, n, lag, r)` — r NULL when the
    * series is constant or n ≤ lag. NULL group/order/value rows are
    * refused work; `tieCol` must make the order total (the
    * [[cusumMonitor]] contract).
    *
    * Shape: `maxLag` lag columns over GROUP-bounded window partitions
    * (one exchange), then one exact_sum fold per group — series are
    * per-source/per-day charts, not corpus-length. */
  def acf(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      tieCol: Column, value: Column, maxLag: Int = 8): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(maxLag >= 1 && maxLag <= 64, "maxLag must be in [1, 64]")
    val v = value.cast("double")
    val base = df.where(v.isNotNull && orderCol.isNotNull &&
        groupCols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(groupCols.map(col) :+ v.as("__x") :+ orderCol.as("__o")
        :+ tieCol.as("__tie"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__o"), col("__tie"))
    val lagged = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("__x"), k).over(w))
    }
    val aggs = Seq(count(lit(1)).as("n"),
      gf.exact_sum(col("__x")).as("__s"),
      gf.exact_sum(col("__x") * col("__x")).as("__q")) ++
      (1 to maxLag).flatMap { k =>
        val lk = col(s"__l$k")
        Seq(
          gf.exact_sum(when(lk.isNotNull, col("__x") * lk)
            .otherwise(lit(0.0))).as(s"__c$k"),
          gf.exact_sum(when(lk.isNotNull, col("__x"))
            .otherwise(lit(0.0))).as(s"__h$k"),
          gf.exact_sum(when(lk.isNotNull, lk).otherwise(lit(0.0)))
            .as(s"__t$k"))
      }
    val byG = lagged.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    val mean = col("__s") / n
    val den = col("__q") - n * mean * mean
    val lagRows = (1 to maxLag).map { k =>
      val num = col(s"__c$k") - mean * col(s"__h$k") -
        mean * col(s"__t$k") + (n - k) * mean * mean
      struct(lit(k).as("lag"),
        when(col("n") > k && den > 0, num / den).as("r"))
    }
    byG.select(groupCols.map(col) :+ col("n") :+
        explode(array(lagRows: _*)).as("__lr"): _*)
      .select(groupCols.map(col) :+ col("n") :+
        col("__lr.lag").as("lag") :+ col("__lr.r").as("r"): _*)
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) per series —
    * [[acf]]'s one-number verdict: Q ~ χ²(K) under independence,
    *
    *   Q = n(n+2) Σ_{k≤K} r_k²/(n−k)
    *
    * Returns one row per group `(groupCols…, n, k, q)` — q NULL when
    * any r_k is NULL (constant or too-short series). Same shape as
    * [[acf]] (it folds acf's output). */
  def ljungBox(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      tieCol: Column, value: Column, maxLag: Int = 8): DataFrame = {
    val rs = acf(df, groupCols, orderCol, tieCol, value, maxLag)
    val n = col("n").cast("double")
    rs.groupBy(groupCols.map(col): _*)
      .agg(max(col("n")).as("n"), count(lit(1)).as("k"),
        gf.exact_sum(coalesce(col("r") * col("r")
          / (col("n").cast("double") - col("lag")), lit(0.0)))
          .as("__s"),
        sum(when(col("r").isNull, 1).otherwise(0)).as("__bad"))
      .select(groupCols.map(col) :+ col("n") :+ col("k") :+
        when(col("__bad") === 0,
          n * (n + 2) * col("__s")).as("q"): _*)
  }

  /** Exact two-sample energy distance (Székely & Rizzo 2004) — the
    * modern omnibus: sensitive to ANY distributional difference
    * (location, scale, shape, tails) with a single statistic,
    *
    *   D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|,
    *   T  = n_A·n_B/(n_A+n_B) · D²   (≥ 0, = 0 iff same distribution)
    *
    * The textbook computation is O(n²) pairwise |x−y|; this one is
    * EXACT in one cell pass: every pairwise sum of absolute
    * differences decomposes over the sorted distinct-value gaps —
    * pairs that straddle gap k contribute its width once each, so
    *
    *   Σ_{x∈A,y∈B}|x−y| = Σ_k g_k·(F_A(k)·(n_B−F_B(k))
    *                              + F_B(k)·(n_A−F_A(k)))
    *
    * with g_k the gap to the next distinct value and F the inclusive
    * cumulative counts (within-side sums analogously). Returns one
    * row `(n_a, n_b, e_xy, e_xx, e_yy, d2, t_stat)` — NULL when
    * either side is empty. E|·| are V-statistic means (self-pairs
    * count zero). NULL values/sides are refused work.
    *
    * Shape: the [[ksTest]] recipe — ONE corpus shuffle into
    * per-distinct-value side counts; cumulatives AND the
    * next-distinct-value gap ride the same
    * [[Packing.withPrefixSumsLong]] two-level pass (its `leadOut`
    * channel); the gap-weighted products fold through
    * [[graft.api.functions.exact_sum]] — fully parallel on a
    * corpus-sized cell frame, bit-identical on any partitioning.
    * Count products are doubles (the gap weight already is): past
    * ~10⁸ rows per side the products round — fine for a distance,
    * stated for the record. */
  def energyDistance(df: DataFrame, value: Column, isA: Column)
      : DataFrame = {
    val cum = cumFromCells(sideCells(df, value, isA),
      leadOut = Some("__lead"))
    val g = when(col("__lead").isNotNull, col("__lead") - col("__v"))
      .otherwise(lit(0.0))
    val (ca, cb) = (col("__ca").cast("double"),
      col("__cb").cast("double"))
    val (na, nb) = (col("__na").cast("double"),
      col("__nb").cast("double"))
    val agg = cum.agg(
      max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
      gf.exact_sum(g * (ca * (nb - cb) + cb * (na - ca))).as("__sab"),
      gf.exact_sum(g * (lit(2.0) * ca * (na - ca))).as("__saa"),
      gf.exact_sum(g * (lit(2.0) * cb * (nb - cb))).as("__sbb"))
    val (naO, nbO) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val both = col("n_a") > 0 && col("n_b") > 0
    val eXY = when(both, col("__sab") / (naO * nbO))
    val eXX = when(col("n_a") > 0, col("__saa") / (naO * naO))
    val eYY = when(col("n_b") > 0, col("__sbb") / (nbO * nbO))
    val d2 = lit(2.0) * eXY - eXX - eYY
    agg.select(col("n_a"), col("n_b"), eXY.as("e_xy"), eXX.as("e_xx"),
      eYY.as("e_yy"), when(both, d2).as("d2"),
      when(both, naO * nbO / (naO + nbO) * d2).as("t_stat"))
  }

  /** k-sample Anderson–Darling test (Scholz & Stephens 1987, the
    * tie-adjusted A²_akN) — the omnibus heavy-tail-sensitive member of
    * the drift battery: [[ksTest]] scores the single worst CDF gap,
    * [[cramerVonMises]] the mean-squared gap, AD weights the gaps by
    * 1/(F(1−F)) so TAIL disagreements — exactly where quality-score
    * and loss distributions go wrong — register at full strength, and
    * it takes k slices at once. Over the pooled distinct values z_j
    * (counts h_j, mid-adjusted pooled cumulative B_aj = B_j − h_j/2,
    * per-sample M_aij = M_ij − h_ij/2):
    *
    *   A² = (N−1)/N² · Σ_i (1/n_i) Σ_j h_j ·
    *        (N·M_aij − n_i·B_aj)² / (B_aj(N−B_aj) − N·h_j/4)
    *
    * E[A²] = k−1 under H₀. Returns one row `(n, k, a2, e_a2)` — a2
    * NULL when the pooled column is constant (single distinct value:
    * every denominator vanishes). The standardized T_N and its
    * p-value need harmonic-sum constants whose exact evaluation is an
    * O(N) driver loop — corpus-unbounded, so this op reports the
    * exact statistic and its H₀ mean instead (compare A²/(k−1) across
    * slices, or standardize externally at known N). NULL
    * groups/values are refused work; groups are collected under
    * `maxGroups` (slices are a handful by design).
    *
    * Shape: [[jonckheereTerpstra]]'s recipe — one (group, value) count
    * shuffle, k per-group cumulative layers in ONE
    * [[Packing.withPrefixSumsLong]] two-level pass, per-cell terms
    * folded scan-side through [[graft.api.functions.exact_sum]] —
    * fully parallel on a corpus-sized cell frame, bit-identical on any
    * partitioning. */
  def andersonDarlingK(df: DataFrame, groupCol: Column, value: Column,
      maxGroups: Int = 64): DataFrame = {
    val g = groupCol.cast("string")
    val v = value.cast("double")
    val base = df.where(g.isNotNull && v.isNotNull)
      .select(g.as("__g"), v.as("__v"))
    val cells = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__f")).localCheckpoint(eager = false)
    val gTotals = cells.groupBy(col("__g"))
      .agg(sum(col("__f")).as("__n")).orderBy(col("__g"))
      .limit(maxGroups + 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(gTotals.length >= 2, "need at least 2 groups")
    require(gTotals.length <= maxGroups,
      s"more than maxGroups=$maxGroups groups")
    val k = gTotals.length
    val byV = cells.groupBy(col("__v")).agg(
      coalesce(sum(when(col("__g") === gTotals(0)._1, col("__f"))),
        lit(0L)).as("__f0"),
      (1 until k).map(i =>
        coalesce(sum(when(col("__g") === gTotals(i)._1, col("__f"))),
          lit(0L)).as(s"__f$i")): _*)
    val cum = Packing.withPrefixSumsLong(byV, Seq("__v"),
      sums = (0 until k).map(i => s"__f$i" -> s"__c$i"))
    val nTot = gTotals.map(_._2).sum
    val nD = nTot.toDouble
    // doubled mid-adjusted counts keep everything integral until the
    // final double assembly: 2B_aj = 2B_j − h_j, 2M_aij = 2M_ij − h_ij
    val hj = (0 until k).map(i => col(s"__f$i")).reduce(_ + _)
    val bj2 = lit(2) * (0 until k).map(i => col(s"__c$i"))
      .reduce(_ + _) - hj
    val term = (0 until k).map { i =>
      val ni = gTotals(i)._2.toDouble
      val mi2 = (lit(2) * col(s"__c$i") - col(s"__f$i")).cast("double")
      val num = lit(nD) * mi2 - lit(ni) * bj2.cast("double")
      (lit(1.0) / ni) * (num * num)
    }.reduce(_ + _)
    val den = bj2.cast("double") *
      (lit(2.0) * nD - bj2.cast("double")) -
      lit(nD) * hj.cast("double")
    val agg = cum.agg(gf.exact_sum(
      when(den > 0, hj.cast("double") * term / den)).as("__s"))
    // the doubled quantities carry 4x in num^2 and 4x in den: cancels;
    // the den above is 4*(B(N−B) − Nh/4)
    val a2 = when(lit(nTot) >= 2 && col("__s").isNotNull,
      col("__s") * lit((nD - 1) / (nD * nD)))
    agg.select(lit(nTot).as("n"), lit(k.toLong).as("k"),
      a2.as("a2"), lit((k - 1).toDouble).as("e_a2"))
  }

  /** One-sided CUSUM pair (Page 1954) per group — [[ewmaMonitor]]'s
    * companion for SMALL PERSISTENT shifts: EWMA reacts to a point
    * anomaly; CUSUM accumulates drift, so a metric that creeps
    * +0.3σ/day alarms in days, not after the quarter. The classic
    * recursion S⁺_t = max(0, S⁺_{t−1} + (x_t − μ₀) − k) is
    * sequential; this computes the closed form
    *
    *   S⁺_t = P_t − min_{0 ≤ j ≤ t} P_j,  P_t = Σ_{i≤t}(x_i − μ₀ − k)
    *
    * (and the mirrored S⁻), so the whole series needs one running sum
    * and one running min. Adds `s_pos`, `s_neg`, `flag`
    * (S⁺ > h ∨ S⁻ > h). NULL group/order/value rows are refused
    * work; `tieCol` must make (groupCols, orderCol, tieCol) unique
    * (the [[ewmaMonitor]] contract — ties would make the fold order
    * partition-dependent).
    *
    * Shape: per-series windows over GROUP-bounded partitions (one
    * exchange — monitors are per-source/per-day series, not
    * corpus-length); window sums run sequentially in (order, tie)
    * order, so results are deterministic and an external SQL engine
    * reproduces them bit-for-bit. */
  def cusumMonitor(df: DataFrame, groupCols: Seq[String],
      orderCol: Column, tieCol: Column, value: Column,
      mu0: Double, k: Double, h: Double): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(k >= 0, "slack k must be >= 0")
    require(h > 0, "threshold h must be > 0")
    val reserved = Seq("__p", "__q", "s_pos", "s_neg", "flag")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val v = value.cast("double")
    val base = df.where(v.isNotNull && orderCol.isNotNull &&
      groupCols.map(c => col(c).isNotNull).reduce(_ && _))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(orderCol, tieCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val withP = base
      .withColumn("__p", sum(v - lit(mu0) - lit(k)).over(w))
      .withColumn("__q", sum(-(v - lit(mu0)) - lit(k)).over(w))
    withP
      .withColumn("s_pos",
        col("__p") - least(lit(0.0), min(col("__p")).over(w)))
      .withColumn("s_neg",
        col("__q") - least(lit(0.0), min(col("__q")).over(w)))
      .withColumn("flag", col("s_pos") > h || col("s_neg") > h)
      .drop("__p", "__q")
  }

  /** Mixture sequential probability ratio test (mSPRT; Robbins 1970,
    * the Johari–Koomen–Pekelis–Walsh "always-valid inference" form) —
    * the monitor a CONTINUOUSLY-watched metric needs: a fixed-horizon
    * z-test peeked at every micro-batch inflates false alarms
    * unboundedly, while the mSPRT p-value is valid at EVERY look by
    * construction. H₀: μ = μ₀ against a N(μ₀, τ²) mixture of
    * alternatives, with plug-in variance σ̂²:
    *
    *   ln Λ_n = ½·ln(σ̂²/(σ̂² + nτ²))
    *            + n²τ²(x̄ − μ₀)² / (2σ̂²(σ̂² + nτ²))
    *   p_n    = min(1, e^{−ln Λ_n})   (monotone non-increasing in Λ)
    *
    * The caller keeps the running minimum across looks (p is already
    * conservative at each look; the running min preserves
    * always-validity). Returns one row per group:
    * `(groupCols…, n, mean, var, log_lambda, p_always)` —
    * NULL log_lambda/p when n < 2 or σ̂² = 0 (a constant metric has no
    * scale to test against). NULL values are refused work.
    *
    * Shape: ONE moment fold per group (count/Σx/Σx² through
    * [[graft.api.functions.exact_sum]]) — the state is a 3-number
    * monoid, which is what makes [[msprtFromMoments]] the streaming
    * entry: fold micro-batch partials with a groupBy/sum and the
    * result equals the one-shot test, bit-identically. */
  def msprt(df: DataFrame, groupCols: Seq[String], value: Column,
      mu0: Double, tau: Double): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val v = value.cast("double")
    msprtFromMoments(
      df.where(v.isNotNull)
        .groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n"), gf.exact_sum(v).as("s"),
          gf.exact_sum(v * v).as("q")),
      mu0, tau)
  }

  /** [[msprt]] from an ALREADY-AGGREGATED per-group moment table
    * (columns n, s, q) — the monoid entry point: micro-batch partials
    * fold with `groupBy(keys).agg(sum(n), sum(s), sum(q))` and the
    * result equals the one-shot test. */
  def msprtFromMoments(moments: DataFrame, mu0: Double, tau: Double)
      : DataFrame = {
    require(tau > 0, "mixture scale tau must be > 0")
    val n = col("n").cast("double")
    val mean = when(col("n") > 0, col("s") / n)
    val vHat = when(col("n") >= 2,
      (col("q") - col("s") * col("s") / n) / (n - 1))
    val t2 = tau * tau
    val dev = mean - lit(mu0)
    val logLam = when(vHat > 0,
      lit(0.5) * log(vHat / (vHat + n * t2))
        + n * n * lit(t2) * dev * dev
          / (lit(2.0) * vHat * (vHat + n * t2)))
    moments.withColumn("mean", mean)
      .withColumn("var", vHat)
      .withColumn("log_lambda", logLam)
      .withColumn("p_always",
        when(logLam.isNotNull, least(lit(1.0), exp(-logLam))))
      .drop("s", "q")
  }

  /** Smoothed probability columns over the observed vocabulary. */
  private def smoothed(na: Long, nb: Long, v: Long, alpha: Double)
      : (Column, Column) =
    ((col("cnt_a") + lit(alpha)) / lit(na + alpha * v),
      (col("cnt_b") + lit(alpha)) / lit(nb + alpha * v))
}
