package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** One-pass column profiling — the data-quality summary every ingest
  * pipeline wants before touching 100 TB: per column, row/null counts,
  * distinct cardinality, min/max, and the dominant value with its
  * frequency. ONE aggregation job over the table produces every column's
  * profile simultaneously (each column contributes a handful of KB-sized
  * sketch buffers to a single 1-row aggregate, then the row unpivots);
  * nothing scans per column, nothing collects per value.
  *
  * Sketch regimes make the output exact where it matters: KMV cardinality
  * is exact below its k (8192 here) and ±2% beyond; the Space-Saving top
  * value is exact whenever capacity ≥ distinct values (guaranteed for the
  * low-cardinality enum/flag columns where "dominant value" is a
  * meaningful question, approximate-with-error-bound elsewhere).
  */
object Profile {

  /** Long-format profile: one row per profiled column —
    * (column, n_rows, n_nonnull, n_distinct, min_value, max_value,
    * top_value, top_count). Values are rendered as strings so mixed-type
    * tables profile into one frame; `cols` defaults to every column. */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      kmvK: Int = 8192, topCapacity: Int = 1024): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "no columns to profile")

    val aggs: Seq[Column] = names.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(col(c)).as(s"__nn_$c"),
        gf.kmv_distinct(gf.kmv_agg(s, kmvK)).as(s"__nd_$c"),
        // min/max on the NATIVE type (numeric columns report numeric
        // extremes), rendered as strings only for the long-format output
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        gf.ss_topk_string(
          gf.ss_topk_agg(s, lit(1L), topCapacity), topCapacity)
          .as(s"__top_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // deterministic dominant value: the SS list's tie order is
    // update-sequence-dependent, so re-sort the FULL counter list by
    // (count desc, item asc) before taking the head — a top-N slice
    // before the sort would make a >N-way tie partitioning-dependent
    def topSorted(c: String): Column = array_sort(col(s"__top_$c"),
      (a, b) =>
        when(a.getField("count") > b.getField("count"), lit(-1))
          .when(a.getField("count") < b.getField("count"), lit(1))
          .when(a.getField("item") < b.getField("item"), lit(-1))
          .when(a.getField("item") > b.getField("item"), lit(1))
          .otherwise(lit(0)))

    val rows = names.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        round(col(s"__nd_$c")).cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        // try_element_at: an all-null column (or empty table) has an empty
        // counter list — null top, not an ANSI index error
        try_element_at(topSorted(c), lit(1)).getField("item")
          .as("top_value"),
        try_element_at(topSorted(c), lit(1)).getField("count")
          .as("top_count"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Pairwise Pearson correlation over `cols` in ONE aggregation pass —
    * the feature-redundancy check before training a quality classifier.
    * All d·(d+3)/2 moments (Σx_i, Σx_i·x_j, n) are `exact_sum`
    * aggregates in the same job, so the matrix is partitioning-invariant
    * and an external engine recomputing the same closed form from its own
    * exact sums lands within ulps. Rows with ANY null among `cols` are
    * excluded (listwise deletion — every pair sees the same n, making the
    * matrix a true Gram correlation, positive semidefinite).
    *
    * Returns long format: (col_a, col_b, corr) for a ≤ b, NULL corr when
    * either column is constant (zero variance) or n = 0.
    *
    * corr = (n·Σxy − Σx·Σy) / √(n·Σx² − (Σx)²) / √(n·Σy² − (Σy)²)
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    import graft.api.{functions => gf}
    val base = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .where(cols.map(col(_).isNotNull).reduce(_ && _))
    val pairs = for (i <- cols.indices; j <- i until cols.size)
      yield (cols(i), cols(j))
    val aggs = count(lit(1)).as("__n") +:
      (cols.map(c => gf.exact_sum(col(c)).as(s"__s_$c")) ++
        pairs.map { case (a, b) =>
          gf.exact_sum(col(a) * col(b)).as(s"__p_${a}__$b") })
    val one = base.agg(aggs.head, aggs.tail: _*)
    val n = col("__n").cast("double")
    def covN(a: String, b: String): Column =
      n * col(s"__p_${a}__$b") - col(s"__s_$a") * col(s"__s_$b")
    val rows = pairs.map { case (a, b) =>
      // diagonal pinned to exactly 1.0 (the closed form lands within an
      // ulp of 1 but not on it; users expect the identity)
      val c = if (a == b) when(covN(a, a) > 0, lit(1.0))
        else when(col("__n") > 0 && covN(a, a) > 0 && covN(b, b) > 0,
          covN(a, b) / sqrt(covN(a, a)) / sqrt(covN(b, b)))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), c.as("corr"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** One-call dataset card — the quantitative half of a "datasheet for
    * datasets": corpus mass, composition concentration, exact-duplicate
    * rate, and the Zipf naturalness fingerprint as a tall (metric, value)
    * receipt. Ships with every released corpus snapshot so downstream
    * consumers can diff cards instead of corpora.
    *
    * A handful of small aggregation jobs (counts, distincts via the text
    * hash, top-share, [[Text.zipfFit]]); every metric is mirrorable by an
    * external engine — integers exact, ratios/fits at round(6). Optional
    * `includeCompressibility` adds the mean zlib deflate ratio (a
    * heuristic signal with no SQL mirror — excluded from oracle-gated
    * runs by default). */
  def dataCard(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String,
      includeCompressibility: Boolean = false): DataFrame = {
    import graft.api.{functions => gf2}
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__t"),
      col(sourceCol).as("__src"), col(langCol).as("__lang"))
      .localCheckpoint(true)
    val m = base.agg(
      count(lit(1)).as("n_docs"),
      sum(gf2.token_count(col("__t")).cast("long")).as("n_tokens"),
      sum(length(col("__t")).cast("long")).as("n_chars"),
      count_distinct(col("__src")).as("n_sources"),
      count_distinct(col("__lang")).as("n_langs"),
      count_distinct(gf2.hash64(col("__t"))).as("n_distinct_texts")).head()
    val nDocs = m.getLong(0).toDouble
    def topShare(c: String): Double =
      if (nDocs == 0) 0.0
      else base.groupBy(col(c)).agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0) / nDocs
    val zipf = Text.zipfFit(base, "__t").head()
    val rows = Seq.newBuilder[(String, Double)]
    rows += ("n_docs" -> m.getLong(0).toDouble)
    rows += ("n_tokens" -> m.getLong(1).toDouble)
    rows += ("n_chars" -> m.getLong(2).toDouble)
    rows += ("n_sources" -> m.getLong(3).toDouble)
    rows += ("n_langs" -> m.getLong(4).toDouble)
    rows += ("exact_dup_docs" -> (m.getLong(0) - m.getLong(5)).toDouble)
    rows += ("exact_dup_rate" ->
      (if (nDocs == 0) 0.0 else (m.getLong(0) - m.getLong(5)) / nDocs))
    rows += ("avg_doc_tokens" ->
      (if (nDocs == 0) 0.0 else m.getLong(1) / nDocs))
    rows += ("top_source_share" -> topShare("__src"))
    rows += ("top_lang_share" -> topShare("__lang"))
    rows += ("zipf_slope" -> zipf.getAs[Double]("slope"))
    rows += ("zipf_r2" -> zipf.getAs[Double]("r2"))
    if (includeCompressibility) {
      rows += ("avg_deflate_ratio" ->
        (if (nDocs == 0) 0.0
         else base.agg(avg(gf2.deflate_ratio(col("__t"))))
           .head().getDouble(0)))
    }
    CheckpointUtil.freeCheckpoint(base)
    rows.result().toDF("metric", "value")
  }

  /** Exact Spearman rank correlation between two numeric columns — the
    * monotone-association check (quality score vs downstream loss, token
    * count vs dup rate) that Pearson's linearity assumption breaks on.
    *
    * The classic formulation ranks every row with a global `rank()` window
    * — a single-task sort funnel at scale. This one never globally sorts
    * the corpus: per column, rows group by DISTINCT VALUE (cardinality ≪
    * rows), the tie-averaged rank of each distinct value comes from the
    * two-level bucketed prefix scan of [[Packing.withPrefixSum]] (rank =
    * cum − (cnt−1)/2 over the inclusive cumulative count), and the
    * value-sized rank tables join back to the rows (broadcast when small —
    * left to the planner/AQE). Spearman ρ is then the Pearson correlation
    * of the two rank columns, folded in ONE aggregation whose sums run
    * through `exact_sum` — tie-averaged ranks are exact multiples of ½, so
    * every product is exactly representable and ρ is bit-deterministic
    * under any partitioning.
    *
    * Rows where either value is NULL or NaN are excluded listwise. Returns
    * one row (n, rho); rho is NULL when n < 2 or either column is
    * constant. */
  def spearman(df: DataFrame, xCol: Column, yCol: Column,
      buckets: Int = 0): DataFrame = {
    val rows = df.select(xCol.cast("double").as("__x"),
        yCol.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        !isnan(col("__x")) && !isnan(col("__y")))
    def rankTable(c: String): DataFrame = {
      val counts = rows.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
      Packing.withPrefixSum(counts, c, "__cnt", "__cum", buckets)
        .select(col(c),
          (col("__cum") - (col("__cnt") - lit(1L)) / lit(2.0))
            .as(s"__r$c"))
    }
    val ranked = rows
      .join(rankTable("__x"), Seq("__x"))
      .join(rankTable("__y"), Seq("__y"))
    val one = ranked.agg(count(lit(1)).as("n"),
      gf.exact_sum(col("__r__x")).as("__sx"),
      gf.exact_sum(col("__r__y")).as("__sy"),
      gf.exact_sum(col("__r__x") * col("__r__x")).as("__sxx"),
      gf.exact_sum(col("__r__y") * col("__r__y")).as("__syy"),
      gf.exact_sum(col("__r__x") * col("__r__y")).as("__sxy"))
    val n = col("n").cast("double")
    val covN = n * col("__sxy") - col("__sx") * col("__sy")
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varY = n * col("__syy") - col("__sy") * col("__sy")
    one.select(col("n"),
      when(col("n") >= 2 && varX > 0 && varY > 0,
        covN / sqrt(varX) / sqrt(varY)).as("rho"))
  }

  /** Exact Kendall's τ-b between two numeric columns — [[spearman]]'s
    * pair-concordance sibling: ρ measures monotone association through
    * rank VALUES (one discordant outlier far from the pack barely
    * moves it), τ counts concordant-vs-discordant PAIRS, the quantity
    * ranking evaluations actually care about ("how often does the
    * quality score order two documents the way downstream loss
    * does?"). With P concordant, Q discordant, and tie-aware
    * normalization:
    *
    *   τ_b = (P − Q) / √((n₀ − n₁)(n₀ − n₂)),
    *   n₀ = n(n−1)/2, n₁ = Σ_x t_x(t_x−1)/2, n₂ = Σ_y t_y(t_y−1)/2
    *
    * Returns one row `(n, n_cells, concordant, discordant, tau_b)` —
    * P/Q as exact DECIMAL(38,0) receipts (pair counts overflow LONG
    * past ~4·10⁹ rows), τ NULL when either axis is constant. Rows with
    * NULL/NaN on either side are excluded listwise.
    *
    * Shape: ONE (x, y) count shuffle to distinct-pair cells — the
    * corpus never moves. Pair counting is the classic
    * Knight/BIT sweep over the CELL frame (cells sorted by x, a
    * Fenwick tree over y-ranks), driver-side and O(C log C) on C =
    * distinct (x, y) pairs, guarded by `maxCells` — the exact arm is
    * for DISCRETE/bucketed axes (labels, grades, integer scores),
    * where C is vocabulary-bounded at any corpus size. For continuous
    * axes C is corpus-sized: use [[kendallTauBucketed]], whose grid is
    * fixed-size by construction. */
  def kendallTau(df: DataFrame, xCol: Column, yCol: Column,
      maxCells: Long = 2000000L): DataFrame = {
    val rows = df.select(xCol.cast("double").as("__x"),
        yCol.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        !isnan(col("__x")) && !isnan(col("__y")))
    val cellsDf = rows.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__f")).localCheckpoint(eager = false)
    val c = cellsDf.count()
    require(c <= maxCells,
      s"$c distinct (x, y) cells exceed maxCells=$maxCells — " +
        "continuous axes belong on kendallTauBucketed")
    val cells = cellsDf.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    kendallFromCells(df, cells)
  }

  /** [[kendallTau]]'s PRODUCTION arm for CONTINUOUS axes — the §8.3
    * dual-path convention: both axes are rank-bucketed into ≤`buckets`
    * t-digest quantile bins (one side-tagged sketch pass, KB blobs),
    * and τ_b is computed exactly ON THE GRID — a fixed
    * buckets×buckets cell frame regardless of corpus size. Grid τ
    * approximates raw τ: within-bucket orderings collapse to ties
    * (rank error ~1/buckets; gate it against the exact arm on a
    * discrete fixture — q358's receipt — don't assume it). Identical
    * to the exact arm whenever each axis already has ≤ `buckets`
    * distinct values landing in distinct bins. */
  def kendallTauBucketed(df: DataFrame, xCol: Column, yCol: Column,
      buckets: Int = 1024, compression: Double = 200.0): DataFrame = {
    require(buckets >= 2 && buckets <= 4096,
      "buckets must be in [2, 4096]")
    val rows = df.select(xCol.cast("double").as("__x"),
        yCol.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        !isnan(col("__x")) && !isnan(col("__y")))
      .localCheckpoint(eager = false)
    val digests = rows.agg(
      gf.tdigest(col("__x"), lit(1.0), compression),
      gf.tdigest(col("__y"), lit(1.0), compression)).head()
    if (digests.isNullAt(0))
      return kendallFromCells(df, Array.empty)
    def edges(blob: Array[Byte]): Array[Double] = {
      val t = graft.core.TDigest.deserialize(blob)
      val qs = (1 until buckets)
        .map(i => t.quantile(i.toDouble / buckets)).toArray
      qs.distinct.sorted
    }
    val ex = edges(digests.getAs[Array[Byte]](0))
    val ey = edges(digests.getAs[Array[Byte]](1))
    // bucket index = count of edges strictly below the value — an
    // aggregate fold over the broadcast edge-array literal (ONE codegen
    // loop; a nested when-chain at 1023 edges blows the expression tree
    // up — measured as a probe crash at the default bucket count),
    // order-preserving by construction
    def bucketOf(v: Column, es: Array[Double]): Column =
      aggregate(typedLit(es.toSeq), lit(0),
        (acc, e) => acc + when(v > e, 1).otherwise(0))
    val cells = rows.groupBy(
        bucketOf(col("__x"), ex).as("__bx"),
        bucketOf(col("__y"), ey).as("__by"))
      .agg(count(lit(1)).as("__f")).collect()
      .map(r => (r.getInt(0).toDouble, r.getInt(1).toDouble,
        r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    kendallFromCells(df, cells)
  }

  /** Shared τ-b assembly from sorted (x, y, count) cells: Fenwick-tree
    * concordance sweep + exact BigInt tie algebra. */
  private def kendallFromCells(df: DataFrame,
      cells: Array[(Double, Double, Long)]): DataFrame = {
    val yRanks = cells.map(_._2).distinct.sorted.zipWithIndex.toMap
    val bit = new Array[Long](yRanks.size + 1)
    def bitAdd(i0: Int, v: Long): Unit = {
      var i = i0 + 1
      while (i < bit.length) { bit(i) += v; i += i & -i }
    }
    def bitSum(i0: Int): Long = { // inclusive prefix [0, i0]
      var i = i0 + 1; var s = 0L
      while (i > 0) { s += bit(i); i -= i & -i }
      s
    }
    var conc = BigInt(0); var disc = BigInt(0)
    var inserted = 0L
    var i = 0
    while (i < cells.length) {
      var j = i // one x-group: query all, then insert all
      while (j < cells.length && cells(j)._1 == cells(i)._1) {
        val (_, y, f) = cells(j)
        val yr = yRanks(y)
        val less = bitSum(yr - 1)
        val upto = bitSum(yr)
        conc += BigInt(f) * less
        disc += BigInt(f) * (inserted - upto)
        j += 1
      }
      while (i < j) {
        bitAdd(yRanks(cells(i)._2), cells(i)._3); inserted += cells(i)._3
        i += 1
      }
    }
    val n = BigInt(cells.map(_._3).sum)
    def tiePairs(key: ((Double, Double, Long)) => Double): BigInt =
      cells.groupBy(key).values
        .map(g => { val t = BigInt(g.map(_._3).sum); t * (t - 1) / 2 })
        .sum
    val n0 = n * (n - 1) / 2
    val (n1, n2) = (tiePairs(_._1), tiePairs(_._2))
    val den = (n0 - n1).toDouble * (n0 - n2).toDouble
    val tau: java.lang.Double =
      if (den > 0) (conc - disc).toDouble / math.sqrt(den) else null
    val spark = df.sparkSession
    spark.range(1).select(lit(n.toLong).as("n"),
      lit(cells.length.toLong).as("n_cells"),
      lit(conc.toString).cast("decimal(38,0)").as("concordant"),
      lit(disc.toString).cast("decimal(38,0)").as("discordant"),
      (if (tau == null) lit(null).cast("double")
       else lit(tau.doubleValue)).as("tau_b"))
  }

  /** Clustering-agreement metrics between two labelings of the same
    * rows — "did my clusters rediscover the labels" (kmeans vs truth,
    * two dedup configurations, lang vs source): the Adjusted Rand
    * Index from EXACT pair counts (`Σ C(n_ij,2)`, `Σ C(a_i,2)`,
    * `Σ C(b_j,2)` — all LONGs; ARI = (Index − E[Index]) / (Max −
    * E[Index])) and normalized mutual information
    * `NMI = MI / √(H_A·H_B)`. Same shape as [[independence]]: one
    * contingency aggregation, marginals windowed over the
    * category-product-bounded cell frame. Returns one row:
    * (n, sum_comb, sum_a, sum_b, ari, nmi); a degenerate side (one
    * cluster, or all singletons on both sides) reports NULL ari/nmi
    * where the denominator vanishes. */
  /** Benford first-significant-digit audit (Newcomb 1881, Benford
    * 1938; Nigrini's forensic test) of a positive integer-valued
    * column — the data-quality screen for "does this numeric feed look
    * organically generated or fabricated/truncated": digit shares vs
    * the Benford expectation log₁₀(1 + 1/d), with the per-digit χ²
    * contribution (O−E)²/E so Σ chi2_part is the classic 8-dof
    * statistic and the worst digits are visible individually.
    *
    * Digit extraction is STRING-based (first character of the decimal
    * rendering of the LONG value) so both the engine and any SQL
    * mirror classify identically — a log10-floor extraction can
    * misclassify exact powers of ten under ulp differences.
    * Non-positive and NULL values are refused work (dropped); all nine
    * digit rows always come back (zero-filled). One map-side-combined
    * count shuffle over ≤ 9 keys. Returns
    * (digit, n, share, expected, chi2_part). */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    val counts = df.where(v.isNotNull && v > 0)
      .select(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val tot = counts.agg(coalesce(sum(col("n")), lit(0L)).as("__t"))
    val expected = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
    digits.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot)) // 1-row scalar side
      .select(col("digit"), col("n"),
        when(col("__t") > 0, col("n").cast("double") / col("__t"))
          .as("share"),
        expected.as("expected"),
        when(col("__t") > 0,
          pow(col("n").cast("double") - col("__t") * expected, 2) /
            (col("__t") * expected)).as("chi2_part"))
  }

  def clusterAgreement(df: DataFrame, aCol: Column,
      bCol: Column): DataFrame = {
    val cells = df.where(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("__a"), bCol.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val wa = org.apache.spark.sql.expressions.Window.partitionBy("__a")
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("__b")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    // n(n−1) is even, so integral div keeps the census a LONG
    def comb2(c: Column): Column =
      call_function("div", c * (c - 1), lit(2L))
    val m = cells
      .withColumn("__ra", sum(col("__o")).over(wa))
      .withColumn("__cb", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wAll))
      // count each marginal's pairs once (first cell of its row/col)
      .withColumn("__fa",
        row_number().over(wa.orderBy(col("__b"))) === 1)
      .withColumn("__fb",
        row_number().over(wb.orderBy(col("__a"))) === 1)
    val p = col("__o").cast("double") / col("__n").cast("double")
    val pa = col("__ra").cast("double") / col("__n").cast("double")
    val pb = col("__cb").cast("double") / col("__n").cast("double")
    m.agg(max(col("__n")).as("n"),
        sum(comb2(col("__o"))).as("sum_comb"),
        sum(when(col("__fa"), comb2(col("__ra"))).otherwise(0L))
          .as("sum_a"),
        sum(when(col("__fb"), comb2(col("__cb"))).otherwise(0L))
          .as("sum_b"),
        graft.api.functions.exact_sum(p * log(p / (pa * pb)))
          .as("__mi"),
        graft.api.functions.exact_sum(
          when(col("__fa"), -pa * log(pa)).otherwise(lit(0.0)))
          .as("__ha"),
        graft.api.functions.exact_sum(
          when(col("__fb"), -pb * log(pb)).otherwise(lit(0.0)))
          .as("__hb"))
      .select(col("n"), col("sum_comb"), col("sum_a"), col("sum_b"), {
        val cn2 = (col("n") * (col("n") - 1) / 2).cast("double")
        val exp = col("sum_a").cast("double") *
          col("sum_b").cast("double") / cn2
        val mx = (col("sum_a") + col("sum_b")).cast("double") / 2.0
        when(mx - exp =!= 0.0,
          (col("sum_comb").cast("double") - exp) / (mx - exp))
          .as("ari")
      }, when(col("__ha") > 0 && col("__hb") > 0,
        col("__mi") / sqrt(col("__ha") * col("__hb"))).as("nmi"))
  }

  /** First-order (Markov) transition census over per-entity ordered
    * event streams — the agent-trajectory / clickstream profile "what
    * follows what": within each entity's (order, tie) sequence, count
    * every adjacent (state → next_state) pair (transitions never
    * cross entities) and report the conditional probability
    * `p(next | state)` next to the raw count. One window exchange for
    * `lead`, one (state, next)-keyed count shuffle (map-side
    * combined), and a conditional-marginal window over the
    * states²-bounded cell frame. Returns one row per observed
    * transition: (state, next_state, n_trans, p_cond). */
  def transitionMatrix(df: DataFrame, entityCols: Seq[String],
      orderCol: Column, tieCol: Column, stateCol: Column): DataFrame = {
    require(entityCols.nonEmpty, "need at least one entity column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entityCols.map(col): _*).orderBy(orderCol, tieCol)
    val cells = df.where(stateCol.isNotNull)
      .withColumn("__s", stateCol)
      .withColumn("__nx", lead(col("__s"), 1).over(w))
      .where(col("__nx").isNotNull)
      .groupBy(col("__s").as("state"), col("__nx").as("next_state"))
      .agg(count(lit(1)).as("n_trans"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("state")
    cells.withColumn("p_cond",
      col("n_trans").cast("double") /
        sum(col("n_trans")).over(wc).cast("double"))
  }

  /** Categorical-independence audit between two metadata columns — the
    * profiling question "is `lang` actually independent of `source`,
    * or did one crawl skew it": from the exact contingency counts,
    * Pearson's `chi2 = Σ (O − E)² / E` with `dof = (R−1)(C−1)`,
    * Cramér's `V = √(χ² / (n · min(R−1, C−1)))` (the [0, 1] effect
    * size), and the mutual information
    * `mi = Σ p(a,b) · ln(p(a,b) / (p(a)p(b)))` in nats. One
    * contingency aggregation (cells are category-product-bounded, not
    * corpus-sized), marginals by window over the cell frame, one
    * scalar fold. NULL categories are refused work. Returns one row:
    * (n, n_cells, dof, chi2, cramers_v, mi). */
  def independence(df: DataFrame, colA: Column,
      colB: Column): DataFrame = {
    val cells = df.where(colA.isNotNull && colB.isNotNull)
      .groupBy(colA.as("__a"), colB.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val wa = org.apache.spark.sql.expressions.Window.partitionBy("__a")
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("__b")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val m = cells
      .withColumn("__ra", sum(col("__o")).over(wa))
      .withColumn("__cb", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wAll))
      .withColumn("__nr",
        size(collect_set(col("__a")).over(wAll)).cast("long"))
      .withColumn("__nc",
        size(collect_set(col("__b")).over(wAll)).cast("long"))
    val o = col("__o").cast("double")
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__n").cast("double")
    val p = o / col("__n").cast("double")
    // a cell with O = 0 never appears in the grouped frame, but it
    // still owes (0 − E)²/E = E to χ²; Σ over ALL cells of E is n, so
    // the unobserved mass is exactly n − Σ_observed E
    m.agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_cells"),
        max((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
        (graft.api.functions.exact_sum((o - e) * (o - e) / e) +
          (max(col("__n")).cast("double") -
            graft.api.functions.exact_sum(e))).as("chi2"),
        max(least(col("__nr") - 1, col("__nc") - 1)).as("__mindim"),
        graft.api.functions.exact_sum(
          p * log(p / (col("__ra").cast("double") /
            col("__n").cast("double") *
            (col("__cb").cast("double") / col("__n").cast("double")))))
          .as("mi"))
      .select(col("n"), col("n_cells"), col("dof"), col("chi2"),
        sqrt(greatest(col("chi2") / (col("n").cast("double") *
          col("__mindim").cast("double")), lit(0.0))).as("cramers_v"),
        col("mi"))
  }

  /** One-way ANOVA F-test across the slices of one categorical column —
    * [[independence]]'s numeric sibling, and the k-slice generalization
    * of [[Drift.welchTTest]]: "does mean quality / length / score
    * actually differ BETWEEN sources, beyond its scatter WITHIN them?"
    *
    *   F    = (SS_between / (k−1)) / (SS_within / (N−k))
    *   eta² = SS_between / SS_total      (variance explained, [0, 1])
    *
    * from the per-slice moment decomposition `SS_within =
    * Σ_g (Σx² − (Σx)²/n_g)`, `SS_between = Σ_g n_g·(x̄_g − x̄)²`.
    * Returns one row `(n, k, ss_between, ss_within, f, eta2)` — F NULL
    * when k < 2, N ≤ k, or SS_within = 0 (all-constant slices); eta2
    * NULL when SS_total = 0. NULL categories/values are refused work.
    *
    * Shape: ONE grouped moment fold (count/Σx/Σx² per slice through
    * [[graft.api.functions.exact_sum]] — slice-bounded, never
    * corpus-sized), then a one-row fan-in over the k slice rows;
    * bit-identical on any partitioning. */
  def anovaF(df: DataFrame, cat: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val slices = df.where(cat.isNotNull && v.isNotNull)
      .groupBy(cat.as("__g"))
      .agg(count(lit(1)).as("__n"), gf.exact_sum(v).as("__s"),
        gf.exact_sum(v * v).as("__q"))
    val n = col("__n").cast("double")
    val agg = slices.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n"),
      count(lit(1)).as("k"),
      gf.exact_sum(col("__q") - col("__s") * col("__s") / n).as("ss_w"),
      gf.exact_sum(col("__s")).as("__ts"),
      gf.exact_sum(col("__s") * col("__s") / n).as("__bs"))
    val nT = col("n").cast("double")
    val kD = col("k").cast("double")
    // SS_between = Σ (Σx_g)²/n_g − (Σx)²/N  (König–Huygens on means)
    val ssb = when(col("n") > 0, col("__bs") - col("__ts") * col("__ts") / nT)
    val f = when(col("k") >= 2 && col("n") > col("k") && col("ss_w") > 0,
      (ssb / (kD - 1)) / (col("ss_w") / (nT - kD)))
    agg.select(col("n"), col("k"), ssb.as("ss_between"),
      col("ss_w").as("ss_within"), f.as("f"),
      when(ssb + col("ss_w") > 0, ssb / (ssb + col("ss_w"))).as("eta2"))
  }

  /** Levene / Brown–Forsythe variance-homogeneity test across the k
    * slices of one categorical column — the assumption check that
    * belongs NEXT TO [[anovaF]] (whose F quietly presumes equal
    * within-slice variances): W = the one-way F statistic recomputed
    * on the absolute deviations `z = |x − center_g|`. `center =
    * "median"` (default) is Brown–Forsythe — robust to heavy tails,
    * the variant to reach for on real pipeline metrics; `"mean"` is
    * classic Levene. Returns [[anovaF]]'s row shape with the statistic
    * named `w`. Under H₀, W ~ F(k−1, N−k).
    *
    * Shape: one grouped center aggregation (slice-bounded, exact
    * `percentile` for the median — the q122 DuckDB-parity kernel)
    * broadcast back over one corpus scan, then [[anovaF]]'s single
    * moment fold; the slice count must therefore be broadcast-bounded
    * (slices are sources/langs/shards — they are). */
  def leveneTest(df: DataFrame, cat: Column, value: Column,
      center: String = "median"): DataFrame = {
    require(center == "median" || center == "mean",
      "center must be 'median' or 'mean'")
    val v = value.cast("double")
    val base = df.where(cat.isNotNull && v.isNotNull)
      .select(cat.as("__g"), v.as("__x"))
    val c =
      if (center == "median") percentile(col("__x"), lit(0.5))
      else avg(col("__x"))
    val centers = base.groupBy(col("__g")).agg(c.as("__c"))
    val z = base.join(broadcast(centers), Seq("__g"))
      .select(col("__g"), abs(col("__x") - col("__c")).as("__z"))
    anovaF(z, col("__g"), col("__z")).withColumnRenamed("f", "w")
  }

  /** Species-richness / diversity profile of a count table — the
    * "how much of this distribution have we actually seen" panel for
    * vocabulary, domain, and n-gram inventories. Input is one row per
    * species with its observed count (the output shape of any
    * `groupBy(term).count()` — the monoid form, so shard partials
    * fold). From the frequency-of-frequencies (n_r = species seen
    * exactly r times):
    *
    *   missing_mass = n₁/N            (Good–Turing: unseen probability)
    *   coverage     = 1 − n₁/N        (Good's sample coverage)
    *   chao1        = V + n₁(n₁−1)/(2(n₂+1))   (bias-corrected richness)
    *   simpson      = 1 − Σ c(c−1)/(N(N−1))    (unbiased, exact rational)
    *   shannon      = −Σ (c/N)·ln(c/N)
    *
    * Returns one row `(n, v, n1, n2, missing_mass, coverage, chao1,
    * simpson, shannon)` — NULL diversity fields on an empty table;
    * simpson NULL when N < 2. NULL/non-positive counts are refused
    * work (a zero-count species row is a caller bug, not data).
    *
    * Shape: ONE fold over the count table (itself the output of one
    * count shuffle): n₁/n₂/V/N and Σc(c−1) are exact LONG/DECIMAL
    * sums; shannon fans in through [[graft.api.functions.exact_sum]] —
    * bit-identical on any partitioning. */
  def speciesProfile(counts: DataFrame, countCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val c = countCol.cast("long")
    val agg = counts.where(c.isNotNull && c > 0).agg(
      coalesce(sum(c), lit(0L)).as("n"),
      count(lit(1)).as("v"),
      coalesce(sum(when(c === 1, 1L)), lit(0L)).as("n1"),
      coalesce(sum(when(c === 2, 1L)), lit(0L)).as("n2"),
      coalesce(sum(c.cast(dec) * (c - 1).cast(dec)), lit(0).cast(dec))
        .as("__cc"),
      gf.exact_sum(-(c.cast("double"))
        * log(c.cast("double"))).as("__plogp"))
    val nD = col("n").cast("double")
    val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
    agg.select(col("n"), col("v"), col("n1"), col("n2"),
      when(col("n") > 0, n1 / nD).as("missing_mass"),
      when(col("n") > 0, lit(1.0) - n1 / nD).as("coverage"),
      when(col("n") > 0, col("v").cast("double")
        + n1 * (n1 - 1) / (lit(2.0) * (n2 + 1))).as("chao1"),
      when(col("n") >= 2, lit(1.0)
        - col("__cc").cast("double") / (nD * (nD - 1))).as("simpson"),
      // −Σ p ln p = (Σ −c·ln c)/N + ln N (exactly one global rescale)
      when(col("n") > 0,
        col("__plogp") / nD + log(nD)).as("shannon"))
  }

  /** Poisson dispersion (index-of-dispersion) test per group — the
    * sanity check for COUNT-valued feeds (events per user per day,
    * dups per shard, crawl errors per domain): under a Poisson
    * process, variance ≈ mean; real feeds are usually overdispersed
    * (bursty, contagious), and every Poisson-assuming alert fires too
    * often there. Fisher's index:
    *
    *   D = (n−1)·s²/x̄ ~ χ²(n−1),  z = (D − (n−1))/√(2(n−1))
    *
    * Returns one row per group `(groupCols…, n, mean, var, ratio, d,
    * z)` — ratio = s²/x̄ (1 = Poisson, > 1 over-, < 1 under-
    * dispersed); d/z NULL when n < 2 or x̄ = 0. Negative values are
    * refused work loudly (a "count" below 0 is a pipeline bug).
    *
    * Shape: ONE moment fold per group through
    * [[graft.api.functions.exact_sum]]. */
  def dispersionTest(df: DataFrame, groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val v = valueCol.cast("double")
    val agg = df.where(v.isNotNull)
      .withColumn("__neg", when(v < 0, 1).otherwise(0))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__neg")).as("__bad"),
        gf.exact_sum(v).as("__s"),
        gf.exact_sum(v * v).as("__q"))
    val n = col("n").cast("double")
    val mean = when(col("n") > 0, col("__s") / n)
    val vr = when(col("n") >= 2,
      (col("__q") - col("__s") * col("__s") / n) / (n - 1))
    val d = when(mean > 0, (n - 1) * vr / mean)
    val out = agg.select(groupCols.map(col) ++ Seq(col("n"),
      col("__bad"), mean.as("mean"), vr.as("var"),
      when(mean > 0, vr / mean).as("ratio"), d.as("d"),
      when(d.isNotNull && col("n") >= 2,
        (d - (n - 1)) / sqrt(lit(2.0) * (n - 1))).as("z")): _*)
    // fail fast on negative "counts" without a second scan: the flag
    // rides the same fold
    val bad = out.where(col("__bad") > 0).limit(1).collect()
    require(bad.isEmpty, "negative values in a count column — " +
      "dispersionTest is for counts; clean the feed first")
    out.drop("__bad")
  }

  /** Chapman capture–recapture estimator (Chapman 1951) — "how many
    * duplicates did BOTH passes miss": run two INDEPENDENT detectors
    * over the same corpus (MinHash vs SimHash candidates, two
    * blocklist revisions, two PII regex families), mark each row with
    * both flags, and estimate the true positive population from the
    * overlap:
    *
    *   N̂ = (n_A+1)(n_B+1)/(m+1) − 1   (m = flagged by both),
    *   SE = √((n_A+1)(n_B+1)(n_A−m)(n_B−m) / ((m+1)²(m+2)))
    *
    * plus each detector's implied recall n/N̂ — the honest answer to
    * "is 97% dedup recall a measurement or a hope". Assumes detector
    * independence (positively correlated detectors bias N̂ low — state
    * it in the report, don't average it away). Returns one row
    * `(n_a, n_b, n_both, n_hat, se, recall_a, recall_b)` — n_hat NULL
    * when either detector flags nothing (no overlap information).
    * NULL flags are refused work.
    *
    * Shape: ONE count fold to three LONGs; all else is one-row
    * arithmetic. */
  def captureRecapture(df: DataFrame, flagA: Column, flagB: Column)
      : DataFrame = {
    val a = flagA.cast("boolean")
    val b = flagB.cast("boolean")
    val agg = df.where(a.isNotNull && b.isNotNull).agg(
      coalesce(sum(a.cast("long")), lit(0L)).as("n_a"),
      coalesce(sum(b.cast("long")), lit(0L)).as("n_b"),
      coalesce(sum((a && b).cast("long")), lit(0L)).as("n_both"))
    val (na, nb, m) = (col("n_a").cast("double"),
      col("n_b").cast("double"), col("n_both").cast("double"))
    val nHat = when(col("n_a") > 0 && col("n_b") > 0,
      (na + 1) * (nb + 1) / (m + 1) - 1)
    val se = when(col("n_a") > 0 && col("n_b") > 0, sqrt(
      (na + 1) * (nb + 1) * (na - m) * (nb - m)
        / ((m + 1) * (m + 1) * (m + 2))))
    agg.select(col("n_a"), col("n_b"), col("n_both"),
      nHat.as("n_hat"), se.as("se"),
      when(nHat > 0, na / nHat).as("recall_a"),
      when(nHat > 0, nb / nHat).as("recall_b"))
  }

  /** Chi-square goodness-of-fit of one categorical column against a
    * DECLARED distribution — "is the sampled mixture actually the
    * 60/30/10 I asked [[graft.ops.Sampling.mixtureSample]] for?"
    * ([[benfordAudit]] is the special case with Benford's shares).
    * `expected` maps category → positive share (normalized here, so
    * ratios like 6/3/1 work). Returns one row per DECLARED category —
    * `(category, n_obs, expected_share, expected_n, chi2_part)`,
    * zero-filled when unobserved — so the offender is visible, not
    * just the total; Σ chi2_part ~ χ²(k−1) under H₀. Observed
    * categories OUTSIDE the declaration fail fast (a silently ignored
    * stray category would understate every other share). NULL
    * categories are refused work.
    *
    * Shape: one ≤k-key count aggregation; the declared frame is a
    * k-row literal joined broadcast. */
  def chiSquareGof(df: DataFrame, cat: Column,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "expected distribution must be non-empty")
    require(expected.map(_._1).distinct.length == expected.length,
      "duplicate category in expected distribution")
    require(expected.forall(_._2 > 0), "expected shares must be > 0")
    val total = expected.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.where(cat.isNotNull)
      .groupBy(cat.cast("string").as("category"))
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint(eager = false)
    val stray = obs.select(col("category"))
      .where(!col("category").isin(expected.map(_._1): _*))
      .limit(5).collect().map(_.getString(0))
    require(stray.isEmpty,
      s"observed categories outside the declared distribution: " +
        s"${stray.mkString(", ")}")
    val exp = expected.map { case (cName, s) => (cName, s / total) }
      .toDF("category", "expected_share")
    val joined = exp.join(obs, Seq("category"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    // k declared rows — the window frame is k-bounded, not corpus-sized
    joined
      .withColumn("expected_n",
        sum(col("n_obs")).over(wAll).cast("double")
          * col("expected_share"))
      .withColumn("chi2_part",
        when(col("expected_n") > 0, // empty corpus: NULL, not ANSI /0
          (col("n_obs").cast("double") - col("expected_n"))
            * (col("n_obs").cast("double") - col("expected_n"))
            / col("expected_n")))
      .select(col("category"), col("n_obs"), col("expected_share"),
        col("expected_n"), col("chi2_part"))
  }
}
