package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Skew- and balance-management operators for 100 TB-scale jobs, built on
  * the engine's own sketches:
  *
  *  - [[Partitioning]] uses a global t-digest (one tiny merged sketch, no
  *    global sort or sample pass) to derive quantile-balanced range buckets.
  *  - [[Skew]] uses Space-Saving heavy-hitter detection (one pass, KB of
  *    state) to find the keys that would overload a single reducer, and a
  *    salted join that spreads exactly those keys without touching the rest.
  *
  * Both follow the same shape: sketch pass → a driver-side result measured
  * in bytes → a broadcastable literal plan for the heavy distributed pass.
  */
object Partitioning {

  /** (k−1) boundary values splitting `valueCol` into k ≈equal-count ranges,
    * from one merged t-digest (error ≤ ~1.2% in rank at compression 100;
    * scale error with `compression`). The aggregation is a standard
    * partial→merge sketch pass: per-partition digests, KB-sized shuffle. */
  def quantileBoundaries(df: DataFrame, valueCol: String, numBuckets: Int,
      compression: Double = 200.0): Array[Double] = {
    require(numBuckets >= 2, "need at least 2 buckets")
    val qs = (1 until numBuckets).map(_.toDouble / numBuckets)
    df.agg(gf.tdigest_quantiles(
        gf.tdigest(col(valueCol), lit(1.0), compression), qs).as("bs"))
      .head().getSeq[Double](0).toArray
  }

  /** Adds `bucketCol` ∈ [0, boundaries.length] = the rank of the value among
    * the boundary points. The comparison chain is a foldLeft of codegen'd
    * `when`s over a driver-side array — no join, no shuffle; NULL/NaN values
    * land in bucket 0 (compare-false on every boundary). */
  def assignBuckets(df: DataFrame, valueCol: String,
      boundaries: Array[Double], bucketCol: String = "bucket"): DataFrame = {
    val chain = boundaries.foldLeft(lit(0)) { (acc, bound) =>
      acc + when(col(valueCol) >= lit(bound), 1).otherwise(0)
    }
    // Spark orders NaN above every value, so the fold alone would put NaN in
    // the top bucket; pin NULL/NaN to bucket 0 explicitly
    val b = when(col(valueCol).isNull ||
      isnan(col(valueCol).cast("double")), 0).otherwise(chain)
    df.withColumn(bucketCol, b)
  }

  /** One-pass variant of [[quantileBoundaries]] for several columns: ALL
    * per-column digests ride in a single aggregation (one scan, one tiny
    * shuffle), instead of one pass per column. */
  def quantileBoundariesMulti(df: DataFrame, cols: Seq[String],
      numBuckets: Int, compression: Double = 200.0): Map[String, Array[Double]] = {
    require(numBuckets >= 2, "need at least 2 buckets")
    val qs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val aggs = cols.map(c => gf.tdigest_quantiles(
      gf.tdigest(col(c), lit(1.0), compression), qs).as(s"__b_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> row.getSeq[Double](i).toArray
    }.toMap
  }

  /** Bit-interleaved Z-value of already-quantized bucket columns (each in
    * [0, 2^bits)): bit i of column j lands at output bit `i*n + j`. Pure
    * codegen'd shift/or arithmetic — no UDF, no custom expression needed.
    * Total bits (bits × #cols) must fit a long. */
  def zvalue(bucketCols: Seq[Column], bits: Int): Column = {
    require(bucketCols.nonEmpty && bits >= 1 && bits * bucketCols.size <= 62,
      "need 1+ columns and bits*cols <= 62")
    val n = bucketCols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- bucketCols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order clustering: quantize each column to 2^bits quantile-balanced
    * buckets (ONE sketch pass for all columns), interleave the bucket bits
    * into a Z-value, and range-repartition + sort by it. Rows close in ALL
    * dimensions land in the same partition and file neighborhood, so
    * min/max (row-group / file) pruning works for predicates on ANY subset
    * of the z-columns — the multi-dimensional generalization of
    * [[repartitionByQuantiles]], same machinery underneath. */
  def zorderBy(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 8, compression: Double = 200.0,
      zCol: String = "zvalue"): DataFrame = {
    val bounds = quantileBoundariesMulti(df, cols, 1 << bits, compression)
    val bucketed = cols.foldLeft(df) { (acc, c) =>
      assignBuckets(acc, c, bounds(c), s"__zb_$c")
    }
    val withZ = bucketed
      .withColumn(zCol, zvalue(cols.map(c => col(s"__zb_$c")), bits))
      .drop(cols.map(c => s"__zb_$c"): _*)
    repartitionByQuantiles(withZ.withColumn("__zd", col(zCol).cast("double")),
      "__zd", numPartitions, compression, "__zbucket")
      .sortWithinPartitions(zCol)
      .drop("__zd", "__zbucket")
  }

  /** Quantile-balanced range repartitioning: every output partition receives
    * ≈rows/k rows regardless of the value distribution. Unlike
    * `repartitionByRange` (which re-samples the data per call, a second scan
    * at scale) the boundaries come from the one-pass t-digest, and unlike
    * hash repartitioning the output is range-clustered — downstream
    * range-predicate scans and sorted writes stay partition-local. */
  def repartitionByQuantiles(df: DataFrame, valueCol: String, numBuckets: Int,
      compression: Double = 200.0, bucketCol: String = "bucket"): DataFrame = {
    val bounds = quantileBoundaries(df, valueCol, numBuckets, compression)
    val assigned = assignBuckets(df, valueCol, bounds, bucketCol)
    // bucket i → partition i exactly, without leaving the DataFrame world:
    // repartition(k, expr) routes rows by pmod(murmur3(expr), k), so map each
    // bucket id to a probe integer whose murmur3 lands in exactly that
    // partition (driver-side search, ~k·ln k tries). repartitionByRange would
    // re-sample the bucket column and can merge adjacent buckets; an RDD
    // identity partitioner pays a full InternalRow→Row conversion (~2.6 µs/row
    // measured at 50M rows — 7× the shuffle itself).
    val probes = new Array[Int](numBuckets)
    val found = new Array[Boolean](numBuckets)
    var remaining = numBuckets
    var candidate = 0
    while (remaining > 0) {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(candidate, org.apache.spark.sql.types.IntegerType, 42L).toInt
      val p = ((h % numBuckets) + numBuckets) % numBuckets
      if (!found(p)) { found(p) = true; probes(p) = candidate; remaining -= 1 }
      candidate += 1
    }
    assigned
      .withColumn("__probe", element_at(
        array(probes.map(lit).toIndexedSeq: _*), col(bucketCol) + 1))
      .repartition(numBuckets, col("__probe"))
      .drop("__probe")
  }
}

private[ops] object SkewMetricsImpl {

  /** One-row EXACT skew summary of `key`'s distribution — measure BEFORE
    * you shuffle: row/key counts, the heaviest key's count and share,
    * mean count, and the tie-corrected Gini coefficient (0 = perfectly
    * uniform, → 1 = one key dominates). The Gini folds over the
    * COUNT-OF-COUNTS table (distinct count values — tiny even when keys
    * are corpus-sized) through [[Packing.withPrefixSum]]'s two-level
    * scan, with tie-averaged ranks kept in INTEGER arithmetic
    * (2r = 2·cum − f + 1), so the final doubles are bit-identical
    * across engines and partitionings. NULL keys are excluded. */
  def skewMetrics(df: DataFrame, key: Column): DataFrame = {
    val counts = df.where(key.isNotNull)
      .groupBy(key.as("__k")).agg(count(lit(1)).as("__c"))
    val cc = counts.groupBy(col("__c")).agg(count(lit(1)).as("__f"))
    val pre = Packing.withPrefixSum(cc, "__c", "__f", "__cum")
    pre.agg(
        coalesce(sum(col("__c") * col("__f")), lit(0L)).as("n_rows"),
        coalesce(sum(col("__f")), lit(0L)).as("n_keys"),
        coalesce(max(col("__c")), lit(0L)).as("max_count"),
        // Σ count · f · 2r with 2r = 2·cum − f + 1 — exact integers
        coalesce(sum(col("__c") * col("__f") *
          (lit(2L) * col("__cum") - col("__f") + lit(1L))), lit(0L))
          .as("__num2r"))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        when(col("n_keys") > 0,
          col("n_rows").cast("double") / col("n_keys").cast("double"))
          .otherwise(lit(0.0)).as("avg_count"),
        when(col("n_rows") > 0,
          col("max_count").cast("double") / col("n_rows").cast("double"))
          .otherwise(lit(0.0)).as("top_share"),
        when(col("n_keys") > 0 && col("n_rows") > 0,
          col("__num2r").cast("double") /
            (col("n_keys").cast("double") * col("n_rows").cast("double")) -
            (col("n_keys") + lit(1L)).cast("double") /
              col("n_keys").cast("double"))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** The `n` heaviest keys with counts and corpus share — the candidates
    * for broadcasting or salting, EXACT (one count shuffle + TakeOrdered
    * by (count desc, key asc); [[Skew.heavyHitters]] is the sketch-pass
    * alternative when even the count shuffle is too much). */
  def heavyKeysExact(df: DataFrame, key: Column, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val counts = df.where(key.isNotNull)
      .groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum("cnt"), lit(0L)).as("__t"))
    counts.orderBy(col("cnt").desc, col("key")).limit(n)
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("__t")).as("share"))
  }
}

/** Semi-join reduction: cut the probe side of a join down to (almost) the
  * rows that can match BEFORE the join shuffle. At 100 TB the dominant cost
  * of `big ⋈ small-filtered-dim` is shuffling big's non-matching rows; a
  * Bloom filter of the dim keys (a few MB at 1% fpp) eliminates them at the
  * scan, so only matching rows (plus ~fpp false positives, removed by the
  * exact join that follows) pay the shuffle. This is the app-level form of
  * Spark's runtime row-level filtering, usable where AQE/DPP can't reach:
  * pre-shuffle writers, non-subquery dims, explicit pipelines. */
object Prune {

  /** Bloom filter over `xxhash64(keyCol)` of `dim`.
    *
    * Sizing: pass `expectedKeys` (any decent estimate of the DISTINCT key
    * count — e.g. from table stats or a prior run) and the build is ONE
    * aggregation pass over dim. Without it, a KMV distinct-estimate pass
    * runs first — still preferable to the old exact `count()`, which both
    * cost a full action and sized the filter by ROWS, overallocating
    * whenever dim repeats keys. fpp holds at the estimated capacity;
    * a low estimate degrades fpp, never correctness (the exact join
    * downstream removes all false positives). */
  def bloomOf(dim: DataFrame, keyCol: String, fpp: Double = 0.01,
      expectedKeys: Long = 0L): org.apache.spark.util.sketch.BloomFilter = {
    val n =
      if (expectedKeys > 0) expectedKeys
      else math.max(dim.agg(
        gf.kmv_distinct(gf.kmv_agg(col(keyCol), 16384)).as("d"))
        .head().getDouble(0).toLong, 1L)
    dim.select(xxhash64(col(keyCol)).as("__h")).stat.bloomFilter("__h", n, fpp)
  }

  /** `big` restricted to rows whose key might be in `dim` (semi-join
    * reduction; keeps ~fpp of non-matching rows). The probe is a codegen'd
    * filter at the scan — no join, no shuffle, NULL keys dropped (they
    * cannot match an equi-join anyway). */
  def bloomSemiJoin(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String, fpp: Double = 0.01, expectedKeys: Long = 0L): DataFrame = {
    val bloom = bloomOf(dim, dimKey, fpp, expectedKeys)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    import org.apache.spark.sql.graftshim.{toColumn, toExpr}
    val probe = toColumn(graft.expr.BloomMightContain(bytes,
      toExpr(xxhash64(col(bigKey)))))
    big.where(col(bigKey).isNotNull && probe)
  }

  /** Inner equi-join with Bloom pre-pruning of the big side. Result ≡
    * `big.join(dim, bigKey === dimKey)` exactly — the join removes the
    * Bloom's false positives — but only the surviving fraction of `big`
    * is shuffled (or compared, if the dim side broadcasts). */
  def bloomPrunedJoin(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String, fpp: Double = 0.01, expectedKeys: Long = 0L): DataFrame =
    bloomSemiJoin(big, dim, bigKey, dimKey, fpp, expectedKeys)
      .join(dim, col(bigKey) === col(dimKey))
}

object Skew {

  /** Heavy-hitter keys of `keyCol` via one Space-Saving pass:
    * (item, count, error) rows, count descending. Space-Saving
    * OVERestimates: `count − error ≤ actual ≤ count`, and every key with
    * actual > n/capacity is guaranteed present.
    * State is `capacity` counters per partial — the keys that
    * matter for skew handling at any scale fit in a driver String/Long
    * array. Key type follows the column type (long/double/string). */
  /** Exact one-row skew summary (counts, top share, tie-corrected Gini);
    * see [[SkewMetricsImpl.skewMetrics]]. */
  def skewMetrics(df: DataFrame, key: Column): DataFrame =
    SkewMetricsImpl.skewMetrics(df, key)

  /** Exact top-n heavy keys with shares; see
    * [[SkewMetricsImpl.heavyKeysExact]]. */
  def heavyKeysExact(df: DataFrame, key: Column, n: Int): DataFrame =
    SkewMetricsImpl.heavyKeysExact(df, key, n)

  def heavyHitters(df: DataFrame, keyCol: String,
      capacity: Int = 256, topK: Int = 16): DataFrame = {
    import org.apache.spark.sql.types._
    val sk = df.agg(gf.ss_topk_agg(col(keyCol), lit(1L), capacity).as("sk"))
    val counters = df.schema(keyCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        gf.ss_topk_long(col("sk"), topK)
      case DoubleType | FloatType => gf.ss_topk_double(col("sk"), topK)
      case StringType => gf.ss_topk_string(col("sk"), topK)
      case BinaryType => gf.ss_topk_binary(col("sk"), topK)
      case other => throw new IllegalArgumentException(
        s"unsupported heavy-hitter key type $other")
    }
    sk.select(explode(counters).as("c"))
      .select(col("c.item").as("item"), col("c.count").as("count"),
        col("c.error").as("error"))
  }

  /** Inner equi-join where `left` is large and skewed on `key`: rows whose
    * key is in `heavy` are salted into `saltFactor` sub-keys on the left and
    * replicated `saltFactor`× on the right, so one hot key spreads over
    * `saltFactor` reducers instead of melting one. Non-heavy keys pay
    * nothing (salt 0, no replication). Result ≡ `left.join(right, key)`.
    *
    * This is the app-level form of AQE's skew-join split for the cases AQE
    * can't fix (skew born in the map output of this very stage, shuffled
    * hash joins, pre-AQE writers). `heavy` typically comes from
    * [[heavyHitters]] — a few keys, broadcast as a literal IN-list. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, heavy: Seq[Any]): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    require(heavy.nonEmpty, "empty heavy-key set: use a plain join")
    val isHeavy = col(key).isin(heavy: _*)
    // salt source must be row-local and need no extra columns: the partition
    // id + a cheap per-row counter spread via xxhash64. Salting never alters
    // join results, only placement, so nondeterminism across retries is fine.
    val l = left.withColumn("__salt",
      when(isHeavy, pmod(xxhash64(monotonically_increasing_id()),
        lit(saltFactor)).cast("int")).otherwise(lit(0)))
    val r = right
      .withColumn("__salts", when(isHeavy, sequence(lit(0), lit(saltFactor - 1)))
        .otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts"))).drop("__salts")
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"))
      .drop(l("__salt")).drop(r("__salt")).drop(r(key))
  }

  /** Two-phase SALTED aggregation over a skewed key — [[saltedJoin]]'s
    * groupBy analogue: stage 1 groups by (key, salt mod saltFactor) so
    * a hot key's rows spread over `saltFactor` reducers and combine
    * there; stage 2 merges the ≤ saltFactor partials per key. The
    * result ≡ the direct `groupBy(key)` for the monoid aggregates
    * exposed here (count plus column sums), independent of salt
    * placement.
    *
    * `salt` is any row-local expression. A CONTENT-derived salt (hash
    * of a row id) makes reruns and receipts bit-deterministic; a
    * positional salt is fine when only placement matters. Note Spark's
    * hash aggregation already map-side-combines monoid partials, which
    * absorbs most count/sum skew on its own; the salted form buys
    * protection when the reduce side must still hold one key's merged
    * state — near-corpus-cardinality keys upstream of a second
    * wide merge, or inputs whose partitioning defeats map-side combine
    * (pre-aggregated shards keyed elsewhere). Returns
    * (key, n, sums…). */
  def saltedAgg(df: DataFrame, key: Column, salt: Column,
      saltFactor: Int, sums: Seq[(Column, String)] = Nil): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    require(sums.map(_._2).distinct.size == sums.size,
      "duplicate sum output names")
    require(!sums.map(_._2).contains("n") && !sums.map(_._2).contains("key"),
      "sum output names may not collide with key/n")
    val stage1 = df
      .groupBy(key.as("key"), pmod(salt, lit(saltFactor)).as("__salt"))
      .agg(count(lit(1)).as("__n"),
        sums.map { case (c, nm) => sum(c).as(s"__p_$nm") }: _*)
    stage1.groupBy(col("key"))
      .agg(sum(col("__n")).as("n"),
        sums.map { case (_, nm) => sum(col(s"__p_$nm")).as(nm) }: _*)
  }

  /** Stage-1 cell census of [[saltedAgg]] — the skew-survival receipt:
    * (key, salt, rows) per cell, so a gate can assert the hot key's
    * heaviest cell carries ~1/saltFactor of its rows instead of all of
    * them (q309's measured-not-assumed convention, applied to skew). */
  def saltCells(df: DataFrame, key: Column, salt: Column,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    df.groupBy(key.as("key"), pmod(salt, lit(saltFactor)).as("salt"))
      .agg(count(lit(1)).as("rows"))
  }
}
