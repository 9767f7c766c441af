package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-signal quality ensembling — the selection stage that combines
  * heterogeneous document signals (length, entropy, LM score, classifier
  * probability, link authority…) into ONE ranking.
  *
  * Raw signals live on incompatible scales, so averaging them directly
  * lets the widest-ranged signal dominate. The standard fix (FineWeb-style
  * pipelines, rank-average ensembles) is to replace every signal by its
  * fractional rank in the corpus and blend THOSE: scale-free, outlier-
  * robust, and monotone-transform-invariant per signal.
  *
  * Ranks are exact average ranks (ties share the mean of their positions —
  * the same convention as [[Profile.spearman]]), computed per signal as a
  * distinct-VALUE count table run through [[Packing.withPrefixSum]]'s
  * two-level scan — no corpus-sized global window; only (value, count)
  * pairs and the final value-keyed join shuffle. Every arithmetic step is
  * plain IEEE on identical operands, so blended scores are bit-identical
  * across engines and partitionings (weights should be integer-valued for
  * cross-engine exactness of the weighted sum; any weights are fine
  * within Spark).
  *
  * Scale: k signals cost k count-shuffles + k value-keyed joins of the
  * (id, signals) projection — the exact-rank analog of q142's design. At
  * 100 TB with near-continuous signals, each rank table is corpus-sized;
  * that is inherent to EXACT ranks (the approximate alternative — t-digest
  * `cdf` per signal — is one broadcast probe, at sketch accuracy).
  */
object Quality {

  /** Blend `signals` into one fractional-rank score per row.
    *
    * @param signals (name, column, higherIsBetter): per signal, the
    *                normalized percentile is rank/n when higher values
    *                are better, (n+1−rank)/n when lower values are —
    *                so pct is always in (0, 1] and HIGHER pct = better.
    * @param weights optional per-signal blend weights (default: equal)
    * @param buckets [[Packing.withPrefixSum]] bucket hint (0 = auto)
    * @return (idCol, pct_<name>…, blend) — blend = Σ w·pct / Σw; rows
    *         with any NULL/NaN signal are dropped (they have no rank)
    */
  def rankBlend(df: DataFrame, idCol: String,
      signals: Seq[(String, Column, Boolean)],
      weights: Seq[Double] = Nil, buckets: Int = 0): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    require(signals.map(_._1).distinct.length == signals.length,
      "duplicate signal names")
    require(weights.isEmpty || weights.length == signals.length,
      "weights must match signals")
    require(weights.forall(_ > 0), "weights must be > 0")
    val ws = if (weights.isEmpty) Seq.fill(signals.size)(1.0) else weights
    val wSum = ws.sum

    val proj = df.select(col(idCol).as("__id") +:
        signals.map { case (n, c, _) => c.cast("double").as(s"__s_$n") }: _*)
      .where(signals.map { case (n, _, _) =>
        col(s"__s_$n").isNotNull && !isnan(col(s"__s_$n")) }
        .reduce(_ && _))
    // one integer scalar: the rank denominator (deterministic)
    val n = proj.count()
    if (n == 0) {
      return proj.select(col("__id").as(idCol) +:
        (signals.map { case (s, _, _) => lit(0.0).as(s"pct_$s") } :+
          lit(0.0).as("blend")): _*).limit(0)
    }

    // per signal: distinct-value average-rank table, joined back on value
    val ranked = signals.foldLeft(proj) { case (acc, (name, _, _)) =>
      val v = s"__s_$name"
      val counts = proj.groupBy(col(v)).agg(count(lit(1)).as("__cnt"))
      val rt = Packing.withPrefixSum(counts, v, "__cnt", "__cum", buckets)
        .select(col(v),
          (col("__cum") - (col("__cnt") - lit(1L)) / lit(2.0))
            .as(s"__r_$name"))
      acc.join(rt, Seq(v))
    }
    val pcts = signals.map { case (name, _, higherIsBetter) =>
      val r = col(s"__r_$name")
      val pct =
        if (higherIsBetter) r / n.toDouble
        else (lit((n + 1).toDouble) - r) / n.toDouble
      pct.as(s"pct_$name")
    }
    val blend = (signals.zip(ws).foldLeft(lit(0.0)) {
      case (acc, ((name, _, _), w)) => acc + lit(w) * col(s"pct_$name")
    } / wSum).as("blend")
    ranked.select(col("__id").as(idCol) +: pcts: _*)
      .select(col(idCol) +: signals.map(s => col(s"pct_${s._1}")) :+ blend: _*)
  }

  /** Sketch-path [[rankBlend]] for the 100× case: each signal's
    * percentile comes from a t-digest `cdf` probe instead of an exact
    * rank table — ONE sketch aggregation over all signals, the k digest
    * blobs broadcast back as literals, and scoring is a pure scan (no
    * value-keyed joins, no corpus-sized rank tables). Percentiles are
    * sketch-accurate (t-digest cdf error concentrates at the tails);
    * orientation and blending match [[rankBlend]], so results converge
    * to the exact path as compression grows.
    *
    * Same output shape as [[rankBlend]]; rows with NULL/NaN signals are
    * dropped for parity with the exact path. */
  def rankBlendApprox(df: DataFrame, idCol: String,
      signals: Seq[(String, Column, Boolean)],
      weights: Seq[Double] = Nil, compression: Double = 200.0): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    require(signals.map(_._1).distinct.length == signals.length,
      "duplicate signal names")
    require(weights.isEmpty || weights.length == signals.length,
      "weights must match signals")
    require(weights.forall(_ > 0), "weights must be > 0")
    val ws = if (weights.isEmpty) Seq.fill(signals.size)(1.0) else weights
    val wSum = ws.sum
    import graft.api.{functions => gf}

    val proj = df.select(col(idCol).as("__id") +:
        signals.map { case (n, c, _) => c.cast("double").as(s"__s_$n") }: _*)
      .where(signals.map { case (n, _, _) =>
        col(s"__s_$n").isNotNull && !isnan(col(s"__s_$n")) }
        .reduce(_ && _))
    // ONE pass: a digest per signal; k blobs return to the driver
    val blobs = proj.agg(
        gf.tdigest(col(s"__s_${signals.head._1}"), lit(1.0), compression)
          .as("d0"),
        signals.tail.zipWithIndex.map { case ((n, _, _), i) =>
          gf.tdigest(col(s"__s_$n"), lit(1.0), compression).as(s"d${i + 1}")
        }: _*)
      .head()
    val pcts = signals.zipWithIndex.map { case ((name, _, higher), i) =>
      val blob = blobs.getAs[Array[Byte]](i)
      val cdf = gf.tdigest_cdf(lit(blob), col(s"__s_$name"))
      (if (higher) cdf else lit(1.0) - cdf).as(s"pct_$name")
    }
    val blend = (signals.zip(ws).foldLeft(lit(0.0)) {
      case (acc, ((name, _, _), w)) => acc + lit(w) * col(s"pct_$name")
    } / wSum).as("blend")
    proj.select(col("__id").as(idCol) +: pcts: _*)
      .select(col(idCol) +: signals.map(s => col(s"pct_${s._1}")) :+ blend: _*)
  }

  /** CCNet-style per-group quantile bucketing (Wenzek et al. 2020):
    * rank every row WITHIN its group by `order` (ascending; break ties
    * with the unique `tie` column — rankings must be total for
    * determinism) and label the first `headPct`% "head", the next
    * `midPct`% "middle", the rest "tail". The canonical use: bucket
    * documents by LM perplexity per language, keep head+middle.
    *
    * Cutoffs are `rank ≤ floor(n·pct/100)` in the identical double
    * expression both engines evaluate — no float-boundary ambiguity at
    * any realistic corpus size.
    *
    * Scale shape (the [[Vocab.build]] two-level rank, per group): ONE
    * range shuffle on (group, order, tie) — no single-partition window,
    * no per-group skew partition: a group spans many range partitions,
    * each ranked locally, stitched by broadcast (partition, group)
    * offsets. The offsets collect is (partitions × groups-per-partition)
    * rows — groups must be modest-cardinality (languages, sources), which
    * is what per-group quality bucketing means; ranges sample once and
    * are pinned by a localCheckpoint so the collect and the rank pass see
    * the same boundaries.
    *
    * Returns the input columns + (rank_in_group, n_group, bucket). */
  def rankBuckets(df: DataFrame, group: Column, order: Column, tie: Column,
      headPct: Int, midPct: Int): DataFrame = {
    require(headPct >= 0 && midPct >= 0 && headPct + midPct <= 100,
      "headPct/midPct must be >= 0 and sum to <= 100")
    // temp AND output names: an input already carrying any of these would
    // silently collide (same guard as Packing.withPrefixSum's)
    val reserved = Seq("__g", "__o", "__t", "__bkt", "__lr", "__off", "__n",
      "rank_in_group", "n_group", "bucket")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val spark = df.sparkSession
    val base = df.withColumn("__g", group).withColumn("__o", order)
      .withColumn("__t", tie)
    val parts = math.max(2,
      spark.sessionState.conf.numShufflePartitions)
    val ranged = base
      .repartitionByRange(parts, col("__g"), col("__o"), col("__t"))
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val gType = base.schema("__g").dataType
    val sizes = ranged.groupBy("__bkt", "__g")
      .agg(count(lit(1)).as("c")).collect()
    // per-group prefix over partitions in range order + group totals
    val byG = sizes.groupBy(_.get(1)).map { case (g, rows) =>
      val sorted = rows.sortBy(_.getInt(0))
      val total = sorted.map(_.getLong(2)).sum
      var acc = 0L
      g -> (total, sorted.map { r =>
        val off = acc; acc += r.getLong(2); r.getInt(0) -> off
      }.toMap)
    }
    val offRows = byG.flatMap { case (g, (total, offs)) =>
      offs.map { case (b, off) =>
        org.apache.spark.sql.Row(b, g, off, total)
      }
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bkt",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("__g", gType),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__n",
        org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt"), col("__g"))
      .orderBy(col("__o"), col("__t"))
    val headCut = floor(col("__n") * lit(headPct) / lit(100.0))
    val midCut = floor(col("__n") * lit(headPct + midPct) / lit(100.0))
    ranged
      .withColumn("__lr", row_number().over(w).cast("long"))
      .join(broadcast(offDf), Seq("__bkt", "__g"))
      .withColumn("rank_in_group", col("__lr") + col("__off"))
      .withColumn("n_group", col("__n"))
      .withColumn("bucket",
        when(col("rank_in_group") <= headCut, lit("head"))
          .when(col("rank_in_group") <= midCut, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__g", "__o", "__t", "__bkt", "__lr", "__off", "__n")
  }
}
