package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget bins in a deterministic global order, so a 100 TB
  * corpus packs identically on every rerun and from any partitioning.
  *
  * The primitive is a DISTRIBUTED PREFIX SUM. The naive Spark formulation —
  * `sum(v) over (order by key rows unbounded preceding)` with no partition
  * spec — funnels the whole dataset through ONE task; instead this runs the
  * classic two-level scan: quantile-bucket the order key (t-digest pass,
  * [[Partitioning]] machinery), cumsum within each bucket (partition-local
  * window), and add the broadcast prefix of per-bucket totals — three cheap
  * parallel passes, no global sort bottleneck, exact results independent of
  * bucketing.
  *
  * Packing itself is "contiguous fill": bin = floor(cumsum_before/budget)
  * in order-key order. Every bin's payload is ≥ budget only via its LAST
  * document straddling the boundary (overflow < that document's length) —
  * the standard streaming-packing contract; callers that must hard-cap a
  * bin truncate or re-split the straddler downstream.
  */
object Packing {

  /** Rows-per-bucket floor for auto-sizing: below this, extra buckets buy
    * no parallelism but still pay a longer assignment when-chain and a
    * wider offsets literal. */
  private val MinRowsPerBucket = 16L

  /** LONG integral division (Spark's `div`, = SQL `a div b`). Packing
    * arithmetic is integer end to end: `floor(a.toDouble / b)` silently
    * loses exactness past 2^53 — real territory for cumulative token
    * sums over a 100 TB corpus — and a float boundary that rounds the
    * other way moves a document into the wrong bin. All packing
    * dividends/divisors here are non-negative, so truncating `div`
    * equals floor division (the oracle's `//`). */
  private def idiv(a: Column, b: Column): Column =
    call_function("div", a.cast("long"), b.cast("long"))

  /** Cap the requested bucket count by the observed rows (≥ 2 always). */
  private[graft] def effectiveBuckets(requested: Int, rows: Long): Int =
    math.max(2L, math.min(requested.toLong, rows / MinRowsPerBucket)).toInt

  /** Adds `outCol` = inclusive prefix sum of `valueCol` in ascending
    * `orderCol` order. `orderCol` must be numeric with UNIQUE values (ties
    * would make the scan order, and thus the result, nondeterministic).
    * `buckets` bounds the parallelism of the scan (default: shuffle
    * partitions, CAPPED by the observed row count so a 7-row frame never
    * pays a 200-boundary chain — the digest that finds the boundaries
    * already knows the count, so the cap costs nothing extra; the result
    * is exact for ANY bucketing, so the cap cannot change values). */
  def withPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, buckets: Int = 0): DataFrame = {
    val reserved = Seq("__bkt", "__local")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val requested = math.max(2, if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions)
    // ONE sketch pass yields both the row count (auto-size) and the
    // boundary quantiles (driver-side extraction from the same digest)
    val blob = df.agg(gf.tdigest(col(orderCol).cast("double"), lit(1.0),
        200.0).as("s")).head.getAs[Array[Byte]](0)
    val td = graft.core.TDigest.deserialize(blob)
    val rows = td.totalSize.toLong
    val n = effectiveBuckets(requested, rows)
    val bounds =
      if (rows == 0) Array.empty[Double]
      else (1 until n).map(i => td.quantile(i.toDouble / n)).toArray
    val bucketed = Partitioning.assignBuckets(df, orderCol, bounds, "__bkt")
    // per-bucket totals: one map-side-combined aggregation, driver gets
    // `buckets` rows; prefix offsets broadcast back as a literal array
    val totals = bucketed.groupBy(col("__bkt"))
      .agg(sum(col(valueCol).cast("double")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val offsets = new Array[Double](bounds.length + 1)
    var acc = 0.0
    (0 to bounds.length).foreach { b =>
      offsets(b) = acc
      acc += totals.getOrElse(b, 0.0)
    }
    val w = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("__local", sum(col(valueCol).cast("double")).over(w))
      .withColumn(outCol,
        col("__local") + element_at(
          array(offsets.map(lit).toIndexedSeq: _*), col("__bkt") + 1))
      .drop("__bkt", "__local")
  }

  /** [[withPrefixSumsLong]]'s DECIMAL sibling for one non-integral
    * value column: the value is first rounded to DECIMAL(38,18) fixed
    * point (≤ 5·10⁻¹⁹ per-term rounding, far below any downstream
    * round(6) gate grain), then every sum — partition-local window,
    * per-partition totals, broadcast offsets — is exact decimal
    * arithmetic. Unlike a double prefix sum, whose result shifts at
    * the last ulp when partition boundaries regroup the additions,
    * this is bit-identical for ANY boundary placement and equals a
    * sequential window over the same rounded terms — which is what
    * lets [[Survival.kaplanMeier]]'s global arm match its grouped arm
    * exactly. Order keys must be non-null and jointly unique. */
  def withPrefixSumDec(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame =
    withPrefixSumsDec(df, orderCols, Seq(valueCol -> outCol))

  /** Multi-column form of [[withPrefixSumDec]]: every (value → out)
    * pair cumulates over the SAME range shuffle and per-partition
    * totals collect — the decimal mirror of [[withPrefixSumsLong]]'s
    * `sums`. */
  def withPrefixSumsDec(df: DataFrame, orderCols: Seq[String],
      sums: Seq[(String, String)]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(sums.nonEmpty, "nothing to compute")
    require(!df.columns.contains("__bkt"),
      "input may not contain reserved column __bkt")
    val dec = "decimal(38,18)"
    val spark = df.sparkSession
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions)
    val oc = orderCols.map(col)
    var ranged = df.repartitionByRange(parts, oc: _*)
      .withColumn("__bkt", spark_partition_id())
    sums.zipWithIndex.foreach { case ((v, _), i) =>
      ranged = ranged.withColumn(s"__vd$i", col(v).cast(dec))
    }
    // eager=false: the offsets aggregate below is the first consumer and
    // covers every partition, so it materializes the checkpoint as a side
    // effect — an eager checkpoint would run the same upstream compute as
    // a separate blocking job first (one extra pass per prefix call).
    // spark_partition_id stays pinned: both consumers share ONE RDD and
    // the range partitioner's boundaries are fixed at plan time. The same
    // rationale applies to every `eager = false` site in this repo (r14).
    ranged = ranged.localCheckpoint(eager = false)
    val aggs = sums.indices.map(i => sum(col(s"__vd$i")).as(s"__t$i"))
    val per = ranged.groupBy(col("__bkt"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val offs: Seq[Array[java.math.BigDecimal]] = sums.indices.map { i =>
      val byBkt = per.map(r => r.getInt(0) ->
        Option(r.getDecimal(i + 1))
          .getOrElse(java.math.BigDecimal.ZERO)).toMap
      val arr = new Array[java.math.BigDecimal](parts)
      var acc = java.math.BigDecimal.ZERO
      (0 until parts).foreach { b =>
        arr(b) = acc
        acc = acc.add(byBkt.getOrElse(b, java.math.BigDecimal.ZERO))
      }
      arr
    }
    val w = Window.partitionBy(col("__bkt")).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the local-sum + offset ADD must happen at decimal(37,18):
    // (38,18)+(38,18) needs precision 39, so Spark would shrink the
    // result scale to 17 and round away the 18th digit — at (37,18)
    // the add is exact and the result is (38,18) with no rounding
    val nar = "decimal(37,18)"
    var out = ranged
    sums.zipWithIndex.foreach { case ((_, o), i) =>
      out = out.withColumn(o,
        (sum(col(s"__vd$i")).over(w).cast(nar) + element_at(
          array(offs(i).map(d => lit(d).cast(nar)).toIndexedSeq: _*),
          col("__bkt") + 1)).cast(dec))
    }
    out.drop("__bkt" +: sums.indices.map(i => s"__vd$i"): _*)
  }

  /** [[groupedPrefixSumLong]]'s DECIMAL(38,18) sibling — per-group
    * exact-decimal running sums over one range shuffle, for grouped
    * cumulative FLOAT quantities (e.g. [[Survival.cumulativeIncidence]]'s
    * per-cause hazard increments) where a double window sum would
    * drift at the last ulp whenever partitioning regroups additions.
    * Same recipe: range-shuffle on (group, order, tie), partition-local
    * window, per-(partition, group) offsets joined back broadcast; the
    * offset add runs at (37,18) (see [[withPrefixSumsDec]]). */
  def groupedPrefixSumDec(df: DataFrame, group: Column, order: Column,
      tie: Column, value: Column, outCol: String): DataFrame = {
    val reserved = Seq("__g", "__o", "__t", "__v", "__bkt", "__lps",
      "__goff")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val dec = "decimal(38,18)"
    val nar = "decimal(37,18)"
    val spark = df.sparkSession
    val base = df.withColumn("__g", group).withColumn("__o", order)
      .withColumn("__t", tie).withColumn("__v", value.cast(dec))
    val parts = math.max(2,
      spark.sessionState.conf.numShufflePartitions)
    val ranged = base
      .repartitionByRange(parts, col("__g"), col("__o"), col("__t"))
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val gType = base.schema("__g").dataType
    val sizes = ranged.groupBy("__bkt", "__g")
      .agg(sum(col("__v")).as("s")).collect()
    val byG = sizes.groupBy(_.get(1)).map { case (g, rows) =>
      val sorted = rows.sortBy(_.getInt(0))
      var acc = java.math.BigDecimal.ZERO
      g -> sorted.map { r =>
        val off = acc
        acc = acc.add(Option(r.getDecimal(2))
          .getOrElse(java.math.BigDecimal.ZERO))
        r.getInt(0) -> off
      }.toMap
    }
    val offRows = byG.flatMap { case (g, offs) =>
      offs.map { case (b, off) => org.apache.spark.sql.Row(b, g, off) }
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bkt",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("__g", gType),
      org.apache.spark.sql.types.StructField("__goff",
        org.apache.spark.sql.types.DecimalType(38, 18))))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = Window.partitionBy(col("__bkt"), col("__g"))
      .orderBy(col("__o"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__lps", sum(col("__v")).over(w))
      .join(broadcast(offDf), Seq("__bkt", "__g"))
      .withColumn(outCol, (col("__lps").cast(nar)
        + col("__goff").cast(nar)).cast(dec))
      .drop("__g", "__o", "__t", "__v", "__bkt", "__lps", "__goff")
  }

  /** [[groupedPrefixSumDec]] for SEVERAL value columns in one pass —
    * `sums` maps each input column to its grouped-cumulative output.
    * ONE range shuffle + ONE per-(partition, group) offsets collect
    * serve every column ([[Survival.coxPH]] needs three per Newton
    * round; three single-column calls would triple the actions).
    * Offsets frame is bounded by (#groups + #partitions): within the
    * (group, order, tie) range sort each group spans contiguous
    * buckets. Decimal adds are exact, so the result is bit-identical
    * to any other exact grouped cumulative of the same addends. */
  def groupedPrefixSumsDec(df: DataFrame, group: Column, order: Column,
      tie: Column, sums: Seq[(String, String)]): DataFrame = {
    require(sums.nonEmpty, "nothing to compute")
    val reserved = Seq("__g", "__o", "__t", "__bkt") ++
      sums.indices.flatMap(i => Seq(s"__v$i", s"__lps$i", s"__goff$i"))
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val dec = "decimal(38,18)"
    val nar = "decimal(37,18)"
    val spark = df.sparkSession
    var base = df.withColumn("__g", group).withColumn("__o", order)
      .withColumn("__t", tie)
    sums.zipWithIndex.foreach { case ((v, _), i) =>
      base = base.withColumn(s"__v$i", col(v).cast(dec))
    }
    val parts = math.max(2,
      spark.sessionState.conf.numShufflePartitions)
    val ranged = base
      .repartitionByRange(parts, col("__g"), col("__o"), col("__t"))
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val gType = base.schema("__g").dataType
    val aggs = sums.indices.map(i => sum(col(s"__v$i")).as(s"__t$i"))
    val sizes = ranged.groupBy("__bkt", "__g")
      .agg(aggs.head, aggs.tail: _*).collect()
    val byG = sizes.groupBy(_.get(1)).map { case (g, rows) =>
      val sorted = rows.sortBy(_.getInt(0))
      val accs = Array.fill(sums.size)(java.math.BigDecimal.ZERO)
      g -> sorted.map { r =>
        val offs = accs.clone()
        sums.indices.foreach { i =>
          accs(i) = accs(i).add(Option(r.getDecimal(i + 2))
            .getOrElse(java.math.BigDecimal.ZERO))
        }
        r.getInt(0) -> offs
      }.toMap
    }
    val offRows = byG.flatMap { case (g, offs) =>
      offs.map { case (b, arr) =>
        org.apache.spark.sql.Row.fromSeq(b +: g +: arr.toSeq)
      }
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__bkt",
        org.apache.spark.sql.types.IntegerType) +:
      org.apache.spark.sql.types.StructField("__g", gType) +:
      sums.indices.map(i =>
        org.apache.spark.sql.types.StructField(s"__goff$i",
          org.apache.spark.sql.types.DecimalType(38, 18))))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = Window.partitionBy(col("__bkt"), col("__g"))
      .orderBy(col("__o"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = ranged.join(broadcast(offDf), Seq("__bkt", "__g"))
    sums.zipWithIndex.foreach { case ((_, o), i) =>
      out = out.withColumn(o, (sum(col(s"__v$i")).over(w).cast(nar)
        + col(s"__goff$i").cast(nar)).cast(dec))
    }
    out.drop(reserved: _*)
  }

  /** Cross-partition SUFFIX running minimum over a totally-ordered
    * frame: `outCol` = min of `valueCol` over all rows AT or AFTER
    * each row in `orderCols` order — the fold behind step-down
    * multiple-testing corrections ([[Eval.bhAdjust]]). Same two-level
    * recipe as [[withPrefixSumsLong]] (range shuffle, partition-local
    * window, per-partition minima broadcast as a suffix chain); min is
    * idempotent and commutative, so the result is bit-identical for
    * ANY partition boundary placement with no decimal detour. NULL
    * values are ignored by the fold (rows still receive the suffix
    * min of the non-null tail; NULL only where that tail is empty). */
  def withSuffixMinDouble(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains("__bkt"),
      "input may not contain reserved column __bkt")
    val spark = df.sparkSession
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions)
    val oc = orderCols.map(col)
    val ranged = df.repartitionByRange(parts, oc: _*)
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val per = ranged.groupBy(col("__bkt"))
      .agg(min(col(valueCol).cast("double")).as("__m")).collect()
    val mins: Array[Option[Double]] = Array.fill(parts)(None)
    per.foreach { r =>
      if (!r.isNullAt(1)) mins(r.getInt(0)) = Some(r.getDouble(1))
    }
    // suffix chain: the min over all buckets strictly AFTER b
    val after = new Array[Column](parts)
    var run: Column = lit(null).cast("double")
    ((parts - 1) to 0 by -1).foreach { b =>
      after(b) = run
      mins(b).foreach { m =>
        run = least(run, lit(m)) // least skips NULLs
      }
    }
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(oc.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(outCol, least(
        min(col(valueCol).cast("double")).over(w),
        element_at(array(after.toIndexedSeq: _*), col("__bkt") + 1)))
      .drop("__bkt")
  }

  /** [[withPrefixSum]] with LONG-exact arithmetic throughout: per-bucket
    * totals, broadcast offsets, and the partition-local window sum all
    * stay BIGINT, so the cumulative sum is bit-exact at ANY scale — the
    * double variant is exact only below 2^53, which a 100 TB corpus's
    * cumulative token count exceeds. `valueCol` must be integral (token
    * counts, ranks); the t-digest pass is still used, but only to place
    * bucket BOUNDARIES on the order key — it never touches the values,
    * so its float arithmetic cannot change the result. */
  def withPrefixSumLong(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, buckets: Int = 0): DataFrame = {
    val reserved = Seq("__bkt", "__local")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val requested = math.max(2, if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions)
    val blob = df.agg(gf.tdigest(col(orderCol).cast("double"), lit(1.0),
        200.0).as("s")).head.getAs[Array[Byte]](0)
    val td = graft.core.TDigest.deserialize(blob)
    val rows = td.totalSize.toLong
    val n = effectiveBuckets(requested, rows)
    val bounds =
      if (rows == 0) Array.empty[Double]
      else (1 until n).map(i => td.quantile(i.toDouble / n)).toArray
    val bucketed = Partitioning.assignBuckets(df, orderCol, bounds, "__bkt")
    val totals = bucketed.groupBy(col("__bkt"))
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](bounds.length + 1)
    var acc = 0L
    (0 to bounds.length).foreach { b =>
      offsets(b) = acc
      acc += totals.getOrElse(b, 0L)
    }
    val w = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("__local", sum(col(valueCol).cast("long")).over(w))
      .withColumn(outCol,
        col("__local") + element_at(
          array(offsets.map(lit).toIndexedSeq: _*), col("__bkt") + 1))
      .drop("__bkt", "__local")
  }

  /** Per-GROUP LONG-exact prefix sum — [[withPrefixSumLong]]'s grouped
    * sibling, built on [[graft.ops.Quality.rankBuckets]]'s two-level
    * recipe: ONE range shuffle on (group, order, tie), per-(partition,
    * group) totals collected (partitions × groups rows — small), prefix
    * offsets broadcast back, partition-local window sums stitched. No
    * global window, bit-exact at any scale and parallelism. `tie` must
    * make (group, order, tie) total. */
  def groupedPrefixSumLong(df: DataFrame, group: Column, order: Column,
      tie: Column, value: Column, outCol: String): DataFrame = {
    val reserved = Seq("__g", "__o", "__t", "__v", "__bkt", "__lps",
      "__goff")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val spark = df.sparkSession
    val base = df.withColumn("__g", group).withColumn("__o", order)
      .withColumn("__t", tie).withColumn("__v", value.cast("long"))
    val parts = math.max(2,
      spark.sessionState.conf.numShufflePartitions)
    val ranged = base
      .repartitionByRange(parts, col("__g"), col("__o"), col("__t"))
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val gType = base.schema("__g").dataType
    val sizes = ranged.groupBy("__bkt", "__g")
      .agg(coalesce(sum(col("__v")), lit(0L)).as("s")).collect()
    val byG = sizes.groupBy(_.get(1)).map { case (g, rows) =>
      val sorted = rows.sortBy(_.getInt(0))
      var acc = 0L
      g -> sorted.map { r =>
        val off = acc; acc += r.getLong(2); r.getInt(0) -> off
      }.toMap
    }
    val offRows = byG.flatMap { case (g, offs) =>
      offs.map { case (b, off) => org.apache.spark.sql.Row(b, g, off) }
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__bkt",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("__g", gType),
      org.apache.spark.sql.types.StructField("__goff",
        org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = Window.partitionBy(col("__bkt"), col("__g"))
      .orderBy(col("__o"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__lps", sum(col("__v")).over(w))
      .join(broadcast(offDf), Seq("__bkt", "__g"))
      .withColumn(outCol, col("__lps") + col("__goff"))
      .drop("__g", "__o", "__t", "__v", "__bkt", "__lps", "__goff")
  }

  /** Multi-column LONG-exact distributed prefix sums over one totally-
    * ordered frame — [[groupedPrefixSumLong]]'s ungrouped, multi-value
    * sibling, built for the distinct-value CELL FRAMES of the
    * two-sample/rank statistics ([[Drift.ksTest]], [[Drift.mannWhitney]],
    * [[Eval.aucDeLong]], [[Robust]]'s CDF cells). For a CONTINUOUS score
    * column distinct values ≈ rows, so that frame is corpus-sized and a
    * `Window.partitionBy(lit(1))` over it serializes the corpus through
    * ONE task; here instead: ONE range shuffle on the order key(s),
    * partition-local window sums, per-(partition, column) totals
    * collected (partitions × columns cells — tiny) and broadcast back as
    * exclusive prefix-offset literal arrays. Integer arithmetic end to
    * end, so the result is bit-exact for ANY partition boundary
    * placement, at any parallelism.
    *
    *  - `sums`: value column → inclusive-cumulative output column.
    *  - `totals`: value column → grand-total output column, attached as
    *    a LITERAL (known exactly from the same collected per-partition
    *    totals — no second full-frame window).
    *  - `leadOut`: if set, adds the CROSS-PARTITION lead(1) of the first
    *    order key (NULL on the global last row), stitched through the
    *    broadcast first-key-of-next-nonempty-partition chain.
    *
    * Order keys must be non-null and jointly unique (distinct-value cell
    * frames are, post-groupBy). Runs an eager job (the totals collect)
    * and localCheckpoints the ranged frame so the collected ids match
    * the final pass. */
  def withPrefixSumsLong(df: DataFrame, orderCols: Seq[String],
      sums: Seq[(String, String)], totals: Seq[(String, String)] = Nil,
      leadOut: Option[String] = None): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(sums.nonEmpty || totals.nonEmpty || leadOut.nonEmpty,
      "nothing to compute")
    require(!df.columns.contains("__bkt"),
      "input may not contain reserved column __bkt")
    val spark = df.sparkSession
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions)
    val oc = orderCols.map(col)
    val ranged = df.repartitionByRange(parts, oc: _*)
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    val vals = (sums.map(_._1) ++ totals.map(_._1)).distinct
    val aggs = vals.map(v =>
      coalesce(sum(col(v).cast("long")), lit(0L)).as(s"__s_$v")) ++
      leadOut.map(_ => min(oc.head).as("__fv")).toList
    val per = ranged.groupBy(col("__bkt"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val byBkt = per.map(r => r.getInt(0) -> r).toMap
    val grand = scala.collection.mutable.Map.empty[String, Long]
    val offs: Map[String, Array[Long]] = vals.map { v =>
      val arr = new Array[Long](parts)
      var acc = 0L
      (0 until parts).foreach { b =>
        arr(b) = acc
        acc += byBkt.get(b).map(_.getAs[Long](s"__s_$v")).getOrElse(0L)
      }
      grand(v) = acc
      v -> arr
    }.toMap
    val w = Window.partitionBy(col("__bkt")).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = ranged
    sums.foreach { case (v, o) =>
      out = out.withColumn(o, sum(col(v).cast("long")).over(w) +
        element_at(array(offs(v).map(lit).toIndexedSeq: _*),
          col("__bkt") + 1))
    }
    totals.foreach { case (v, o) => out = out.withColumn(o, lit(grand(v))) }
    leadOut.foreach { o =>
      val dt = df.schema(orderCols.head).dataType
      // first order key per non-empty partition, suffix-chained so an
      // empty partition is transparent
      val firsts: Array[Option[Any]] = (0 until parts).map(b =>
        byBkt.get(b).flatMap(r => Option(r.getAs[Any]("__fv")))).toArray
      val nexts = new Array[Column](parts)
      var run: Column = lit(null).cast(dt)
      ((parts - 1) to 0 by -1).foreach { b =>
        nexts(b) = run
        firsts(b).foreach(v => run = lit(v).cast(dt))
      }
      val wl = Window.partitionBy(col("__bkt")).orderBy(oc: _*)
      out = out.withColumn(o, coalesce(lead(oc.head, 1).over(wl),
        element_at(array(nexts.toIndexedSeq: _*), col("__bkt") + 1)))
    }
    out.drop("__bkt")
  }

  /** Cross-partition ordered gap fill over a totally-ordered frame:
    * `outCol` = the first (forward) / last (backward) NON-NULL
    * `valueCol` at-or-after / at-or-before each row in `orderCols`
    * order — the distributed form of the sort-merge-union lookups in
    * [[Robust.quantileNormalizeExact]] and [[Robust.percentileRank]],
    * replacing their single-task global windows (corpus-sized for
    * continuous score columns). Same recipe as [[withPrefixSumsLong]]:
    * ONE range shuffle, partition-local first/last-non-null window,
    * per-partition edge values collected (≤ partitions rows) and
    * broadcast as the cross-partition fallback chain. The result is
    * independent of partition boundary placement. Order keys must be
    * non-null; rows sharing an order key all receive the same fill, and
    * non-null `valueCol` rows must be unique per order key. NULL when
    * no non-null value exists in the fill direction. */
  def fillAcross(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String, forward: Boolean): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains("__bkt"),
      "input may not contain reserved column __bkt")
    val spark = df.sparkSession
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions)
    val oc = orderCols.map(col)
    val vt = df.schema(valueCol).dataType
    val ranged = df.repartitionByRange(parts, oc: _*)
      .withColumn("__bkt", spark_partition_id())
      .localCheckpoint(eager = false)
    // per partition: the value of its first (forward) / last (backward)
    // non-null row in order — struct min/max is lexicographic on
    // (orderCols…, value), and null structs (null value) are ignored
    val skey = struct(oc :+ col(valueCol).as("__val"): _*)
    val pick =
      if (forward) min(when(col(valueCol).isNotNull, skey))
      else max(when(col(valueCol).isNotNull, skey))
    val per = ranged.groupBy(col("__bkt")).agg(pick.as("__e")).collect()
    val edge: Array[Option[Any]] = Array.fill(parts)(None)
    per.foreach { r =>
      if (!r.isNullAt(1))
        edge(r.getInt(0)) = Some(r.getStruct(1).getAs[Any]("__val"))
    }
    val fb = new Array[Column](parts)
    var run: Column = lit(null).cast(vt)
    if (forward) {
      ((parts - 1) to 0 by -1).foreach { b =>
        fb(b) = run
        edge(b).foreach(v => run = lit(v).cast(vt))
      }
    } else {
      (0 until parts).foreach { b =>
        fb(b) = run
        edge(b).foreach(v => run = lit(v).cast(vt))
      }
    }
    val w =
      if (forward)
        Window.partitionBy(col("__bkt")).orderBy(oc: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(col("__bkt")).orderBy(oc: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local =
      if (forward) first(col(valueCol), ignoreNulls = true).over(w)
      else last(col(valueCol), ignoreNulls = true).over(w)
    ranged.withColumn(outCol,
        coalesce(local, element_at(array(fb.toIndexedSeq: _*),
          col("__bkt") + 1)))
      .drop("__bkt")
  }

  /** One-row packing-efficiency receipt for a token budget — the numbers
    * a team reads to justify packing over per-document padding: packed
    * sequence count and fill statistics from [[packByTokenBudget]]'s
    * contiguous fill, against the naive baseline where every doc sits
    * alone in ⌈tokens/budget⌉ padded sequences. `packing_gain` =
    * naive_seqs / n_bins (how many× fewer sequences the trainer runs);
    * `avg_fill` can exceed 1 only via the straddler contract (a bin's
    * LAST doc may overflow — see class doc). Bin table is bins-sized;
    * the receipt is one aggregation over it plus one corpus-scan sum. */
  def packingStats(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, buckets: Int = 0): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val packed = packByTokenBudget(df, orderCol, tokenCol, budget, buckets)
    val bins = packed.groupBy("bin")
      .agg(sum(col(tokenCol).cast("long")).as("__t"),
        count(lit(1)).as("__docs"))
    val naive = df.agg(coalesce(sum(
      idiv(col(tokenCol).cast("long") + (budget - 1), lit(budget))),
      lit(0L)).as("naive_seqs"))
    bins.agg(
        count(lit(1)).as("n_bins"),
        sum(col("__docs")).as("n_docs"),
        sum(col("__t")).as("total_tokens"),
        round(avg(col("__t") / lit(budget.toDouble)), 6).as("avg_fill"),
        max(col("__t")).as("max_bin_tokens"),
        sum(when(col("__t") > budget, 1L).otherwise(0L))
          .as("n_overflow_bins"))
      .crossJoin(naive) // 1×1 scalar join
      .withColumn("packing_gain",
        round(col("naive_seqs") * lit(1.0) / col("n_bins"), 6))
  }

  /** Context-length selection receipt: for each candidate maximum
    * sequence length, the EXACT truncation cost — how many documents get
    * cut and what fraction of the token mass falls off the end. The
    * table a team reads (next to [[packingStats]]'s padding side) before
    * committing a corpus to a max_len: token_loss_rate is the training
    * signal thrown away, doc_trunc_rate the fraction of docs affected.
    *
    * One corpus scan exploding each row onto the (small, literal)
    * candidate-length list; after map-side combine the shuffle is
    * |maxLens| × groups × partitions partial rows — corpus-size
    * independent. Exact integer sums; NULL token counts are excluded.
    * Returns one row per (groupCols…, max_len): (…, max_len, n_docs,
    * n_trunc_docs, n_tokens, tokens_kept, token_loss_rate,
    * doc_trunc_rate). */
  def truncationStats(df: DataFrame, tokenCol: Column, maxLens: Seq[Int],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(maxLens.nonEmpty, "maxLens must be non-empty")
    require(maxLens.forall(_ >= 1), "every candidate length must be >= 1")
    require(maxLens.distinct.size == maxLens.size,
      "candidate lengths must be distinct")
    val g = groupCols.map(col)
    val rows = df.select(g :+ tokenCol.cast("long").as("__t"): _*)
      .where(col("__t").isNotNull)
      .select(g ++ Seq(col("__t"),
        explode(array(maxLens.map(lit).toIndexedSeq: _*))
          .as("max_len")): _*)
    rows.groupBy(g :+ col("max_len"): _*)
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("__t") > col("max_len"), 1L)
          .otherwise(0L)), lit(0L)).as("n_trunc_docs"),
        coalesce(sum(col("__t")), lit(0L)).as("n_tokens"),
        coalesce(sum(least(col("__t"), col("max_len").cast("long")))
          , lit(0L)).as("tokens_kept"))
      .withColumn("token_loss_rate",
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("tokens_kept")).cast("double") /
            col("n_tokens")).otherwise(lit(0.0)))
      .withColumn("doc_trunc_rate",
        col("n_trunc_docs").cast("double") / col("n_docs"))
  }

  /** Whole-document bin packing — NO straddler: every bin's payload fits
    * within `budget` and documents are never split, the contract when
    * sequences carry per-document attention masks and a doc must not
    * span bins. The cost of that guarantee is padding; this packer
    * bounds it with HARMONIC FIRST-FIT (Lee & Lee 1985, the classic
    * online bin-packing family), which is embarrassingly parallel where
    * true first-fit-decreasing is inherently sequential bin state:
    *
    *  - class k (1 ≤ k < classes) holds docs with
    *    k = ⌊budget/len⌋, i.e. budget/(k+1) < len ≤ budget/k — ANY k of
    *    them fit a bin and k+1 never do, so the class packs exactly k
    *    per bin by rank and the order within the class cannot change the
    *    bin count;
    *  - the tail class (len ≤ budget/classes) contiguous-fills against
    *    the EFFECTIVE capacity budget − ⌊budget/classes⌋, so the
    *    floor-division bin assignment can never overflow the true
    *    budget (a bin's fill is < capacity + max tail length ≤ budget);
    *  - docs LONGER than budget get a bin of their own (class 0) —
    *    flagged by [[packingStatsFit]], truncated downstream by policy.
    *
    * Every class is a distributed prefix rank/sum over `idCol`
    * ([[withPrefixSum]]'s two-level scan — no sequential bin walk, no
    * global single-partition window), so a 100 TB corpus packs
    * identically on every rerun. Returns the input plus `bin`: UNIQUE
    * (not dense) long ids, class-prefixed as class·2⁴⁰ + ordinal so no
    * cross-class coordination pass is needed. */
  def packFitWhole(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, classes: Int = 8, buckets: Int = 0,
      smallInputRows: Long = 2000000L): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    require(classes >= 2 && classes <= 64, "classes must be in [2, 64]")
    val capTail = budget - budget / classes
    val t = col(tokenCol).cast("long")
    // integer-only end to end (the q202 oracle is pure BIGINT `//`): a
    // double division that rounds differently at a class boundary would
    // misclassify a doc — idiv is bit-identical to the oracle
    val cls = when(t > budget, lit(0))
      .when(t <= 0, lit(classes))
      .otherwise(least(lit(classes.toLong), idiv(lit(budget), t)).cast("int"))
    // the rank passes run over a checkpointed NARROW (id, tokens, class)
    // projection — ~20 bytes/row — so the (possibly text-wide) input is
    // scanned once here and once for the final join-back, never per class
    val narrow = df.select(col(idCol), t.as("__t"), cls.as("__cls"))
      .localCheckpoint(eager = false)
    // two tiers (Dedup.components precedent, identical results): below
    // smallInputRows one window pass partitioned by class does all the
    // ranks/cumsums (classes+1 partitions — fine for small frames, a
    // single-task-per-class bottleneck at corpus scale); above it, one
    // DISTRIBUTED prefix scan per class (classes+1 bounded passes over
    // the narrow checkpoint, no global window anywhere)
    val assigned = (if (narrow.count() <= smallInputRows) {
      val w = Window.partitionBy(col("__cls")).orderBy(col(idCol))
      narrow
        .withColumn("__rk", row_number().over(w).cast("long"))
        .withColumn("__cum", sum(col("__t")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__cbin",
          when(col("__cls") === 0, col("__rk") - 1)
            .when(col("__cls") < classes,
              idiv(col("__rk") - 1, col("__cls")))
            .otherwise(idiv(col("__cum") - col("__t"), lit(capTail))))
    } else {
      (0 to classes).map { k =>
        val sub = narrow.where(col("__cls") === k)
        if (k == classes)
          withPrefixSumLong(sub, idCol, "__t", "__cum", buckets)
            .withColumn("__cbin",
              idiv(col("__cum") - col("__t"), lit(capTail)))
            .drop("__cum")
        else {
          val perBin = math.max(k, 1) // class 0: one doc per bin
          withPrefixSumLong(sub.withColumn("__one", lit(1L)), idCol, "__one",
              "__rk", buckets)
            .withColumn("__cbin", idiv(col("__rk") - 1, lit(perBin.toLong)))
            .drop("__one", "__rk")
        }
      }.reduce(_.unionByName(_))
    }).select(col(idCol),
      (col("__cls").cast("long") * lit(1L << 40) + col("__cbin"))
        .as("bin"))
    // plain hash join (assignments are corpus-sized — never broadcast)
    df.join(assigned, Seq(idCol))
  }

  /** One-row receipt for [[packFitWhole]] — [[packingStats]]'s shape for
    * the no-straddler packer, directly comparable to the contiguous-fill
    * gain: bins can never overflow (oversize docs are counted apart), so
    * `avg_fill` IS the padding efficiency and
    * `packing_gain = naive_seqs / n_bins` uses the same naive baseline
    * as [[packingStats]]. */
  def packingStatsFit(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, classes: Int = 8, buckets: Int = 0,
      smallInputRows: Long = 2000000L): DataFrame = {
    val packed = packFitWhole(df, idCol, tokenCol, budget, classes,
      buckets, smallInputRows)
    val t = col(tokenCol).cast("long")
    val bins = packed.groupBy("bin")
      .agg(sum(t).as("__t"), count(lit(1)).as("__docs"))
    val naive = df.agg(
      coalesce(sum(idiv(t + (budget - 1), lit(budget))), lit(0L))
        .as("naive_seqs"),
      coalesce(sum(when(t > budget, 1L).otherwise(0L)), lit(0L))
        .as("n_oversize_docs"))
    bins.agg(
        count(lit(1)).as("n_bins"),
        sum(col("__docs")).as("n_docs"),
        sum(col("__t")).as("total_tokens"),
        round(avg(col("__t") / lit(budget.toDouble)), 6).as("avg_fill"),
        max(col("__t")).as("max_bin_tokens"))
      .crossJoin(naive) // 1×1 scalar join
      .withColumn("packing_gain",
        round(col("naive_seqs") * lit(1.0) / col("n_bins"), 6))
  }

  /** Packs rows into bins of ≈`budget` tokens: adds `bin` (0-based) and
    * `bin_offset` (tokens before this row within its bin). Deterministic in
    * `orderCol` order; see the class doc for the straddler contract. */
  def packByTokenBudget(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, buckets: Int = 0): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    // token counts are integral by contract — LONG-exact cumsum + integral
    // div keep bin boundaries bit-exact past 2^53 cumulative tokens
    val withCum = withPrefixSumLong(df, orderCol, tokenCol, "__cum", buckets)
    val before = col("__cum") - col(tokenCol).cast("long")
    withCum
      .withColumn("bin", idiv(before, lit(budget)))
      .withColumn("bin_offset", (before - col("bin") * lit(budget)).cast("long"))
      .drop("__cum")
  }

  /** GPT-style concat-and-chunk sample construction — the OTHER standard
    * pretraining packer next to [[packFitWhole]]: every document's id
    * stream gets an `eosId` separator appended, streams concatenate in
    * ascending `idCol` order into one virtual corpus-length token
    * stream, and the stream splits into consecutive `seqLen`-token
    * samples (documents STRADDLE sample boundaries — that is the point:
    * zero padding except the final partial sample, which right-pads
    * with `padId`, or drops when `dropRemainder`). Output:
    * (sample_id 0-based dense, ids exactly seqLen, n_pad).
    *
    * Scale shape: the global token position of every document comes
    * from ONE distributed LONG-exact prefix sum over doc lengths
    * ([[withPrefixSumLong]] — no corpus-wide window, bit-exact past 2⁵³
    * cumulative tokens); each doc then slices itself into its ≤
    * ⌈n/seqLen⌉+1 overlapping samples scan-side (pure built-in
    * expressions), and ONE hash shuffle on sample_id regroups the
    * pieces — the only corpus-sized movement, with ≤ seqLen ids held
    * per group at assembly. Deterministic at any parallelism: piece
    * order within a sample is pinned by global position, never by
    * arrival. Size `spark.sql.shuffle.partitions` to the token volume
    * (the spanCorrupt discipline).
    *
    * `boundaries = true` adds `doc_starts: array<long>` — the 0-based
    * positions within each sample where a DOCUMENT's first token lands
    * (a straddler's continuation is not a start). This is the carry a
    * packed-pretraining trainer needs to build block-diagonal attention
    * masks / reset position ids per document; a sample fully inside one
    * straddling document has an empty array. Computed scan-side from
    * the same prefix positions — no extra pass. */
  def concatChunk(encoded: DataFrame, idCol: String, idsCol: String,
      seqLen: Int, eosId: Long, padId: Long = 0L,
      dropRemainder: Boolean = false, boundaries: Boolean = false,
      buckets: Int = 0, appendSep: Boolean = true): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val reserved = Seq("__ids", "__n", "__end", "__start")
    require(!encoded.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val L = lit(seqLen.toLong)
    val framed = coalesce(col(idsCol), array().cast("array<long>"))
    val withEos0 = encoded.select(col(idCol),
      (if (appendSep) concat(framed, array(lit(eosId))) else framed)
        .as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
    // appendSep=false streams arrive pre-framed (e.g. bos/eos from
    // Chat.encodeTurns); an EMPTY stream must contribute nothing — and
    // would otherwise build a DESCENDING covering-sample sequence
    // (__end-1 < __start)
    val withEos =
      if (appendSep) withEos0 else withEos0.where(col("__n") > 0)
    val pos = withPrefixSumLong(withEos, idCol, "__n", "__end", buckets)
      .withColumn("__start", col("__end") - col("__n"))
    // each doc explodes into its covering samples and slices itself to
    // the overlap — from/len are per-doc-bounded ints, codegen'd
    val sampleCol = explode(sequence(idiv(col("__start"), L),
      idiv(col("__end") - 1, L))).as("sample_id")
    val p0 = greatest(col("sample_id") * L, col("__start"))
    val pieces = pos
      .select(col("__start"), col("__end"), col("__ids"), sampleCol)
      .select(col("sample_id"),
        p0.as("__p0"),
        slice(col("__ids"),
          (p0 - col("__start") + 1).cast("int"),
          (least((col("sample_id") + 1) * L, col("__end")) - p0)
            .cast("int")).as("__piece"),
        // the doc's first token lands in THIS sample ⇒ its in-sample
        // offset is a document start (null otherwise; collect_list
        // drops nulls at assembly)
        when(p0 === col("__start"),
          col("__start") - col("sample_id") * L).as("__bnd"))
    val assembled = pieces
      .groupBy("sample_id")
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("__p0"), col("__piece")))),
          x => x.getField("__piece"))).as("ids"),
        array_sort(collect_list(col("__bnd"))).as("doc_starts"))
    val samples = (if (boundaries) assembled
      else assembled.drop("doc_starts"))
      .withColumn("n_pad", (L - size(col("ids"))).cast("long"))
    if (dropRemainder) samples.where(col("n_pad") === 0L)
    else samples.withColumn("ids",
      concat(col("ids"),
        array_repeat(lit(padId), col("n_pad").cast("int"))))
  }

  /** [[concatChunk]] over PAIRED (ids, loss-mask) streams — packed SFT:
    * whole conversations (already framed with bos/eos by
    * [[Chat.encodeTurns]], so NO separator is injected) concatenate in
    * `idCol` order and split into `seqLen`-token samples with the loss
    * mask carried through in exact lockstep; pad positions carry
    * (`padId`, mask 0). Output: (sample_id, ids, mask, n_pad
    * [, doc_starts]).
    *
    * Mechanism: the mask bit-packs into each id's LOW BIT
    * (`packed = id·2 + mask`), the pair rides the single-stream packer
    * unchanged — same ONE prefix sum + ONE sample-keyed shuffle, same
    * determinism contract — and unpacks scan-side. Ids must be
    * nonnegative (every graft encode is, after the reserved-block
    * shift) and below 2⁶²; the mask must be 0/1.
    *
    * 100 TB note: this adds ZERO movement over [[concatChunk]] — the
    * mask travels inside the ids it annotates, so the shuffle volume,
    * partitioning, and plan shape are byte-identical to the unmasked
    * packer. */
  def concatChunkMasked(encoded: DataFrame, idCol: String, idsCol: String,
      maskCol: String, seqLen: Int, padId: Long = 0L,
      dropRemainder: Boolean = false, boundaries: Boolean = false,
      buckets: Int = 0): DataFrame = {
    val packed = zip_with(col(idsCol), col(maskCol),
      (i, m) => i * lit(2L) + m.cast("long"))
    val base = encoded.select(col(idCol), packed.as("__pk"))
    val chunked = concatChunk(base, idCol, "__pk", seqLen,
      eosId = 0L /* unused: appendSep=false */, padId = padId * 2L,
      dropRemainder = dropRemainder, boundaries = boundaries,
      buckets = buckets, appendSep = false)
    chunked
      .withColumn("mask",
        transform(col("ids"), x => pmod(x, lit(2L)).cast("int")))
      .withColumn("ids", transform(col("ids"), x => idiv(x, lit(2L))))
  }

  /** Per-position position ids for a [[concatChunk]] sample — the
    * column a packed-pretraining trainer feeds as `position_ids`:
    * position counts up from 0 at the sample start and RESETS at every
    * document start (`doc_starts` from `boundaries = true`), so
    * attention with a block-diagonal mask sees per-document positions
    * exactly as if the docs were unpacked. A straddler carried in from
    * the previous sample restarts at 0 (the standard packed-training
    * convention — its earlier tokens are not attendable anyway). Pure
    * built-in expressions, O(seqLen · |doc_starts|) scan-side. */
  def positionIds(docStarts: Column, seqLen: Int): Column = {
    require(seqLen >= 1, "seqLen must be >= 1")
    transform(sequence(lit(0L), lit(seqLen - 1L)), i =>
      i - coalesce(array_max(filter(docStarts, b => b <= i)), lit(0L)))
  }

  /** Provenance index of a [[concatChunk]] layout: one row per
    * (document, sample) overlap with the token count contributed — the
    * structure a deletion request or an attribution query needs
    * ("which training samples contain doc X, and how much of them is
    * it"), and the inverse of q234's per-sample boundary view. Pure
    * scan-side arithmetic on the SAME prefix positions as the packer
    * (one distributed prefix sum, one per-doc explode into covering
    * samples, NO assembly shuffle), so the index always agrees with
    * the layout it describes. Output: (idCol, sample_id, n_tokens);
    * the per-doc eos separator counts toward its document. */
  def chunkProvenance(encoded: DataFrame, idCol: String, idsCol: String,
      seqLen: Int, eosId: Long, buckets: Int = 0,
      appendSep: Boolean = true): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val reserved = Seq("__ids", "__n", "__end", "__start")
    require(!encoded.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val L = lit(seqLen.toLong)
    val framed = coalesce(col(idsCol), array().cast("array<long>"))
    val withEos0 = encoded.select(col(idCol),
      (if (appendSep) concat(framed, array(lit(eosId))) else framed)
        .as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
    // appendSep=false (pre-framed SFT streams): empty streams overlap
    // nothing — and must not build a descending covering range
    val withEos =
      if (appendSep) withEos0 else withEos0.where(col("__n") > 0)
    val pos = withPrefixSumLong(withEos, idCol, "__n", "__end", buckets)
      .withColumn("__start", col("__end") - col("__n"))
    val sampleCol = explode(sequence(idiv(col("__start"), L),
      idiv(col("__end") - 1, L))).as("sample_id")
    val p0 = greatest(col("sample_id") * L, col("__start"))
    pos.select(col(idCol), col("__start"), col("__end"), sampleCol)
      .select(col(idCol), col("sample_id"),
        (least((col("sample_id") + 1) * L, col("__end")) - p0)
          .as("n_tokens"))
  }

  /** Carry state of a STREAMING [[concatChunk]]: the (< seqLen) tail
    * tokens not yet emitted plus the next global sample id. */
  case class ChunkCarry(tail: Seq[Long], nextSampleId: Long)

  /** One micro-batch step of a streaming [[concatChunk]] — the
    * "tokenize + pack an arriving crawl" serving shape: chunk THIS
    * batch's documents (in ascending `idCol` order) continuing from
    * `carry`, emit every FULL sample with globally-sequential ids, and
    * return the new carry. Folding this over doc-ordered micro-batches
    * and then [[flushCarry]]-ing is EXACTLY [[concatChunk]] of the
    * whole corpus (gate-pinned): the carry is the complete inter-batch
    * state, so the stream never re-reads history.
    *
    * Per batch: one distributed prefix sum + one sample-keyed shuffle
    * (both batch-sized, as in [[concatChunk]]) + one O(seqLen) driver
    * collect for the new tail. */
  def chunkBatchWithCarry(encoded: DataFrame, idCol: String,
      idsCol: String, seqLen: Int, eosId: Long,
      carry: ChunkCarry, appendSep: Boolean = true)
      : (DataFrame, ChunkCarry) = {
    require(seqLen >= 1, "seqLen must be >= 1")
    require(carry.tail.size < seqLen,
      s"carry holds ${carry.tail.size} tokens — must be < seqLen=$seqLen")
    val spark = encoded.sparkSession
    import spark.implicits._
    val L = lit(seqLen.toLong)
    val c = carry.tail.size.toLong
    val framed = coalesce(col(idsCol), array().cast("array<long>"))
    val withEos0 = encoded.select(col(idCol),
      (if (appendSep) concat(framed, array(lit(eosId))) else framed)
        .as("__ids"))
      .withColumn("__n", size(col("__ids")).cast("long"))
    // appendSep=false (pre-framed SFT streams, concatChunkMasked's
    // framing rule): empty streams contribute nothing — and must not
    // build a descending covering-sample range
    val withEos =
      (if (appendSep) withEos0 else withEos0.where(col("__n") > 0))
        .localCheckpoint(eager = false)
    val agg0 = withEos
      .agg(coalesce(sum(col("__n")), lit(0L)), count(lit(1))).head
    val total = c + agg0.getLong(0)
    val rows = agg0.getLong(1)
    val fullSamples = total / seqLen
    // micro-batch tier (packFitWhole's smallInputRows precedent,
    // identical results): a batch-sized frame takes ONE global window
    // pass instead of the two-level scan's digest + totals + bucketed
    // window — the difference between a streaming trigger costing 2
    // jobs and 6. The distributed path kicks in for corpus-sized calls.
    val pos = (if (rows <= 2000000L) {
      val w = Window.orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withEos.withColumn("__end", sum(col("__n")).over(w))
    } else withPrefixSumLong(withEos, idCol, "__n", "__end"))
      .withColumn("__start", col("__end") - col("__n") + lit(c))
      .withColumn("__end", col("__end") + lit(c))
    val sampleCol = explode(sequence(idiv(col("__start"), L),
      idiv(col("__end") - 1, L))).as("__s")
    val p0 = greatest(col("__s") * L, col("__start"))
    val docPieces = pos
      .select(col("__start"), col("__end"), col("__ids"), sampleCol)
      .select(col("__s"), p0.as("__p0"),
        slice(col("__ids"),
          (p0 - col("__start") + 1).cast("int"),
          (least((col("__s") + 1) * L, col("__end")) - p0).cast("int"))
          .as("__piece"))
    val pieces =
      if (carry.tail.isEmpty) docPieces
      else docPieces.unionByName(
        Seq((0L, 0L, carry.tail)).toDF("__s", "__p0", "__piece"))
    val assembled = pieces.groupBy("__s")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p0"), col("__piece")))),
        x => x.getField("__piece"))).as("ids"))
    val emitted = assembled.where(col("__s") < fullSamples)
      .select((col("__s") + lit(carry.nextSampleId)).as("sample_id"),
        col("ids"))
    val newTail = assembled.where(col("__s") === fullSamples)
      .collect().headOption
      .map(_.getSeq[Long](1).toSeq).getOrElse(Seq.empty)
    (emitted, ChunkCarry(newTail, carry.nextSampleId + fullSamples))
  }

  /** Persist a [[ChunkCarry]] (the streaming chunker's complete
    * inter-batch state, < seqLen ids + one counter) plus the micro-batch
    * id that produced it, so a RESTARTED stream resumes exactly where
    * the previous run stopped. One tiny parquet, the
    * [[graft.ops.TokenizerStore]] layout discipline.
    *
    * Restart contract (foreachBatch is AT-LEAST-ONCE — Structured
    * Streaming replays any batch whose source checkpoint didn't
    * commit): the handler must be idempotent. Recipe, drive-verified:
    *   1. `(carry, last) = loadCarry(dir)`; if `batchId == last`, the
    *      batch is a replay of work already carried — recompute is
    *      fine ONLY if step 2 is keyed, or skip outright;
    *   2. write the batch's samples to a batch-keyed location
    *      (`.../batch=<batchId>`, mode overwrite) — a replay overwrites
    *      instead of duplicating;
    *   3. `saveCarry(dir, next, batchId)` LAST.
    * A crash between 2 and 3 replays the batch from the OLD carry and
    * overwrites the SAME output — state and output stay consistent. */
  def saveCarry(spark: org.apache.spark.sql.SparkSession, dir: String,
      carry: ChunkCarry, batchId: Long = -1L): Unit = {
    import spark.implicits._
    Seq((carry.tail, carry.nextSampleId, batchId))
      .toDF("tail", "next_sample_id", "batch_id")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[saveCarry]] layout: the carry and the batch id that wrote
    * it (−1 for a fresh layout). */
  def loadCarry(spark: org.apache.spark.sql.SparkSession,
      dir: String): (ChunkCarry, Long) = {
    val r = spark.read.parquet(dir).head
    (ChunkCarry(r.getSeq[Long](0).toList, r.getLong(1)), r.getLong(2))
  }

  /** End-of-stream step for [[chunkBatchWithCarry]]: the final partial
    * sample, right-padded with `padId` (None when the stream ended on a
    * sample boundary). */
  def flushCarry(carry: ChunkCarry, seqLen: Int,
      padId: Long = 0L): Option[(Long, Seq[Long], Long)] =
    if (carry.tail.isEmpty) None
    else Some((carry.nextSampleId,
      carry.tail ++ Seq.fill(seqLen - carry.tail.size)(padId),
      (seqLen - carry.tail.size).toLong))

  /** Block-diagonal attention-cost receipt over a `boundaries = true`
    * packed layout ([[concatChunk]]'s `doc_starts`): the reset points
    * {0} ∪ doc_starts split each seqLen frame into attention blocks
    * (a straddling document's tail is its own block — position ids
    * restart at the sample edge, q236's rule), and with block-diagonal
    * masking the per-sample attention cost is Σ len_i² instead of the
    * dense seqLen². Adds `n_blocks`, `cost_blocks`, `cost_saved`
    * (= seqLen² − Σ len²) — the batch-shaping signal that says what
    * packed attention actually buys per sample. Scan-side arithmetic
    * on the starts array; no shuffle, all LONG-exact. */
  def attentionCost(samples: DataFrame, seqLen: Int,
      startsCol: String = "doc_starts"): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    require(!samples.columns.exists(
      Set("n_blocks", "cost_blocks", "cost_saved", "__rst", "__lens")),
      "input may not contain reserved attention-cost columns")
    val resets = sort_array(array_distinct(
      concat(array(lit(0L)), coalesce(col(startsCol),
        array().cast("array<long>")))))
    samples
      .withColumn("__rst", resets)
      .withColumn("n_blocks", size(col("__rst")).cast("long"))
      .withColumn("cost_blocks", aggregate(
        zip_with(slice(concat(col("__rst"), array(lit(seqLen.toLong))),
            lit(1), size(col("__rst"))),
          slice(concat(col("__rst"), array(lit(seqLen.toLong))),
            lit(2), size(col("__rst"))),
          (a, b) => b - a),
        lit(0L), (acc, x) => acc + x * x))
      .withColumn("cost_saved",
        lit(seqLen.toLong * seqLen) - col("cost_blocks"))
      .drop("__rst")
  }

  /** Prefix-cache sharing receipts (the RadixAttention / prompt-cache
    * accounting, Zheng et al. 2024 "SGLang"): requests whose first
    * `prefixLen` ids are IDENTICAL share one cached prefix, so a bucket
    * of n such sequences recomputes the prefix once and saves
    * `(n − 1) · prefix_len` prefill tokens. One row per distinct
    * prefix: `(prefix_ids, prefix_len, n_seqs, total_tokens,
    * tokens_saved)` — sequences shorter than `prefixLen` bucket by
    * their whole id list (they still share what exists).
    *
    * One shuffle, keyed by the prefix slice itself — a bounded-width
    * key (≤ prefixLen ids), never the full sequence; counts combine
    * map-side, so 100 TB of request logs reduce to one row per
    * distinct prefix. The element type is generic (token ids, string
    * tokens, …). */
  def prefixCacheStats(df: DataFrame, idsCol: Column,
      prefixLen: Int): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 4096,
      "prefixLen must be in [1, 4096]")
    df.where(idsCol.isNotNull)
      .select(slice(idsCol, 1, prefixLen).as("prefix_ids"),
        size(idsCol).cast("long").as("__len"))
      .groupBy(col("prefix_ids"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("__len")).as("total_tokens"))
      .withColumn("prefix_len", size(col("prefix_ids")).cast("long"))
      .withColumn("tokens_saved",
        (col("n_seqs") - 1) * col("prefix_len"))
      .select(col("prefix_ids"), col("prefix_len"), col("n_seqs"),
        col("total_tokens"), col("tokens_saved"))
  }

  /** KV-cache page accounting (the PagedAttention allocation model,
    * Kwon et al. 2023 "vLLM"): a sequence of `len` tokens pins
    * `ceil(len / pageSize)` cache pages, wasting `pages·pageSize − len`
    * slots to internal fragmentation in its last page. Per group:
    * `(groupCols…, n_seqs, total_tokens, total_pages, frag_tokens,
    * util)` with `util = total_tokens / (total_pages · pageSize)` —
    * the capacity-planning receipt for a serving fleet (how many
    * sequences fit a GPU's page pool) and for choosing pageSize.
    * All-LONG arithmetic in one map-side-combined aggregation;
    * NULL/negative lengths are refused work. */
  def kvPageStats(df: DataFrame, groupCols: Seq[String],
      lenCol: Column, pageSize: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(pageSize >= 1, "pageSize must be >= 1")
    val len = lenCol.cast("long")
    val pages = idiv(len + (pageSize - 1), lit(pageSize.toLong))
    df.where(len.isNotNull && len >= 0)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_seqs"),
        sum(len).as("total_tokens"),
        sum(pages).as("total_pages"))
      .withColumn("frag_tokens",
        col("total_pages") * pageSize - col("total_tokens"))
      .withColumn("util", col("total_tokens").cast("double") /
        (col("total_pages") * pageSize).cast("double"))
  }

  /** Length-bucketed batch padding receipts — the dynamic-batching
    * planner's input: sequences sort into `buckets` equal-count bins by
    * exact global length rank (smallest lengths in bucket 0), each
    * batch pads to ITS bucket's max, and the receipt prices that
    * choice: `pad_waste = n·max_len − Σ len` per bucket. Σ pad_waste
    * across buckets vs the one-bucket row (`buckets = 1`) is exactly
    * what length-grouping saves. One row per bucket:
    * `(bucket, n, min_len, max_len, sum_len, pad_waste)` — all LONGs.
    *
    * Scale shape: [[graft.sources.Shards.assignShardsOrdered]]'s
    * two-level range rank (ONE range shuffle, no global window) plus a
    * bucket-count-sized aggregation; `tie` must make the length order
    * total (the usual doc id). */
  def padBuckets(df: DataFrame, lenCol: Column, tieCol: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      "buckets must be in [1, 2^20]")
    val rows = df.select(lenCol.cast("long").as("__len"),
        tieCol.as("__tie"))
      .where(col("__len").isNotNull)
    // shardCol must not be named "bucket": assignShardsOrdered drops an
    // internal rankBuckets column of that name on its way out
    graft.sources.Shards.assignShardsOrdered(rows, col("__len"),
        col("__tie"), buckets, "__padbin")
      .groupBy(col("__padbin").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__len")).as("min_len"),
        max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .withColumn("pad_waste",
        col("n") * col("max_len") - col("sum_len"))
  }
}
