package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — the time-series join Spark has no native
  * operator for (cf. pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * For every probe row, attach the single build row with the same keys and
  * the latest `buildTime <= probeTime` (backward, the default) or the
  * earliest `buildTime >= probeTime` (forward). Inclusive on equality, like
  * both reference implementations.
  *
  * Plan shape (the part that matters at 100 TB): a naive formulation is a
  * range join — Catalyst can only run `p.key = b.key AND p.ts >= b.ts` as a
  * join-then-filter with a per-key cross product, quadratic in events per
  * key. Instead the two sides are unioned with a side marker and processed
  * by ONE window pass: partition by key, order by (time, side), and carry
  * the last build row forward with a running `last(ignoreNulls)` over an
  * UnboundedPreceding frame — Spark evaluates that frame incrementally, so
  * the whole join is one shuffle on the keys plus a partition-local sort:
  * O(n log n) per key group, no cross product, no broadcast requirement on
  * either side.
  *
  * The build row is carried as ONE struct, not per-column: `last(col,
  * ignoreNulls)` applied per column would resurrect older values for
  * columns that are legitimately NULL in the nearest build row, silently
  * stitching fields of different rows together.
  */
object AsOf {

  /** Internal working columns; inputs may not use these names (silent
    * breakage otherwise — guarded by a require). */
  private val ReservedCols =
    Seq("__t", "__side", "__brow", "__match", "__split", "__b_edge", "__carry")

  private def assertNoReserved(probe: DataFrame, build: DataFrame): Unit = {
    val clash = (probe.columns ++ build.columns).filter(ReservedCols.contains)
    require(clash.isEmpty,
      s"as-of join inputs may not contain reserved column names: " +
        clash.distinct.mkString(", "))
  }

  /** @param probe         left side; one output row per probe row
    *                      (left-outer by default)
    * @param build         right side; contributes its non-key columns,
    *                      suffixed with `buildSuffix`
    * @param on            equi-join keys (must be non-empty: a keyless
    *                      as-of would serialize onto one task). SQL NULL
    *                      semantics: a NULL in any key (either side) or in
    *                      either time column never matches — same as
    *                      DuckDB/pandas ASOF, and identical across all
    *                      as-of variants here.
    * @param probeTime     event-time column of `probe` (timestamp or numeric)
    * @param buildTime     event-time column of `build`; cast to
    *                      `probeTime`'s type
    * @param forward       match earliest build at-or-after instead of
    *                      latest at-or-before
    * @param toleranceSec  max |probeTime − buildTime| in seconds; farther
    *                      matches are nulled out (pandas `tolerance`)
    * @param inner         drop unmatched probe rows instead of keeping them
    *                      with NULL build columns
    * @param timeSplits    hot-key mitigation: when > 1, each key's timeline
    *                      is range-partitioned into up to `timeSplits`
    *                      sub-ranges (boundaries from an approx-quantile
    *                      pass over the probe times) so a single
    *                      pathologically hot key sorts on `timeSplits`
    *                      tasks instead of one; matches that cross a split
    *                      boundary are repaired by a tiny per-(key,split)
    *                      boundary relay (keys×splits rows), broadcast back.
    *                      Results are identical to the default path unless
    *                      a key has duplicate build timestamps (then which
    *                      of the tied rows wins is nondeterministic in both
    *                      paths). Costs one extra aggregation pass over the
    *                      probe times.
    */
  def joinAsOf(probe: DataFrame, build: DataFrame, on: Seq[String],
      probeTime: String, buildTime: String, forward: Boolean = false,
      toleranceSec: Option[Double] = None, buildSuffix: String = "_b",
      inner: Boolean = false, timeSplits: Int = 1): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key " +
      "(a keyless as-of join cannot be distributed)")
    assertNoReserved(probe, build)
    val tType = probe.schema(probeTime).dataType
    val probeRest = probe.columns.filterNot(on.contains).toSeq
    val buildVals = build.columns.filterNot(on.contains).toSeq
    val bOut = buildVals.map(_ + buildSuffix)

    // SQL NULL semantics: NULL-keyed / NULL-timed build rows match nothing,
    // so drop them before the union — probe rows in a NULL-key partition
    // then see no build rows at all and fall out unmatched, as required
    val bClean = build.where(
      on.map(col(_).isNotNull).reduce(_ && _) &&
        col(buildTime).cast(tType).isNotNull)

    val browType = org.apache.spark.sql.types.StructType(
      buildVals.map(c => org.apache.spark.sql.types.StructField(
        c + buildSuffix, build.schema(c).dataType, build.schema(c).nullable)))
    val pSide = probe.select(
      on.map(col) ++
        Seq(col(probeTime).cast(tType).as("__t"), lit(1).as("__side")) ++
        probeRest.map(col) :+
        lit(null).cast(browType).as("__brow"): _*)
    val bSide = bClean.select(
      on.map(col) ++
        Seq(col(buildTime).cast(tType).as("__t"), lit(0).as("__side")) ++
        probeRest.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        struct(buildVals.zip(bOut).map { case (c, o) => col(c).as(o) }: _*)
          .as("__brow"): _*)

    val ord: Seq[Column] =
      Seq(if (forward) col("__t").desc else col("__t").asc, col("__side").asc)

    val withMatch =
      if (timeSplits <= 1) {
        val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pSide.unionByName(bSide)
          .withColumn("__match",
            last(col("__brow"), ignoreNulls = true).over(w))
          .where(col("__side") === 1)
      } else {
        splitCarried(probe, probeTime, tType, pSide, bSide, on, ord, forward,
          timeSplits)
      }

    // a NULL probe time never matches (desc ordering would otherwise sort
    // NULLs last and hand them the final carried build row)
    val carried = withMatch.withColumn("__match",
      when(col("__t").isNotNull, col("__match")))

    // tolerance compares in seconds on the double view of the time type
    // (timestamps cast to fractional epoch seconds, numerics to themselves)
    val gated = toleranceSec match {
      case Some(tol) =>
        val matchTime = col("__match")(buildTime + buildSuffix)
        carried.withColumn("__match",
          when(abs(col("__t").cast("double") - matchTime.cast("double"))
            <= lit(tol), col("__match")))
      case None => carried
    }
    val filtered = if (inner) gated.where(col("__match").isNotNull) else gated
    filtered.select(
      on.map(col) ++ probeRest.map(col) ++
        bOut.map(o => col("__match")(o).as(o)): _*)
  }

  /** Hot-key path: range-partition each key's timeline into `timeSplits`
    * sub-ranges and run the window per (key, split), so one hot key's sort
    * spreads over `timeSplits` tasks. A probe row whose true match lies in
    * an earlier split (or later, for forward joins) is repaired from a
    * boundary relay: the last (first) build row of every (key, split) —
    * keys×splits rows, aggregated map-side — prefix-carried across splits
    * on a complete key×split grid and broadcast-joined back. */
  private def splitCarried(probe: DataFrame, probeTime: String,
      tType: org.apache.spark.sql.types.DataType,
      pSide: DataFrame, bSide: DataFrame, on: Seq[String], ord: Seq[Column],
      forward: Boolean, timeSplits: Int): DataFrame = {
    // split boundaries: approximate probe-time quantiles (any monotone
    // bucketing is CORRECT — quantiles just balance the split sizes)
    val fracs = (1 until timeSplits).map(_.toDouble / timeSplits).toArray
    val bounds = probe
      .select(col(probeTime).cast(tType).cast("double").as("__t"))
      .where(col("__t").isNotNull)
      .stat.approxQuantile("__t", fracs, 0.01)
    val bArr = bounds.distinct.sorted
    val nSplits = bArr.length + 1
    def splitOf(t: Column): Column =
      bArr.foldLeft(lit(0)) { (acc, b) =>
        acc + when(t > lit(b), 1).otherwise(0)
      }

    val u = pSide.unionByName(bSide)
      .withColumn("__split", splitOf(col("__t").cast("double")))
    val w1 = Window.partitionBy((on :+ "__split").map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u
      .withColumn("__match", last(col("__brow"), ignoreNulls = true).over(w1))
      .where(col("__side") === 1)

    // boundary relay: edge build row per (key, split)...
    val edgeAgg =
      if (forward) min_by(col("__brow"), col("__t"))
      else max_by(col("__brow"), col("__t"))
    val perSplit = u.where(col("__side") === 0)
      .groupBy((on :+ "__split").map(col): _*)
      .agg(edgeAgg.as("__b_edge"))
    // ...prefix-carried over a COMPLETE key×split grid (a probe split with
    // no build rows must still inherit from earlier non-empty splits)
    val spark = probe.sparkSession
    val grid = perSplit.select(on.map(col): _*).distinct()
      .crossJoin(spark.range(nSplits.toLong)
        .select(col("id").cast("int").as("__split")))
    val wc = Window.partitionBy(on.map(col): _*)
      .orderBy(if (forward) col("__split").desc else col("__split").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = grid.join(perSplit, (on :+ "__split").toSeq, "left")
      .withColumn("__carry", last(col("__b_edge"), ignoreNulls = true).over(wc))
      .select((on :+ "__split").map(col) :+ col("__carry"): _*)

    within.join(broadcast(carry), (on :+ "__split").toSeq, "left")
      .withColumn("__match", coalesce(col("__match"), col("__carry")))
      .drop("__split", "__carry")
  }

  /** Temporal (interval / SCD-2) join: attach to every probe row the build
    * VERSION whose validity interval `[validFrom, validTo)` contains the
    * probe time — the "dimension state as of event time" join. `validTo`
    * NULL means the version is still open. Intervals must be non-overlapping
    * per key (the SCD-2 contract; with overlaps, which overlapping version
    * wins is undefined).
    *
    * Plan shape: exactly [[joinAsOf]] on `validFrom` (one shuffle + window
    * pass — never the quadratic range-join Catalyst would plan for
    * `p.ts >= b.from AND p.ts < b.to`), followed by a row-local expiry
    * check that nulls out versions that ended at-or-before the probe time.
    * End-exclusive: a probe exactly at `validTo` of a version falls in the
    * NEXT version (or a gap). NULL semantics and `timeSplits` hot-key
    * handling inherit from [[joinAsOf]].
    */
  def joinTemporal(probe: DataFrame, build: DataFrame, on: Seq[String],
      probeTime: String, validFrom: String, validTo: String,
      buildSuffix: String = "_b", inner: Boolean = false,
      timeSplits: Int = 1): DataFrame = {
    require(validFrom != validTo, "validFrom and validTo must differ")
    val joined = joinAsOf(probe, build, on, probeTime, validFrom,
      forward = false, toleranceSec = None, buildSuffix = buildSuffix,
      inner = false, timeSplits = timeSplits)
    val vtB = col(validTo + buildSuffix)
    // live ⇔ a version matched (validFrom is never NULL in a match) and it
    // has not expired; comparison on the double view, as in joinAsOf
    val live = col(validFrom + buildSuffix).isNotNull &&
      (vtB.isNull || col(probeTime).cast("double") < vtB.cast("double"))
    val bOut = build.columns.filterNot(on.contains).map(_ + buildSuffix)
    val probeCols = joined.columns.filterNot(bOut.contains)
    val expired = joined.select(
      probeCols.map(col) ++
        bOut.map(c => when(live, col(c)).as(c)): _*)
    if (inner) expired.where(col(validFrom + buildSuffix).isNotNull)
    else expired
  }

  /** Broadcast as-of join for a SMALL build side: the probe side is not
    * shuffled (or sorted) at all — each task binary-searches a broadcast
    * map of per-key time-sorted build rows. Same semantics and output
    * schema as [[joinAsOf]] (left-outer backward/forward, inclusive,
    * tolerance), verified equivalent in AsOfSpec.
    *
    * This is the 100 TB fast path for "attach the latest reference state
    * to every event": [[joinAsOf]] must shuffle probe+build on the keys
    * (fine when both are big), but when the build side fits in memory —
    * dimension snapshots, rates, model-version timelines — the window
    * formulation pays a full shuffle+sort of the probe side for nothing.
    * Here the only data movement is the broadcast of the build side.
    *
    * Time values are compared on their `double` view (timestamps → exact
    * fractional epoch seconds up to sub-µs; numerics as-is), matching the
    * tolerance semantics of [[joinAsOf]].
    *
    * @param maxBuildRows  safety valve — fail fast instead of OOMing the
    *                      driver when the build side is unexpectedly big
    */
  def joinAsOfBroadcast(probe: DataFrame, build: DataFrame, on: Seq[String],
      probeTime: String, buildTime: String, forward: Boolean = false,
      toleranceSec: Option[Double] = None, buildSuffix: String = "_b",
      inner: Boolean = false, maxBuildRows: Int = 10000000): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    assertNoReserved(probe, build)
    val bcReserved = Seq("__k", "__bt", "__pt")
    val bcClash = (probe.columns ++ build.columns).filter(bcReserved.contains)
    require(bcClash.isEmpty, "as-of join inputs may not contain reserved " +
      s"column names: ${bcClash.distinct.mkString(", ")}")
    import org.apache.spark.sql.types._
    val singleKeyKind: Option[DataType] =
      if (on.length != 1) None
      else probe.schema(on.head).dataType match {
        case ByteType | ShortType | IntegerType | LongType => Some(LongType)
        case FloatType | DoubleType => Some(DoubleType)
        case StringType => Some(StringType)
        case _ => None
      }
    singleKeyKind match {
      case Some(kind) => joinAsOfBroadcastExpr(probe, build, on.head, kind,
        probeTime, buildTime, forward, toleranceSec, buildSuffix, inner,
        maxBuildRows)
      case None => joinAsOfBroadcastRows(probe, build, on, probeTime,
        buildTime, forward, toleranceSec, buildSuffix, inner, maxBuildRows)
    }
  }

  /** Codegen'd fast path for a single primitive/string key: the probe scan
    * evaluates one [[graft.expr.AsOfLookup]] expression per row — a hash
    * probe + binary search into the broadcast table — entirely inside
    * whole-stage codegen (no shuffle, no sort, no Row conversion). */
  private def joinAsOfBroadcastExpr(probe: DataFrame, build: DataFrame,
      key: String, keyKind: org.apache.spark.sql.types.DataType,
      probeTime: String, buildTime: String, forward: Boolean,
      toleranceSec: Option[Double], buildSuffix: String, inner: Boolean,
      maxBuildRows: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpr}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}

    val probeRest = probe.columns.filterNot(_ == key).toSeq
    val buildVals = build.columns.filterNot(_ == key).toSeq
    val bOut = buildVals.map(_ + buildSuffix)
    val rowType = StructType(buildVals.map(c => StructField(
      c + buildSuffix, build.schema(c).dataType, nullable = true)))

    // collect the build side in INTERNAL representation (limit+1 guards the
    // driver), compact each value row into its own UnsafeRow
    val prep = build.select(
      (col(key).cast(keyKind).as("__k") +:
        col(buildTime).cast("double").as("__bt") +:
        buildVals.map(col)): _*)
      .where(col("__k").isNotNull && col("__bt").isNotNull)
      .limit(maxBuildRows + 1)
    val internal = org.apache.spark.sql.graftshim.collectInternal(prep)
    require(internal.length <= maxBuildRows,
      s"build side exceeds maxBuildRows=$maxBuildRows — use joinAsOf")
    val valTypes = buildVals.map(c => build.schema(c))
    val proj = UnsafeProjection.create(valTypes.zipWithIndex.map {
      case (f, i) => BoundReference(2 + i, f.dataType, nullable = true)
    }.toSeq)
    val entries = internal
      .groupBy(r => r.get(0, keyKind).asInstanceOf[AnyRef])
      .map { case (k, rs) =>
        val sorted = rs.sortBy(_.getDouble(1))
        (k, sorted.map(_.getDouble(1)),
          sorted.map(r => proj(r).copy(): InternalRow))
      }.toArray
    val bc = probe.sparkSession.sparkContext.broadcast(
      new graft.expr.AsOfTable(entries, forward))

    val lookup = toColumn(graft.expr.AsOfLookup(
      new graft.expr.AsOfTableRef(bc), rowType,
      toExpr(col(key).cast(keyKind)), toExpr(col(probeTime).cast("double"))))
    val carried = probe.withColumn("__match", lookup)
    val gated = toleranceSec match {
      case Some(tol) =>
        val matchTime = col("__match")(buildTime + buildSuffix).cast("double")
        carried.withColumn("__match",
          when(abs(col(probeTime).cast("double") - matchTime) <= lit(tol),
            col("__match")))
      case None => carried
    }
    val filtered = if (inner) gated.where(col("__match").isNotNull) else gated
    filtered.select(
      (col(key) +: probeRest.map(col)) ++
        bOut.map(o => col("__match")(o).as(o)): _*)
  }

  /** Generic fallback (multi-column keys): same semantics via
    * mapPartitions over a broadcast per-key sorted map. */
  private def joinAsOfBroadcastRows(probe: DataFrame, build: DataFrame,
      on: Seq[String], probeTime: String, buildTime: String, forward: Boolean,
      toleranceSec: Option[Double], buildSuffix: String,
      inner: Boolean, maxBuildRows: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{StructField, StructType}

    val probeRest = probe.columns.filterNot(on.contains).toSeq
    val buildVals = build.columns.filterNot(on.contains).toSeq
    val outSchema = StructType(
      on.map(c => probe.schema(c)) ++ probeRest.map(c => probe.schema(c)) ++
        buildVals.map(c => StructField(c + buildSuffix,
          build.schema(c).dataType, nullable = true)))

    // collect build: key → rows sorted by time (ascending double view);
    // SQL NULL semantics — NULL-keyed/NULL-timed build rows never match
    val bRows = build
      .select((on.map(col) :+ col(buildTime).cast("double").as("__bt")) ++
        buildVals.map(col): _*)
      .where(on.map(col(_).isNotNull).reduce(_ && _) && col("__bt").isNotNull)
      .limit(maxBuildRows + 1).collect()
    require(bRows.length <= maxBuildRows,
      s"build side exceeds maxBuildRows=$maxBuildRows — use joinAsOf")
    val nk = on.length
    val byKey: Map[Seq[Any], (Array[Double], Array[Array[Any]])] =
      bRows.groupBy(r => (0 until nk).map(r.get)).map { case (k, rs) =>
        val sorted = rs.sortBy(_.getDouble(nk))
        (k, (sorted.map(_.getDouble(nk)),
          sorted.map(r => Array.tabulate(buildVals.length)(i => r.get(nk + 1 + i)))))
      }
    val bc = probe.sparkSession.sparkContext.broadcast(byKey)

    val in = probe.select(
      (on.map(col) :+ col(probeTime).cast("double").as("__pt")) ++
        probeRest.map(col): _*)
    val nb = buildVals.length
    val fwd = forward
    val tol = toleranceSec
    val innerF = inner
    val ds = in.as(Encoders.row(in.schema)).mapPartitions { it =>
      val m = bc.value
      it.flatMap { r =>
        val key = (0 until nk).map(r.get)
        val pt = if (r.isNullAt(nk)) Double.NaN else r.getDouble(nk)
        val hit: Option[Array[Any]] = m.get(key).flatMap { case (ts, rows) =>
          if (pt.isNaN) None
          else {
            // binary search: last index with ts(i) <= pt (backward) /
            // first with ts(i) >= pt (forward); inclusive on equality
            var lo = 0; var hi = ts.length - 1; var found = -1
            if (fwd) {
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (ts(mid) >= pt) { found = mid; hi = mid - 1 } else lo = mid + 1
              }
            } else {
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (ts(mid) <= pt) { found = mid; lo = mid + 1 } else hi = mid - 1
              }
            }
            if (found < 0) None
            else if (tol.exists(t => math.abs(pt - ts(found)) > t)) None
            else Some(rows(found))
          }
        }
        if (hit.isEmpty && innerF) Iterator.empty
        else {
          val probeVals = (0 until nk).map(r.get) ++
            (nk + 1 until nk + 1 + probeRest.length).map(r.get)
          val bv = hit.map(_.toSeq).getOrElse(Seq.fill[Any](nb)(null))
          Iterator(Row.fromSeq(probeVals ++ bv))
        }
      }
    }(Encoders.row(outSchema))
    ds.toDF()
  }
}
