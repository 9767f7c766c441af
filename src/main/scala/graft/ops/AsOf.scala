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

  /** @param probe         left side; one output row per probe row
    *                      (left-outer by default)
    * @param build         right side; contributes its non-key columns,
    *                      suffixed with `buildSuffix`
    * @param on            equi-join keys (must be non-empty: a keyless
    *                      as-of would serialize onto one task)
    * @param probeTime     event-time column of `probe` (timestamp or numeric)
    * @param buildTime     event-time column of `build`; cast to
    *                      `probeTime`'s type
    * @param forward       match earliest build at-or-after instead of
    *                      latest at-or-before
    * @param toleranceSec  max |probeTime − buildTime| in seconds; farther
    *                      matches are nulled out (pandas `tolerance`)
    * @param inner         drop unmatched probe rows instead of keeping them
    *                      with NULL build columns
    */
  def joinAsOf(probe: DataFrame, build: DataFrame, on: Seq[String],
      probeTime: String, buildTime: String, forward: Boolean = false,
      toleranceSec: Option[Double] = None, buildSuffix: String = "_b",
      inner: Boolean = false): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key " +
      "(a keyless as-of join cannot be distributed)")
    val tType = probe.schema(probeTime).dataType
    val probeRest = probe.columns.filterNot(on.contains).toSeq
    val buildVals = build.columns.filterNot(on.contains).toSeq
    val bOut = buildVals.map(_ + buildSuffix)

    val browType = org.apache.spark.sql.types.StructType(
      buildVals.map(c => org.apache.spark.sql.types.StructField(
        c + buildSuffix, build.schema(c).dataType, build.schema(c).nullable)))
    val pSide = probe.select(
      on.map(col) ++
        Seq(col(probeTime).cast(tType).as("__t"), lit(1).as("__side")) ++
        probeRest.map(col) :+
        lit(null).cast(browType).as("__brow"): _*)
    val bSide = build.select(
      on.map(col) ++
        Seq(col(buildTime).cast(tType).as("__t"), lit(0).as("__side")) ++
        probeRest.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        struct(buildVals.zip(bOut).map { case (c, o) => col(c).as(o) }: _*)
          .as("__brow"): _*)

    val ord: Seq[Column] =
      Seq(if (forward) col("__t").desc else col("__t").asc, col("__side").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = pSide.unionByName(bSide)
      .withColumn("__match", last(col("__brow"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

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

    // collect build: key → rows sorted by time (ascending double view)
    val bRows = build
      .select((on.map(col) :+ col(buildTime).cast("double").as("__bt")) ++
        buildVals.map(col): _*)
      .where(col("__bt").isNotNull)
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
