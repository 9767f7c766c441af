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
}
