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
}
