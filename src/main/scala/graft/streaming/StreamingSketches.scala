package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Structured-Streaming sketch aggregation helpers.
  *
  * The graft aggregates are mergeable monoids with constant-size state
  * (SURVEY.md §0), so they drop into streaming stateful aggregation
  * unchanged: state-store entries hold one serialized sketch per
  * (window, keys) group — no per-row growth, which is the whole point of
  * sketches for unbounded streams. Late data folds in associatively in
  * update/complete mode; with a watermark, append mode finalizes windows.
  */
object StreamingSketches {

  /** Tumbling-window sketch aggregation: per (window, keys) one t-digest of
    * `valueCol`, one top-k of `itemCol`, and exact moments of `valueCol`.
    *
    * Works identically on a batch or streaming DataFrame — the basis of the
    * batch≡streaming equivalence guarantee (same partial/merge code path).
    */
  def windowedSketches(df: DataFrame, tsCol: String, windowDuration: String,
      valueCol: String, itemCol: String, keys: Seq[String] = Nil,
      compression: Double = 100.0, capacity: Int = 64,
      watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val groupCols: Seq[Column] =
      window(col(tsCol), windowDuration) +: keys.map(col)
    in.groupBy(groupCols: _*)
      .agg(
        gf.tdigest(col(valueCol), lit(1.0), compression).as("value_tdigest"),
        gf.ss_topk_agg(col(itemCol), lit(1L), capacity).as("item_topk"),
        gf.summary_stats(col(valueCol)).as("value_stats"))
  }

  /** Gap-based sessionization: one row per (keys, session) where a session
    * is a maximal run of events with inter-event gap < `gap` (Spark's
    * `session_window` — dynamic, data-driven windows, unlike the fixed
    * grid of `window()`). Emits the session bounds plus per-session
    * aggregates: event count, exact moments of `valueCol`, first/last ts.
    *
    * Works identically on batch and streaming frames; in streaming, pass a
    * watermark and use append mode — session state is per (keys, open
    * session), finalized when the watermark passes `session.end`. At scale
    * this is one shuffle on (keys) with state O(open sessions), never
    * O(events).
    */
  def sessionize(df: DataFrame, tsCol: String, gap: String, valueCol: String,
      keys: Seq[String] = Nil, watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    in.groupBy((session_window(col(tsCol), gap).as("session") +:
        keys.map(col)): _*)
      .agg(count(lit(1)).as("n_events"),
        gf.summary_stats(col(valueCol)).as("value_stats"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"))
  }

  /** Streaming exact deduplication: emits only the FIRST row seen per
    * normalized content hash, across micro-batches, using
    * flatMapGroupsWithState (custom keyed state; one boolean per key).
    *
    * State is the smallest possible (a seen-marker per distinct content
    * hash); pair with a TTL-style cleanup (state timeout) in production if
    * the key space is unbounded. Works on batch frames too (degenerates to
    * per-key first()). Output columns = input columns.
    */
  def dedupStream(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoders, Row}
    // key = the normalized text itself (like Spark's own streaming
    // dropDuplicates, which stores key columns in state): exact dedup with
    // no hash-collision risk. The key column is computed with the SAME
    // Column-level normalization as Dedup.exact so batch and streaming agree
    // (a JVM-side reimplementation would diverge on trim/locale semantics).
    require(!df.columns.contains("__graft_dedup_key"),
      "input already has a __graft_dedup_key column")
    val keyed = df.withColumn("__graft_dedup_key",
      graft.ops.Dedup.normalized(col(textCol)))
    val keyIdx = keyed.schema.fieldIndex("__graft_dedup_key")
    val ds = keyed.as[Row](Encoders.row(keyed.schema))
    ds.groupByKey { r =>
      val v = if (r.isNullAt(keyIdx)) null else r.getString(keyIdx)
      (v == null, if (v == null) "" else v) // null text is its own group
    }(Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: (Boolean, String), rows: Iterator[Row], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.next()
            // drop the key column by position
            val vals = first.toSeq.zipWithIndex.collect {
              case (v, i) if i != keyIdx => v
            }
            Iterator(Row.fromSeq(vals))
          }
        })(Encoders.scalaBoolean, Encoders.row(df.schema))
      .toDF()
  }

  /** Finalize a windowed-sketch frame into human-readable per-window rows. */
  def summarize(sketches: DataFrame, quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      k: Int = 3): DataFrame =
    sketches.select(
      col("window.start").as("window_start"),
      gf.stats_count(col("value_stats")).as("cnt"),
      gf.tdigest_quantiles(col("value_tdigest"), quantiles).as("value_quantiles"),
      gf.ss_topk_string(col("item_topk"), k).as("top_items"))
}
