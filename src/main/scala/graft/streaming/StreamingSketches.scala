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
        gf.summary_stats(col(valueCol)).as("value_stats"),
        // per-window distinct items: HLL registers merge exactly under
        // Spark's streaming-state partial aggregation, so window distinct
        // counts are replay-stable like every other sketch here
        gf.hll_agg(col(itemCol), 12).as("item_hll"))
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
    * normalized content, across micro-batches, using
    * flatMapGroupsWithState (custom keyed state; one boolean per key).
    *
    * State-size knobs for unbounded corpora:
    *
    *  - `keyByHash` (default true): key state by the 128-bit hash of the
    *    normalized text instead of the text itself — 32 state bytes per
    *    distinct document rather than the document, i.e. the state store
    *    holds fingerprints, not the corpus. Collision odds at 2^64 docs
    *    are ~2^-64·n²; set false to key by full text (Spark's own
    *    streaming dropDuplicates stores key columns the same way) when
    *    absolute exactness beats state size.
    *  - `ttl` (e.g. "30 days") with `tsCol`: EVENT-TIME state expiry —
    *    the input stream must carry `withWatermark(tsCol, ...)`. A key is
    *    evicted once the watermark passes its last sighting's event time
    *    plus the TTL, so state is bounded by the distinct-content volume
    *    per TTL window; a duplicate arriving after expiry re-emits (the
    *    standard streaming-dedup tradeoff, like dropDuplicates' watermark
    *    eviction). Event time, not processing time, keeps eviction
    *    DETERMINISTIC under replay and backfill — and a processing-time
    *    timeout would make the engine run batches continuously (its
    *    shouldRunAnotherBatch is always true once wall-clock advances),
    *    burning cluster cycles even on an idle stream. NB: the watermark
    *    also late-drops input rows older than it — size the watermark
    *    delay to the stream's real event-time disorder, or arrivals that
    *    lag the watermark are dropped before they reach the dedup state.
    *
    * The key is computed with the SAME Column-level normalization as
    * Dedup.exact so batch and streaming agree (a JVM-side
    * reimplementation would diverge on trim/locale semantics). Works on
    * batch frames too (degenerates to per-key first(); TTL requires a
    * stream). Output columns = input columns. */
  def dedupStream(df: DataFrame, textCol: String,
      keyByHash: Boolean = true, ttl: Option[String] = None,
      tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoders, Row}
    require(!df.columns.contains("__graft_dedup_key"),
      "input already has a __graft_dedup_key column")
    val ttlMs: Long = ttl.map { s =>
      val d = scala.concurrent.duration.Duration(s)
      require(d.isFinite && d.toMillis > 0, s"ttl must be positive: $s")
      d.toMillis
    }.getOrElse(0L)
    if (ttlMs > 0) require(df.columns.contains(tsCol),
      s"ttl needs event-time column '$tsCol' (watermarked) in the input")
    val norm = graft.ops.Dedup.normalized(col(textCol))
    val keyed = df.withColumn("__graft_dedup_key",
      if (keyByHash) md5(norm.cast("binary")) else norm)
    val keyIdx = keyed.schema.fieldIndex("__graft_dedup_key")
    val tsIdx = if (ttlMs > 0) keyed.schema.fieldIndex(tsCol) else -1
    val ds = keyed.as[Row](Encoders.row(keyed.schema))
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey { r =>
      val v = if (r.isNullAt(keyIdx)) null else r.getString(keyIdx)
      (v == null, if (v == null) "" else v) // null text is its own group
    }(Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), timeout)(
        (_: (Boolean, String), rows: Iterator[Row], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val buf = rows.toArray // bounded: this key's rows in THIS batch
            def refreshTtl(): Unit = if (ttlMs > 0) {
              // deadline = last sighting's EVENT time + ttl (event-driven,
              // replay-deterministic); clamped above the watermark because
              // Spark rejects deadlines at or before it (late sightings)
              val maxTs = buf.iterator.filterNot(_.isNullAt(tsIdx))
                .map(_.getTimestamp(tsIdx).getTime)
                .foldLeft(Long.MinValue)(math.max)
              val wm = state.getCurrentWatermarkMs()
              val base = if (maxTs == Long.MinValue) wm else maxTs
              state.setTimeoutTimestamp(math.max(base + ttlMs, wm + 1))
            }
            if (state.exists) {
              refreshTtl() // TTL measures time since last sighting
              Iterator.empty
            } else {
              state.update(true)
              refreshTtl()
              val first = buf(0)
              // drop the key column by position
              val vals = first.toSeq.zipWithIndex.collect {
                case (v, i) if i != keyIdx => v
              }
              Iterator(Row.fromSeq(vals))
            }
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
