package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins.
  *
  * The attribution shape of a data pipeline: a TRIGGER stream (click,
  * prompt, crawl-seen) joined to a FOLLOW-UP stream (purchase,
  * response, fetch-complete) of the same key within a bounded horizon.
  * In Structured Streaming this is the canonical stateful two-input
  * operator: each side buffers rows in the state store until the other
  * side's watermark proves no more matches can arrive, so the time
  * bound in the JOIN CONDITION is what makes state finite — an
  * unconstrained stream-stream join would buffer both streams forever.
  *
  * Scale: state per side is (rows within watermark+horizon), keyed by
  * the join key — independent of stream length; matches emit as they
  * are found (inner join needs no watermark wait to EMIT, only to
  * evict). Late rows within the watermark still join exactly; the
  * result over a finite replay equals the batch join over the same
  * multiset, which is how the q317 gate verifies it (the same function
  * body runs in both modes — pass static frames and the identical plan
  * is a plain range join).
  */
object StreamingJoins {

  /** Inner event-time interval join: left rows match right rows with
    * the same `key` and `rightTs ∈ [leftTs, leftTs + horizon]`. Right
    * columns come back prefixed with `rightPrefix` (the join key
    * deduplicates away). `horizon` and `watermark` are interval
    * strings (`"2 DAYS"`). Works identically on static frames (no
    * watermark is applied in batch mode — Spark ignores
    * `withWatermark` on non-streaming frames by definition). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, horizon: String,
      watermark: String, rightPrefix: String = "r_"): DataFrame = {
    require(left.columns.contains(key) && right.columns.contains(key),
      s"join key $key must exist on both sides")
    require(rightPrefix.nonEmpty, "rightPrefix must be non-empty")
    require(!left.columns.exists(c => c.startsWith(rightPrefix) &&
        right.columns.contains(c.stripPrefix(rightPrefix))),
      s"left already has a '$rightPrefix'-prefixed column that the " +
        s"renamed right side would collide with: " +
        left.columns.filter(c => c.startsWith(rightPrefix) &&
          right.columns.contains(c.stripPrefix(rightPrefix)))
          .mkString(", "))
    val l = left.withWatermark(leftTs, watermark)
    val rp = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, rightPrefix + c))
    val r = rp.withWatermark(rightPrefix + rightTs, watermark)
    l.join(r,
        col(key) === col(rightPrefix + key) &&
          col(rightPrefix + rightTs) >= col(leftTs) &&
          col(rightPrefix + rightTs) <=
            col(leftTs) + expr(s"INTERVAL $horizon"))
      .drop(rightPrefix + key)
  }
}
