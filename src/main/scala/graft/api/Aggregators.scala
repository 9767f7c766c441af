package graft.api

import graft.core.{ExactSum, MomentsSketch, TDigest}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset API: Aggregator[IN, BUF, OUT] wrappers over the same
  * kernels as the Catalyst aggregates (SURVEY.md §7.1 PR4).
  *
  * Buffers are the live sketch objects (kryo-encoded only at shuffle
  * boundaries); `reduce` mutates in place, so the per-row cost matches the
  * TypedImperativeAggregate path — no per-row serialization. Use with
  * `ds.select(agg.toColumn)` or `KeyValueGroupedDataset.agg`.
  */
object Aggregators {

  /** Moments summary for Dataset[Double]: exact count/sum/min/max/mean/var/
    * std/skew/kurt in one pass. */
  case class StatsResult(count: Long, sum: Double, min: Double, max: Double,
      mean: Double, variance: Double, std: Double, skew: Double, kurt: Double)

  val summaryStats: Aggregator[Double, MomentsSketch, StatsResult] =
    new Aggregator[Double, MomentsSketch, StatsResult] {
      override def zero: MomentsSketch = new MomentsSketch
      override def reduce(b: MomentsSketch, x: Double): MomentsSketch = { b.add(x, 1L); b }
      override def merge(a: MomentsSketch, b: MomentsSketch): MomentsSketch = {
        a.merge(b); a
      }
      override def finish(b: MomentsSketch): StatsResult =
        StatsResult(b.count, b.sum, b.minOrNaN, b.maxOrNaN, b.mean,
          b.variance(0), b.stddev(0), b.skew(bias = true),
          b.kurt(fisher = true, bias = true))
      override def bufferEncoder: Encoder[MomentsSketch] = Encoders.kryo[MomentsSketch]
      override def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
    }

  /** t-digest for Dataset[Double]; OUT = serialized sketch bytes (query with
    * graft.core.TDigest.deserialize or the tdigest_* finisher columns). */
  def tdigestSketch(compression: Double = 100.0): Aggregator[Double, TDigest, Array[Byte]] =
    new Aggregator[Double, TDigest, Array[Byte]] {
      override def zero: TDigest = TDigest(compression)
      override def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
      override def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
      override def finish(b: TDigest): Array[Byte] = b.serialize()
      override def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Median (or any quantile) for Dataset[Double] via t-digest. */
  def quantile(q: Double, compression: Double = 100.0): Aggregator[Double, TDigest, Double] =
    new Aggregator[Double, TDigest, Double] {
      override def zero: TDigest = TDigest(compression)
      override def reduce(b: TDigest, x: Double): TDigest = { b.add(x); b }
      override def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }
      override def finish(b: TDigest): Double = b.quantile(q)
      override def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Bit-reproducible exact sum for Dataset[Double]: same contract as the
    * exact_sum column aggregate — identical bits under any partitioning or
    * merge order; 0.0 for an empty Dataset (the typed API has no SQL null). */
  def exactSum: Aggregator[Double, ExactSum, Double] =
    new Aggregator[Double, ExactSum, Double] {
      override def zero: ExactSum = new ExactSum
      override def reduce(b: ExactSum, x: Double): ExactSum = { b.add(x); b }
      override def merge(a: ExactSum, b: ExactSum): ExactSum = { a.merge(b); a }
      override def finish(b: ExactSum): Double = b.result()
      override def bufferEncoder: Encoder[ExactSum] = Encoders.kryo[ExactSum]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
