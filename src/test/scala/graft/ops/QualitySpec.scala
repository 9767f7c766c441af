package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Rank-ensemble quality blending (ops/Quality.scala). */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("single ascending signal: pct == average rank / n, ties averaged") {
    // values 10,20,20,30 → avg ranks 1, 2.5, 2.5, 4 → pct /4
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 30.0))
      .toDF("id", "v")
    val out = Quality.rankBlend(df, "id", Seq(("v", col("v"), true)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 0.25, 2L -> 0.625, 3L -> 0.625, 4L -> 1.0))
  }

  test("higherIsBetter=false flips the orientation") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val out = Quality.rankBlend(df, "id", Seq(("v", col("v"), false)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // lower value = better: ranks 1,2,3 → pct (n+1−r)/n = 1, 2/3, 1/3
    assert(out(1L) == 1.0)
    assert(math.abs(out(2L) - 2.0 / 3) < 1e-15)
    assert(math.abs(out(3L) - 1.0 / 3) < 1e-15)
  }

  test("blend weights: 3:1 mix matches hand arithmetic") {
    val df = Seq((1L, 1.0, 9.0), (2L, 2.0, 8.0), (3L, 3.0, 7.0))
      .toDF("id", "a", "b")
    val out = Quality.rankBlend(df, "id",
      Seq(("a", col("a"), true), ("b", col("b"), true)),
      weights = Seq(3.0, 1.0))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // a ranks 1,2,3 → pct 1/3,2/3,1; b ranks 3,2,1 → pct 1,2/3,1/3
    val want1 = (3.0 * (1.0 / 3) + 1.0 * 1.0) / 4.0
    assert(math.abs(out(1L)._3 - want1) < 1e-15)
    // blend is anti-symmetric here: doc2 is the middle of both
    assert(math.abs(out(2L)._3 - 2.0 / 3) < 1e-15)
  }

  test("rows with NULL/NaN signals are dropped; empty input returns typed empty") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(Double.NaN)))
      .toDF("id", "v")
    val out = Quality.rankBlend(df, "id", Seq(("v", col("v"), true)))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val empty = Quality.rankBlend(df.where(lit(false)), "id",
      Seq(("v", col("v"), true)))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "pct_v", "blend"))
  }

  test("rankBlendApprox tracks the exact path within sketch tolerance") {
    val docs = (0 until 4000).map(i =>
      (i.toLong, ((i * 2654435761L) % 100000L).toDouble,
        ((i * 1103515245L + 12345L) % 100000L).toDouble))
      .toDF("id", "a", "b")
    val signals = Seq(("a", col("a"), true), ("b", col("b"), false))
    val exact = Quality.rankBlend(docs, "id", signals)
      .select(col("id"), col("blend")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = Quality.rankBlendApprox(docs, "id", signals)
      .select(col("id"), col("blend")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    val maxErr = exact.map { case (k, v) => math.abs(approx(k) - v) }.max
    assert(maxErr < 0.02, s"max |approx − exact| = $maxErr")
    // approximate path still preserves gross ordering: top decile by
    // exact blend overlaps top decile by approx blend heavily
    val topE = exact.toSeq.sortBy(-_._2).take(400).map(_._1).toSet
    val topA = approx.toSeq.sortBy(-_._2).take(400).map(_._1).toSet
    assert((topE & topA).size >= 360, s"overlap ${(topE & topA).size}")
  }

  test("blend is monotone in every signal and bit-stable across partitionings") {
    val docs = (0 until 500).map(i =>
      (i.toLong, (i % 37).toDouble, ((i * 13) % 101).toDouble))
      .toDF("id", "a", "b")
    def run(parts: Int): Map[Long, Long] =
      Quality.rankBlend(docs.repartition(parts), "id",
          Seq(("a", col("a"), true), ("b", col("b"), true)))
        .collect().map(r => r.getLong(0) ->
          java.lang.Double.doubleToRawLongBits(r.getDouble(3))).toMap
    assert(run(1) == run(11))
    // dominance: strictly larger in both signals → strictly larger blend
    val m = Quality.rankBlend(docs, "id",
        Seq(("a", col("a"), true), ("b", col("b"), true)))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val x = m(3L); val y = m(40L) // (3,39) vs (3,15): pick a dominating pair
    val dominating = m.toSeq.combinations(2).take(2000).forall {
      case Seq((_, p), (_, q)) =>
        !(p._1 > q._1 && p._2 > q._2) || p._3 > q._3
    }
    assert(dominating)
    assert(x._3 > 0 && y._3 > 0)
  }
}
