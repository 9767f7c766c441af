package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR-style hashed n-gram importance weighting (ops/Dsir.scala). */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 1 << 14

  test("target-like documents score positive, off-target negative") {
    // alpha must be small relative to corpus-grams/buckets for the SIGN
    // to be meaningful (at production scale grams ≫ αB and 0.5 is fine;
    // on a 3-doc fixture 0.5·16384 of smoothing mass would drown the
    // counts and push every score negative)
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha"),
      (2L, "gamma delta gamma delta gamma"),
      (3L, "alpha beta gamma")).toDF("id", "text")
    val target = Seq(Tuple1("alpha beta alpha beta")).toDF("text")
    val w = Dsir.importanceWeights(raw, target, "id", "text", B, 1e-4, true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > 0, s"pure-target doc: ${w(1L)}")
    assert(w(2L) < 0, s"off-target doc: ${w(2L)}")
    assert(w(1L) > w(3L) && w(3L) > w(2L), s"mixed doc ordering: $w")
  }

  test("score matches a hand-computed log ratio on a collision-free corpus") {
    // unigrams only so the model is countable by hand
    val raw = Seq((1L, "x x y"), (2L, "y z")).toDF("id", "text")
    val target = Seq(Tuple1("x y")).toDF("text")
    // raw counts: x=2, y=2, z=1 (T=5); target: x=1, y=1 (T=2); alpha=0.5
    def lr(tc: Double, rc: Double) =
      math.log((tc + 0.5) / (2 + 0.5 * B)) -
        math.log((rc + 0.5) / (5 + 0.5 * B))
    val expect1 = (2 * lr(1, 2) + lr(1, 2)) / 3.0
    val expect2 = (lr(1, 2) + lr(0, 1)) / 2.0
    val w = Dsir.importanceWeights(raw, target, "id", "text", B, 0.5, false)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(w(1L) - expect1) < 1e-12, s"${w(1L)} vs $expect1")
    assert(math.abs(w(2L) - expect2) < 1e-12, s"${w(2L)} vs $expect2")
  }

  test("n_grams counts unigrams + bigrams; empty text scores 0") {
    val raw = Seq((1L, "a b c d"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val target = Seq(Tuple1("a b")).toDF("text")
    val w = Dsir.importanceWeights(raw, target, "id", "text", B, 0.5, true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(w(1L)._1 == 4 + 3)
    assert(w(2L) == ((0L, 0.0)))
    assert(w(3L) == ((0L, 0.0)))
  }

  test("scoring a pool beyond the fit pool: missing buckets take the floor") {
    // fit on {x y} vs {x y}; score a doc containing the UNSEEN gram q —
    // its bucket is absent from the table, so it must be counted in
    // n_grams and scored at missingLogRatio (the smoothed floor), not
    // silently dropped by an inner join
    val fitRaw = Seq((1L, "x x y"), (2L, "y z")).toDF("id", "text")
    val target = Seq(Tuple1("x y")).toDF("text")
    val (table, floor) =
      Dsir.logRatioModel(fitRaw, target, "text", B, 0.5, bigrams = false)
    // floor = log(.5/(2+.5B)) - log(.5/(5+.5B)) = log((5+.5B)/(2+.5B))
    assert(math.abs(floor - math.log((5 + 0.5 * B) / (2 + 0.5 * B))) < 1e-12)
    val pool = Seq((10L, "x q q")).toDF("id", "text")
    val w = Dsir.importanceWeights(pool, "id", "text", table, B,
        bigrams = false, missingLogRatio = floor)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    def lr(tc: Double, rc: Double) =
      math.log((tc + 0.5) / (2 + 0.5 * B)) -
        math.log((rc + 0.5) / (5 + 0.5 * B))
    assert(w(10L)._1 == 3L) // all three grams counted
    assert(math.abs(w(10L)._2 - (lr(1, 2) + 2 * floor) / 3.0) < 1e-12)
  }

  test("selectTopK is deterministic: score desc then id asc") {
    val w = Seq((3L, 5L, 1.0), (1L, 5L, 2.0), (2L, 5L, 1.0))
      .toDF("id", "n_grams", "score")
    val got = Dsir.selectTopK(w, "id", 2).select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("weights are bit-identical across partitionings") {
    val docs = (0 until 200).map(i =>
      (i.toLong, s"tok${i % 7} tok${(i * 3) % 11} tok${(i * 5) % 13} " +
        s"tok${i % 7} tok${(i * 11) % 5}"))
    val target = docs.filter(_._1 % 4 == 0).map(d => Tuple1(d._2))
    def bits(parts: Int): Map[Long, Long] =
      Dsir.importanceWeights(docs.toDF("id", "text").repartition(parts),
          target.toDF("text"), "id", "text", B, 0.5, true)
        .collect().map(r => r.getLong(0) ->
          java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap
    assert(bits(1) == bits(17))
  }

  test("tiny bucket count still works (collisions are the method, not a bug)") {
    val raw = Seq((1L, "p q r"), (2L, "s t u")).toDF("id", "text")
    val target = Seq(Tuple1("p q")).toDF("text")
    val w = Dsir.importanceWeights(raw, target, "id", "text", 2, 0.5, true)
    assert(w.count() == 2)
    assert(w.where(col("score").isNull).count() == 0)
  }

  test("ratio table broadcasts: scoring plan has no sort and joins broadcast-side") {
    val raw = (0 until 100).map(i => (i.toLong, s"w${i % 9} w${(i * 2) % 9}"))
      .toDF("id", "text")
    val ratios = Dsir.logRatioTable(raw, raw.limit(20), "text", B, 0.5, true)
    val w = Dsir.importanceWeights(raw, "id", "text", ratios, B, true)
    w.collect()
    val plan = w.queryExecution.executedPlan.toString
    // the B-row ratio table must reach the scan as a broadcast (the
    // id-keyed recovery join may legitimately shuffle at scale)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast join:\n$plan")
  }
}
