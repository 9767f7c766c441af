package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Greedy k-center coreset selection (Similarity.kCenterGreedy). */
class KCenterSpec extends SparkTestBase {

  // 2-dim toy layout: seed 1 at origin; 2 is farthest (d²=100), then 5
  // (min-dist² 50); round 3 ties 3 vs 4 at d²=1 -> smaller id wins
  private def df = {
    import spark.implicits._
    Seq((1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(9.0, 0.0)), (5L, Seq(5.0, 5.0)))
      .toDF("vec_id", "embedding")
  }

  test("kCenterGreedy: hand-worked picks, ties to the smaller id") {
    val got = Similarity.kCenterGreedy(df, "vec_id", "embedding", 4)
      .collect()
      .map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) -1L else r.getLong(1)),
        (if (r.isNullAt(2)) -1.0 else r.getDouble(2))))
      .toMap
    assert(got(0L) == (1L, -1.0)) // seed, no distance
    assert(got(1L) == (2L, 100.0))
    assert(got(2L) == (5L, 50.0))
    assert(got(3L) == (3L, 1.0)) // tie with 4 at 1.0 -> min id
    // covering radius: only point 4 is uncovered, at d² = 1
    assert(got(4L) == (-1L, 1.0))
  }

  test("kCenterGreedy: k = n selects everything, radius 0") {
    val got = Similarity.kCenterGreedy(df, "vec_id", "embedding", 5)
      .collect()
    assert(got.length == 6)
    assert(got.map(r => if (r.isNullAt(1)) -1L else r.getLong(1))
      .toSet == Set(-1L, 1L, 2L, 3L, 4L, 5L))
    assert(got.last.getDouble(2) == 0.0)
  }

  test("kCenterGreedy is partitioning-invariant") {
    val a = Similarity.kCenterGreedy(df, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.kCenterGreedy(df.repartition(4), "vec_id",
      "embedding", 3).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("maxSimTopK: every query token finds its best document token") {
    import spark.implicits._
    val bags = Seq(
      (1L, Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))), // the query
      (2L, Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))), // perfect: 1 + 1
      (3L, Seq(Seq(0.6, 0.8))), // 0.6 and 0.8 -> 1.4
      (4L, Seq(Seq(-1.0, 0.0), Seq(0.0, -1.0)))) // 0 + 0 (best cross)
      .toDF("vec_id", "tv")
    val q = bags.where(col("vec_id") === 1L)
    val got = Similarity.maxSimTopK(bags, q, "vec_id", "tv", 3)
      .collect()
      .map(r => r.getInt(r.fieldIndex("rank")) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1)._1 == 2L && math.abs(got(1)._2 - 2.0) < 1e-12)
    assert(got(2)._1 == 3L && math.abs(got(2)._2 - 1.4) < 1e-12)
    assert(got(3)._1 == 4L && math.abs(got(3)._2 - 0.0) < 1e-12)
  }

  test("maxSimTopKFrom on the full candidate grid == brute maxSimTopK " +
      "(byte-shared scoring fold)") {
    import spark.implicits._
    val bags = Seq(
      (1L, Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
      (2L, Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
      (3L, Seq(Seq(0.6, 0.8))),
      (4L, Seq(Seq(-1.0, 0.0), Seq(0.0, -1.0))),
      (5L, Seq(Seq(0.5, 0.5))))
      .toDF("vec_id", "tv")
    val q = bags.where(col("vec_id") <= 2L)
    val brute = Similarity.maxSimTopK(bags, q, "vec_id", "tv", 3)
      .collect().map(_.toSeq).toSet
    // the all-pairs candidate frame makes the production path exhaustive
    val allCands = q.select(col("vec_id").as("query_id"))
      .crossJoin(bags.select(col("vec_id").as("doc_id")))
      .where(col("query_id") =!= col("doc_id"))
    val fed = Similarity.maxSimTopKFrom(allCands, bags, q,
      "vec_id", "tv", 3).collect().map(_.toSeq).toSet
    assert(fed == brute)
    // a restricted candidate frame ranks within the candidates only
    val some = Seq((1L, 3L), (1L, 4L)).toDF("query_id", "doc_id")
    val got = Similarity.maxSimTopKFrom(some, bags, q, "vec_id", "tv", 1)
      .collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L)
  }

  test("maxSim refuses zero-norm tokens and empty bags instead of " +
      "NaN-poisoning the ranking") {
    import spark.implicits._
    val bags = Seq(
      (1L, Seq(Seq(1.0, 0.0))), // query
      (2L, Seq(Seq(0.0, 0.0), Seq(0.9, 0.0))), // zero token dropped
      (3L, Seq(Seq(0.0, 0.0))), // all-zero bag: refused work
      (4L, Seq.empty[Seq[Double]])) // empty bag: refused work
      .toDF("vec_id", "tv")
    val q = bags.where(col("vec_id") === 1L)
    val got = Similarity.maxSimTopK(bags, q, "vec_id", "tv", 5).collect()
    // only doc 2 survives; its zero token contributed nothing (no NaN)
    assert(got.map(_.getLong(1)).toSeq == Seq(2L))
    assert(math.abs(got(0).getDouble(2) - 1.0) < 1e-12)
  }

  test("kCenterFrom: greedy over the sample, exact radius over the " +
      "full corpus") {
    // sample excludes point 2 (the far outlier): centers come from
    // {1, 3, 5}, but the radius row must still measure point 2
    val sample = df.where(col("vec_id") =!= 2L && col("vec_id") =!= 4L)
    val got = Similarity.kCenterFrom(sample, df, "vec_id", "embedding", 2)
      .collect()
    val centers = got.filter(!_.isNullAt(1)).map(_.getLong(1)).toSet
    assert(centers == Set(1L, 5L)) // seed 1; 5 is farthest in-sample
    // corpus radius: point 2 at (10,0) vs nearest center 5 at (5,5):
    // d² = 25 + 25 = 50 — larger than any in-sample distance
    assert(got.last.getDouble(2) == 50.0)
  }

  test("kCenterGreedy fails fast above maxRows and points at " +
      "kCenterFrom") {
    val e = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(df, "vec_id", "embedding", 2, maxRows = 3)
    }
    assert(e.getMessage.contains("kCenterFrom"))
    // kCenterFrom guards its SAMPLE the same way
    val e2 = intercept[IllegalArgumentException] {
      Similarity.kCenterFrom(df, df, "vec_id", "embedding", 2, maxRows = 3)
    }
    assert(e2.getMessage.contains("sample"))
  }
}
