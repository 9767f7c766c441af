package graft.ops

import graft.SparkTestBase

/** SemDeDup (Similarity.semanticPairs / semanticDedup): within-cluster
  * cosine pairs over a fixed codebook, keep-min-id removal. */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters on the axes; ids 1,2,3 near +x, 10,11 near +y
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.999f, 0.04f)),   // ~1.0 cosine with id 1
    (3L, Seq(0.7f, 0.7f)),      // +x cluster but ~0.74 cosine to id 1
    (10L, Seq(0.0f, 1.0f)),
    (11L, Seq(0.05f, 0.999f))   // ~1.0 cosine with id 10
  ).toDF("id", "vec")
  private val codebook = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))

  test("semanticPairs: only within-cluster pairs above tau, idA < idB") {
    val got = Similarity.semanticPairs(vecs, "id", "vec", codebook, tau = 0.9)
      .orderBy("idA", "idB")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // cluster 0 holds {1,2,3}: (1,2) cos≈.9992 passes, (1,3)/(2,3) cos≈.74 fail
    // cluster 1 holds {10,11}: (10,11) cos≈.9988 passes
    assert(got.toSeq == Seq((1L, 2L, 0), (10L, 11L, 1)))
  }

  test("cross-cluster pairs are never compared, even at tau=-1") {
    val got = Similarity.semanticPairs(vecs, "id", "vec", codebook, tau = -1.0)
    // all pairs inside each cluster, none across: C(3,2) + C(2,2) = 4
    assert(got.count() == 4)
    assert(got.where($"idA" < 10 && $"idB" >= 10).isEmpty)
  }

  test("semanticDedup keeps the minimum id of each dup group") {
    val kept = Similarity.semanticDedup(vecs, "id", "vec", codebook, tau = 0.9)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 10L)) // 2 dups to 1, 11 dups to 10, 3 survives
  }

  test("thresholdForRate: percentile thresholds and censuses by hand") {
    import org.apache.spark.sql.functions._
    // sims 0.01..1.00 — quantile_cont(1−r) is exactly interpolable
    val sims = (1 to 100).map(i => i / 100.0).toDF("sim")
    val out = Similarity.thresholdForRate(sims, col("sim"),
        Seq(0.1, 0.5)).collect()
      .map(r => r.getDouble(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // (1−0.1) quantile of 0.01..1.00: h=(99)(0.9)=89.1 → 0.90+0.1*0.01
    assert(math.abs(out(0.1)._1 - 0.901) < 1e-9)
    assert(out(0.1)._2 == 100 && out(0.1)._3 == 10) // 0.91..1.00
    assert(math.abs(out(0.5)._1 - 0.505) < 1e-9)
    assert(out(0.5)._3 == 50)
    // empty input → typed empty; invalid rates rejected
    assert(Similarity.thresholdForRate(sims.where(lit(false)),
      col("sim"), Seq(0.1)).count() == 0)
    intercept[IllegalArgumentException](
      Similarity.thresholdForRate(sims, col("sim"), Seq(1.5)))
  }
}
