package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Similarity-ordered context packing (InContext.packByCluster). */
class InContextSpec extends SparkTestBase {

  // two obvious clusters on the axes; token counts chosen so bin edges
  // land mid-cluster
  private val rows: Seq[(Long, Seq[Double], Long)] = Seq(
    (1L, Seq(1.0, 0.0), 60L),  // cluster 0, cos 1.0
    (2L, Seq(0.9, 0.1), 50L),  // cluster 0
    (3L, Seq(0.8, 0.3), 40L),  // cluster 0
    (10L, Seq(0.0, 1.0), 70L), // cluster 1, cos 1.0
    (11L, Seq(0.1, 0.9), 80L)) // cluster 1

  private val codebook = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))

  private def df = {
    import spark.implicits._
    rows.toDF("id", "vec", "toks")
  }

  test("clusters assign by cosine and bins fill in cosine-desc order") {
    val out = InContext.packByCluster(df, col("id"), col("toks"),
        col("vec"), codebook, budget = 100L)
      .select("id", "cluster", "cum_tokens", "bin").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    // cluster 0 order: 1 (cos 1.0), 2, 3 -> cums 60, 110, 150
    assert(out(1L) == ((0, 60L, 0L)))
    assert(out(2L) == ((0, 110L, 0L))) // starts at 60 < 100 -> bin 0
    assert(out(3L) == ((0, 150L, 1L))) // starts at 110 -> bin 1
    // cluster 1 order: 10, 11 -> cums 70, 150
    assert(out(10L) == ((1, 70L, 0L)))
    assert(out(11L) == ((1, 150L, 0L)))
  }

  test("bins never straddle clusters (bin_global separates them)") {
    val out = InContext.packByCluster(df, col("id"), col("toks"),
        col("vec"), codebook, budget = 100L)
      .select("cluster", "bin_global").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // globals from different clusters never collide
    assert(out.groupBy(_._2).forall(_._2.map(_._1).distinct.size == 1))
  }

  test("partitioning-invariant (exact distributed prefix sum)") {
    val a = InContext.packByCluster(df.repartition(5), col("id"),
        col("toks"), col("vec"), codebook, 100L)
      .select("id", "cum_tokens", "bin").orderBy("id").collect().toSeq
    val b = InContext.packByCluster(df.coalesce(1), col("id"),
        col("toks"), col("vec"), codebook, 100L)
      .select("id", "cum_tokens", "bin").orderBy("id").collect().toSeq
    assert(a == b)
  }
}
