package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqQuantizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.load(
    spark, "/root/testdata/sf0.001", "embeddings")

  private lazy val ranges = Similarity.sqRanges(emb, col("embedding"))
    .orderBy("dim").as[(Int, Double, Double)].collect()
  private lazy val lo = ranges.map(_._2).toSeq
  private lazy val hi = ranges.map(_._3).toSeq

  test("sqRanges is d rows of exact per-dim bounds") {
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    assert(ranges.length == d)
    assert(ranges.forall { case (_, l, h) => l <= h })
  }

  test("codes are in 0..255 and quantization error is within one cell") {
    val coded = emb.select(col("vec_id"), col("embedding"),
      Similarity.sqQuantize(col("embedding"), lo, hi).as("codes"))
    val bad = coded.select(explode(col("codes")).as("q"))
      .where(col("q") < 0 || col("q") > 255).count()
    assert(bad == 0)
    // |decode(quantize(x)) - x| <= cellWidth/2 per dim (midpoint decode)
    val err = coded.select(
      zip_with(Similarity.sqDecode(col("codes"), lo, hi),
        col("embedding").cast("array<double>"),
        (d, x) => abs(d - x)).as("errs"),
      posexplode(col("embedding")).as(Seq("dim", "__x")))
      .select(element_at(col("errs"), col("dim") + 1).as("err"), col("dim"))
      .groupBy("dim").agg(max("err").as("maxerr"))
      .as[(Int, Double)].collect()
    err.foreach { case (d, e) =>
      val cell = (hi(d) - lo(d)) / 256.0
      assert(e <= cell / 2 + 1e-12, s"dim $d err $e > half-cell ${cell / 2}")
    }
  }

  test("sqTopK recall@5 vs brute force is high on the fixture") {
    val coded = emb.select(col("vec_id"),
      Similarity.sqQuantize(col("embedding"), lo, hi).as("codes"))
    val queries = emb.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.sqTopK(coded, queries, "vec_id", "codes",
        "embedding", lo, hi, 5)
      .select("query_id", "neighbor_id")
    val hits = approx.join(truth, Seq("query_id", "neighbor_id")).count()
    val total = truth.count()
    assert(hits >= (total * 0.9).toLong,
      s"recall ${hits.toDouble / total} < 0.9")
  }

  test("refined top-k recall is >= raw SQ recall and <= truth") {
    val coded = emb.select(col("vec_id"),
      Similarity.sqQuantize(col("embedding"), lo, hi).as("codes"))
    val queries = emb.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 5).select("query_id", "neighbor_id")
    val raw = Similarity.sqTopK(coded, queries, "vec_id", "codes",
      "embedding", lo, hi, 5).select("query_id", "neighbor_id")
    val refined = Similarity.sqTopKRefined(coded, emb, queries, "vec_id",
      "codes", "embedding", lo, hi, k = 5, rerank = 20)
      .select("query_id", "neighbor_id")
    val rawHits = raw.join(truth, Seq("query_id", "neighbor_id")).count()
    val refHits = refined.join(truth, Seq("query_id", "neighbor_id")).count()
    assert(refHits >= rawHits, s"refined $refHits < raw $rawHits")
    assert(refHits <= truth.count())
  }

  test("quantize is deterministic under repartitioning") {
    val a = emb.select(col("vec_id"),
        Similarity.sqQuantize(col("embedding"), lo, hi).as("c"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect().toSeq
    val b = emb.repartition(7).select(col("vec_id"),
        Similarity.sqQuantize(col("embedding"), lo, hi).as("c"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect().toSeq
    assert(a == b)
  }

  test("degenerate dimension (hi == lo) codes to 0 and decodes to midpoint") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 5.0f)))
      .toDF("id", "v")
    val l = Seq(1.0, 2.0); val h = Seq(1.0, 5.0)
    val got = df.select(col("id"),
        Similarity.sqQuantize(col("v"), l, h).as("c"))
      .orderBy("id").as[(Long, Seq[Int])].collect().toSeq
    assert(got == Seq(1L -> Seq(0, 0), 2L -> Seq(0, 255)))
  }
}
