package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hard-negative mining (Similarity.hardNegatives) and the generic
  * 64-bit fingerprint pair machinery (Dedup.hammingPairs). */
class HardNegativesSpec extends SparkTestBase {
  import spark.implicits._

  test("hammingPairs: planted fingerprints within/beyond the radius") {
    val rows = Seq(
      (1L, 0x0F0F0F0FL), (2L, 0x0F0F0F0EL),           // hamming 1
      (3L, 0x0F0F0F0FL ^ (1L << 40) ^ (1L << 5)),     // hamming 2 vs id 1
      (4L, 0x70F0F0F0FL),                              // far from everything
      (5L, -1L)).toDF("id", "fp")                      // far (all ones)
    val got = Dedup.hammingPairs(rows, "id", "fp", maxHamming = 2, chunks = 4)
      .select("idA", "idB", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 2)),
      s"got $got") // 2-3 differ by 3 bits -> excluded
  }

  test("hammingPairs drops NULL fingerprints; equals simhashPairs on text") {
    val rows = Seq((1L, Some(5L)), (2L, Some(5L)), (3L, None))
      .toDF("id", "fp")
    val got = Dedup.hammingPairs(rows, "id", "fp", 1, 4).count()
    assert(got == 1)
    // simhashPairs must be exactly hammingPairs over simhash64
    val docs = spark.read.parquet(sf("documents"))
      .select("doc_id", "text").limit(120)
    val direct = Dedup.simhashPairs(docs, "doc_id", "text",
      shingleN = 2, maxHamming = 3, chunks = 4)
      .select("idA", "idB", "hamming").collect().toSet
    val viaFp = Dedup.hammingPairs(
      docs.select(col("doc_id"),
        graft.api.functions.simhash64(col("text"), 2).as("fp")),
      "doc_id", "fp", maxHamming = 3, chunks = 4)
      .select("idA", "idB", "hamming").collect().toSet
    assert(direct == viaFp)
  }

  test("hardNegatives: near-dup neighbors are excluded, ranking is preserved") {
    // query 0; corpus: 1 = exact copy (near-dup, high cosine), 2 = close
    // vector + different text (the hard negative), 3 = medium, 4 = far
    val mk = (s: Double) => Seq(1.0, s, 0.0)
    val corpus = Seq(
      (1L, Seq(1.0, 0.001, 0.0), "alpha beta gamma delta epsilon zeta"),
      (2L, Seq(1.0, 0.05, 0.0), "one two three four five six seven"),
      (3L, Seq(1.0, 0.4, 0.0), "eight nine ten eleven twelve thirteen"),
      (4L, Seq(-1.0, 0.0, 0.0), "fourteen fifteen sixteen seventeen"))
      .toDF("id", "vec", "text")
    val queries = Seq(
      (0L, mk(0.0), "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "vec", "text")
    val got = Similarity.hardNegatives(corpus, queries, "id", "vec", "text",
      k = 2, candidates = 4, shingleN = 3, tau = 0.5)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    // id 1 has the best cosine but identical text -> excluded;
    // survivors ranked by cosine: 2 then 3
    assert(got == Seq((2L, 1), (3L, 2)), s"got $got")
  }

  test("hardNegatives keeps jaccard column and respects k") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text")).where(col("doc_id") < 60)
    val emb = spark.read.parquet(sf("embeddings")).where(col("vec_id") < 60)
    val corpus = emb.join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("text"))
    val queries = corpus.where(col("id") < 3)
    val got = Similarity.hardNegatives(corpus, queries, "id", "vec", "text",
      k = 5, candidates = 10)
    assert(got.columns.toSeq ==
      Seq("query_id", "neighbor_id", "cosine", "jaccard", "rank"))
    val perQuery = got.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQuery.forall(_ <= 5))
    assert(got.where(col("jaccard") >= 0.5).count() == 0)
  }
}
