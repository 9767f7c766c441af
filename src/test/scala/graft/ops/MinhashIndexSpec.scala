package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Persisted MinHash dedup index (Dedup.buildMinhashIndex /
  * pairsAgainstIndex): identical-output contract vs the in-memory
  * cross-frame path, stored-geometry authority, edge conventions. */
class MinhashIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("pairsAgainstIndex ≡ minhashPairsAcross row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    Dedup.buildMinhashIndex(even, "doc_id", "text", dir,
      shingleN = 2, numHashes = 128, bands = 32)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("idA"), col("idB"), round(col("jaccard"), 9).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toList
    val viaIndex = rows(Dedup.pairsAgainstIndex(odd, "doc_id", "text",
      dir, threshold = 0.5))
    val direct = rows(Dedup.minhashPairsAcross(odd, even, "doc_id",
      "text", shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5))
    assert(viaIndex.nonEmpty, "fixture must contain cross-parity dups")
    assert(viaIndex == direct)
  }

  test("appendToMinhashIndex: grown layout ≡ built-whole layout") {
    val whole = java.nio.file.Files.createTempDirectory("mhidxW").toString
    val grown = java.nio.file.Files.createTempDirectory("mhidxG").toString
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    Dedup.buildMinhashIndex(even, "doc_id", "text", whole,
      shingleN = 2, numHashes = 128, bands = 32)
    Dedup.buildMinhashIndex(docs.where(col("doc_id") % 4 === 0),
      "doc_id", "text", grown, shingleN = 2, numHashes = 128, bands = 32)
    Dedup.appendToMinhashIndex(docs.where(col("doc_id") % 4 === 2),
      "doc_id", "text", grown)
    def rows(dir: String) = Dedup
      .pairsAgainstIndex(odd, "doc_id", "text", dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toList
    val w = rows(whole)
    assert(w.nonEmpty && rows(grown) == w)
  }

  test("query side uses the STORED geometry, not caller guesses") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx3").toString
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    // index built at shingleN = 3: query must reproduce the n=3 path
    Dedup.buildMinhashIndex(even, "doc_id", "text", dir,
      shingleN = 3, numHashes = 64, bands = 16)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toList
    val viaIndex = key(Dedup.pairsAgainstIndex(odd, "doc_id", "text",
      dir, threshold = 0.5))
    val direct = key(Dedup.minhashPairsAcross(odd, even, "doc_id",
      "text", shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5))
    assert(viaIndex == direct)
  }

  test("both-empty shingle sets score jaccard 1.0 (kernel convention)") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx2").toString
    // single-token docs have NO bigram shingles on either side
    val idx = Seq((10L, "solo")).toDF("doc_id", "text")
    val q = Seq((11L, "alone")).toDF("doc_id", "text")
    Dedup.buildMinhashIndex(idx, "doc_id", "text", dir,
      shingleN = 2, numHashes = 16, bands = 4)
    val got = Dedup.pairsAgainstIndex(q, "doc_id", "text", dir, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val direct = Dedup.minhashPairsAcross(q, idx, "doc_id", "text",
        shingleN = 2, numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toList == direct.toList)
  }
}
