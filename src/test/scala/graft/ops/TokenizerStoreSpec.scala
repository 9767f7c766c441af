package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Persisted tokenizer layouts (TokenizerStore): exact model round-trips
  * for all three families, bit-identical encode under a reloaded model,
  * and the family-tag refusal that keeps a WordPiece layout from being
  * misread as a unigram one. */
class TokenizerStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tokstore").toString

  test("BPE merges round-trip in exact learned order") {
    val corpus = Seq("aaab aaab aaab aab abab").toDF("text")
    val merges = Bpe.learnMerges(corpus, "text", 4)
    val dir = tmp()
    TokenizerStore.saveBpe(spark, merges, dir)
    assert(TokenizerStore.loadBpe(spark, dir) == merges)
  }

  test("unigram model round-trips; reloaded encode is bit-identical") {
    val corpus = Seq((1L, "the cat then that"), (2L, "hat the then"))
      .toDF("doc_id", "text")
    val m = Unigram.learn(corpus, col("text"), vocabSize = 16,
      maxPieceLen = 3, minCount = 1, seedCap = 16, emIters = 2)
    val dir = tmp()
    TokenizerStore.saveUnigram(spark, m, dir)
    val m2 = TokenizerStore.loadUnigram(spark, dir)
    assert(m2.entries == m.entries && m2.maxPieceLen == m.maxPieceLen)
    val a = Unigram.encode(corpus, "doc_id", col("text"), m)
      .orderBy("doc_id").collect().map(r => r.getSeq[Long](1)).toList
    val b = Unigram.encode(corpus, "doc_id", col("text"), m2)
      .orderBy("doc_id").collect().map(r => r.getSeq[Long](1)).toList
    assert(a == b, "reloaded-model encode must be bit-identical")
  }

  test("WordPiece model round-trips; reloaded segmentation identical") {
    val corpus = Seq("aab aab ab ba").toDF("text")
    val merges = Wordpiece.learnMerges(corpus, "text", 3)
    val m = Wordpiece.model(corpus, col("text"), merges)
    val dir = tmp()
    TokenizerStore.saveWordpiece(spark, m, dir)
    val m2 = TokenizerStore.loadWordpiece(spark, dir)
    assert(m2.entries == m.entries && m2.maxContentLen == m.maxContentLen)
    val words = Seq("aab", "ba", "abab").toDF("word")
    val a = words.select(m.segmentCol(col("word"))).collect()
      .map(_.getSeq[String](0).toList).toList
    val b = words.select(m2.segmentCol(col("word"))).collect()
      .map(_.getSeq[String](0).toList).toList
    assert(a == b)
  }

  test("WordPiece merges round-trip; continuation runs from the store") {
    val corpus = Seq("aab aab ab ba bab aab ba").toDF("text")
    val whole = Wordpiece.learnMerges(corpus, "text", 4)
    val first = whole.take(2)
    val dir = tmp()
    TokenizerStore.saveWordpiece(spark,
      Wordpiece.model(corpus, col("text"), first), dir, merges = first)
    val reloaded = TokenizerStore.loadWordpieceMerges(spark, dir)
    assert(reloaded == first)
    // train-continue from the STORED merge table reproduces the one-shot
    val more = Wordpiece.learnMergesContinue(corpus, "text", reloaded, 2)
    assert(reloaded ++ more == whole)
  }

  test("persisted LOSSLESS unigram model: reloaded decode is identity") {
    val texts = Seq(1L -> "some  spaced   text", 2L -> "héé 😀  ")
    val df = texts.toDF("doc_id", "text")
    val m = Unigram.learnLossless(df, col("text"), vocabSize = 24,
      maxPieceLen = 3, minCount = 1, seedCap = 16, emIters = 1)
    val dir = tmp()
    TokenizerStore.saveUnigram(spark, m, dir)
    val m2 = TokenizerStore.loadUnigram(spark, dir)
    // the serving path: encode AND decode both under the reloaded model
    val enc = Unigram.encodeLossless(df, "doc_id", col("text"), m2)
    val got = Unigram.decode(enc, "doc_id", "ids", m2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) => assert(got(id) == t) }
  }

  test("byte-mode BPE layout: continueBpe replays over BYTE symbols") {
    // non-ASCII corpus: byte and char alphabets genuinely diverge ('é'
    // is two UTF-8 bytes), so a char-mode replay of a byte-mode table
    // would fold different state — the silent-divergence ADVICE trap
    val corpus = Seq("éé éé éa éa aa éé").toDF("text")
    val whole = Bpe.learnMergesBytes(corpus, "text", 4)
    val first = whole.take(2)
    val dir = tmp()
    TokenizerStore.saveBpe(spark, first, dir, alphabet = "byte")
    assert(TokenizerStore.loadBpeAlphabet(spark, dir) == "byte")
    // store-driven continuation reproduces the one-shot byte-mode learn
    val extended = TokenizerStore.continueBpe(spark, dir, corpus, "text", 2)
    assert(extended == whole)
    // char-mode layouts dispatch to the char continuation (q221 identity)
    val cWhole = Bpe.learnMerges(corpus, "text", 4)
    val cDir = tmp()
    TokenizerStore.saveBpe(spark, cWhole.take(2), cDir)
    assert(TokenizerStore.loadBpeAlphabet(spark, cDir) == "char")
    assert(TokenizerStore.continueBpe(spark, cDir, corpus, "text", 2)
      == cWhole)
  }

  test("re-saving a merge-less WordPiece model scrubs stale merges") {
    val corpus = Seq("aab aab ab ba").toDF("text")
    val merges = Wordpiece.learnMerges(corpus, "text", 2)
    val m = Wordpiece.model(corpus, col("text"), merges)
    val dir = tmp()
    TokenizerStore.saveWordpiece(spark, m, dir, merges = merges)
    assert(TokenizerStore.loadWordpieceMerges(spark, dir) == merges)
    // second save WITHOUT merges: the old table must not survive to be
    // misread as trainer state for the new vocab
    TokenizerStore.saveWordpiece(spark, m, dir)
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.loadWordpieceMerges(spark, dir)
    }
    assert(e.getMessage.contains("without merges"))
  }

  test("chat specials block round-trips; wrap/strip agree through it") {
    val dir = tmp()
    TokenizerStore.saveSpecials(spark, dir, SpecialTokens.Chat)
    val back = TokenizerStore.loadSpecials(spark, dir)
      .getOrElse(fail("specials block missing after save"))
    assert(back == SpecialTokens.Chat)
    assert(back.reserve == 8L && back.padId == 0L && back.bosId == 1L &&
      back.eosId == 2L && back.unkId == 3L &&
      back.id(SpecialTokens.End) == 7L)
    // a store-loaded block drives encodeTurns identically to the literal
    val turns = Seq((1L, 0, "assistant", Seq(0L, 5L)))
      .toDF("conv", "turn", "role", "ids")
    val a = Chat.encodeTurns(turns, "conv", "turn", "role", "ids", back)
      .head()
    val b = Chat.encodeTurns(turns, "conv", "turn", "role", "ids",
      SpecialTokens.Chat).head()
    assert(a.getAs[scala.collection.Seq[Long]]("input_ids") ==
      b.getAs[scala.collection.Seq[Long]]("input_ids"))
  }

  test("a layout refuses to load as a different family") {
    val corpus = Seq("ab ab").toDF("text")
    val dir = tmp()
    TokenizerStore.saveBpe(spark, Bpe.learnMerges(corpus, "text", 1), dir)
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.loadUnigram(spark, dir)
    }
    assert(e.getMessage.contains("'bpe'"))
  }
}
