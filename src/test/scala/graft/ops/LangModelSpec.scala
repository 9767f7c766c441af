package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Char-n-gram LM scoring (ops.LangModel): hand-computed probabilities,
  * smoothing floor for unseen grams, self-scoring wrapper. */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq((1L, "abab"), (2L, "abcd")).toDF("doc_id", "text")

  test("charNgramCounts: exact bigram counts") {
    val got = LangModel.charNgramCounts(corpus, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 3L, "ba" -> 1L, "bc" -> 1L, "cd" -> 1L))
  }

  test("charNgramLogProb: hand-computed add-k probabilities") {
    val model = LangModel.charNgramCounts(corpus, "text", 2)
    val got = LangModel.charNgramLogProb(corpus, "doc_id", "text", model,
        n = 2, addK = 1.0, vocabSize = 4L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // ctx totals: a→3 (ab), b→2 (ba,bc), c→1 (cd)
    val doc1 = (2 * math.log(4.0 / 7) + math.log(2.0 / 6)) / 3
    val doc2 = (math.log(4.0 / 7) + math.log(2.0 / 6) + math.log(2.0 / 5)) / 3
    assert(got(1L)._1 == 3L && got(2L)._1 == 3L)
    assert(math.abs(got(1L)._2 - doc1) < 1e-12)
    assert(math.abs(got(2L)._2 - doc2) < 1e-12)
  }

  test("unseen grams and contexts hit the smoothing floor") {
    val model = LangModel.charNgramCounts(corpus, "text", 2)
    val held = Seq((9L, "zz")).toDF("doc_id", "text")
    val got = LangModel.charNgramLogProb(held, "doc_id", "text", model,
        n = 2, addK = 1.0, vocabSize = 4L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(got._1 == 1L)
    assert(math.abs(got._2 - math.log(0.25)) < 1e-12) // (0+1)/(0+1·4)
  }

  test("unseen gram under a SEEN context uses the context total") {
    // model has ab/ba/bc/cd; "ad" is unseen but context "a" has total 3
    val model = LangModel.charNgramCounts(corpus, "text", 2)
    val held = Seq((9L, "ad")).toDF("doc_id", "text")
    val got = LangModel.charNgramLogProb(held, "doc_id", "text", model,
        n = 2, addK = 1.0, vocabSize = 4L)
      .collect().map(r => r.getDouble(2)).head
    assert(math.abs(got - math.log(1.0 / 7)) < 1e-12) // (0+1)/(3+1·4)
  }

  test("scoring plans exactly ONE broadcast join (consolidated probe)") {
    val model = LangModel.charNgramCounts(corpus, "text", 2)
    val scored = LangModel.charNgramLogProb(corpus, "doc_id", "text", model,
      n = 2, addK = 1.0, vocabSize = 4L)
    scored.collect()
    // AQE prints Final + Initial sections — count joins in the final only
    val plan = scored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val joins = "BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one broadcast probe, got $joins:\n$plan")
  }

  test("short docs produce no grams and drop out; scoreSelf ranks typicality") {
    val docs = Seq((1L, "aaaa aaaa"), (2L, "aaaa aaab"), (3L, "xqz vwxq"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = LangModel.scoreSelf(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!got.contains(4L))           // shorter than n
    assert(got(1L) > got(2L))           // all-typical beats the odd tail
    assert(got(2L) > got(3L))           // rare chars score lowest
  }
}
