package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Interpolated Kneser-Ney bigram model (LangModel.kneserNeyTrain /
  * kneserNeyScore): hand-computed probabilities, continuation-count
  * semantics, backoff arms, edge conventions. */
class KneserNeySpec extends SparkTestBase {
  import spark.implicits._

  // train: "a b" ×2, "a c" ×1 → bt {(a,b):2,(a,c):1}; ctx a:(cu 3, n1u 2);
  // cont {b:1, c:1}; nb = 2 types; word types {a,b,c} → V = 4; nbv = 6
  private lazy val m = LangModel.kneserNeyTrain(
    Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text"), "text")

  private def score(text: String): (Long, Double) = {
    val r = LangModel.kneserNeyScore(
      Seq((9L, text)).toDF("id", "text"), "id", "text", m).collect()
    if (r.isEmpty) (-1L, Double.NaN)
    else (r(0).getLong(1), r(0).getDouble(2))
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed: seen bigram, discounted + interpolated") {
    // p(b|a) = (max(2−.75,0) + .75·2·pcont(b)) / 3, pcont(b) = 2/6
    val expected = (1.25 + 0.75 * 2 * (2.0 / 6)) / 3
    assert(score("a b") == ((1L, r6(math.log(expected)))))
  }

  test("hand-computed: unseen bigram under a seen context") {
    // p(z|a): cuw 0 → discount floor 0; pcont(z) = 1/6 (unseen w floor)
    val expected = (0.0 + 0.75 * 2 * (1.0 / 6)) / 3
    assert(score("a z") == ((1L, r6(math.log(expected)))))
  }

  test("hand-computed: unseen context backs off to continuation prob") {
    // u = b never a context → p(a|b) = pcont(a) = (0+1)/6
    assert(score("b a") == ((1L, r6(math.log(1.0 / 6)))))
  }

  test("nbv bookkeeping and per-doc averaging") {
    assert(m.nbv == 6L && m.discount == 0.75)
    // "a b a" → bigrams (a,b), (b,a): avg of the two hand values
    val pab = (1.25 + 0.75 * 2 * (2.0 / 6)) / 3
    val pba = 1.0 / 6
    assert(score("a b a") ==
      ((2L, r6((math.log(pab) + math.log(pba)) / 2))))
  }

  test("short docs are absent; whitespace runs don't break adjacency") {
    assert(score("a")._1 == -1L)
    assert(score("")._1 == -1L)
    assert(score("a  \t b") == score("a b"))
  }

  test("continuation counts, not raw frequency (the KN insight)") {
    // york: frequent (5×) but ONLY ever after 'new' → n1w = 1
    // dog: rarer (3×) but follows THREE contexts → n1w = 3
    val kn = LangModel.kneserNeyTrain(
      (Seq.fill(5)("new york") ++ Seq("a dog", "b dog", "c dog"))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text"), "text")
    def s(text: String): Double = LangModel.kneserNeyScore(
      Seq((1L, text)).toDF("id", "text"), "id", "text", kn)
      .collect()(0).getDouble(2)
    // unseen context 'q' → pure pcont comparison
    assert(s("q dog") > s("q york"))
  }

  test("deterministic under repartitioning") {
    val docs = spark.read.parquet(sf("documents"))
    val m1 = LangModel.kneserNeyTrain(docs, "text")
    val m2 = LangModel.kneserNeyTrain(docs.repartition(7), "text")
    assert(m1.nbv == m2.nbv)
    val a = LangModel.kneserNeyScore(docs, "doc_id", "text", m1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    val b = LangModel.kneserNeyScore(docs.repartition(5), "doc_id",
        "text", m2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    assert(a.nonEmpty && a == b)
  }

  test("discount validated") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      LangModel.kneserNeyTrain(df, "text", discount = 1.0)
    }
    intercept[IllegalArgumentException] {
      LangModel.kneserNeyTrain(df, "text", discount = 0.0)
    }
  }
}
