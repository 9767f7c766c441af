package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.WordpieceLm

/** WordPiece tokenizer (ops.Wordpiece / core.WordpieceLm): greedy
  * longest-match semantics, whole-word UNK, likelihood-scored learning,
  * id space, encode round-trip, determinism. */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  private def vocab(ps: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    ps.foreach(s.add)
    s
  }

  test("segment: greedy longest-match-first with ## continuation") {
    val v = vocab("a", "##b", "##c", "ab", "abc", "##d")
    assert(WordpieceLm.segment("ab", v, 4).toList == List("ab"))
    assert(WordpieceLm.segment("abc", v, 4).toList == List("abc"))
    assert(WordpieceLm.segment("ac", v, 4).toList == List("a", "##c"))
    // greedy, not optimal: longest prefix wins even when a shorter one
    // would let the remainder match longer
    val g = vocab("ab", "##cd", "a", "##b", "##c", "##d", "abc")
    assert(WordpieceLm.segment("abcd", g, 4).toList ==
      List("abc", "##d"))
  }

  test("segment: any unmatched position collapses the WHOLE word to [UNK]") {
    val v = vocab("a", "##b")
    assert(WordpieceLm.segment("abx", v, 4).toList == List("[UNK]"))
    // word-initial char only known as a continuation → no match at pos 0
    assert(WordpieceLm.segment("ba", v, 4).toList == List("[UNK]"))
    assert(WordpieceLm.segment("", v, 4).isEmpty)
  }

  test("segment: maxContentLen bounds match attempts") {
    val v = vocab("aaaa", "a", "##a")
    assert(WordpieceLm.segment("aaaa", v, 2).toList ==
      List("a", "##a", "##a", "##a"))
    assert(WordpieceLm.segment("aaaa", v, 4).toList == List("aaaa"))
  }

  test("segment: code-point positions (non-BMP safe)") {
    val v = vocab("a😀", "##a", "😀")
    assert(WordpieceLm.segment("a😀a", v, 4).toList == List("a😀", "##a"))
    // the surrogate pair is ONE position: ##-continuation after it
    val v2 = vocab("😀", "##a")
    assert(WordpieceLm.segment("😀a", v2, 4).toList == List("😀", "##a"))
  }

  test("learnMerges: likelihood score, count tie-break, ## fusion") {
    // ab×10, ac×5: pairs (a,##b) 10, (a,##c) 5; syms a:15, ##b:10, ##c:5
    // scores 10/150 = 5/75 — EXACT double tie → cnt desc picks (a,##b)
    val df = (Seq.fill(10)("ab") ++ Seq.fill(5)("ac"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val ms = Wordpiece.learnMerges(df, "text", 2)
    assert(ms.head.left == "a" && ms.head.right == "##b")
    assert(ms.head.merged == "ab" && ms.head.freq == 10L)
    // round 2: remaining pair (a,##c) 5; syms ab:10, a:5, ##c:5 →
    // merged ac
    assert(ms(1).merged == "ac")
  }

  test("learnMerges: higher score beats higher count") {
    // xy×4 (x,##y both only here: 4/(4·4)=0.25)
    // ab×6 but a also in az×6: 6/(12·6)=1/12 → (x,##y) wins despite
    // the lower pair count
    val words = Seq.fill(4)("xy") ++ Seq.fill(6)("ab") ++ Seq.fill(6)("az")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val ms = Wordpiece.learnMerges(df, "text", 1)
    assert(ms.head.merged == "xy", s"got ${ms.head}")
  }

  test("model: alphabet ids in code-point order, then merges; dedup") {
    val df = Seq((1L, "ab ba")).toDF("id", "text")
    val ms = Seq(
      Wordpiece.Merge("a", "##b", "ab", 1L),
      Wordpiece.Merge("b", "##a", "ba", 1L),
      Wordpiece.Merge("a", "##b", "ab", 1L)) // duplicate fusion
    val m = Wordpiece.model(df, col("text"), ms)
    // alphabet: ##a, ##b, a, b (code-point order: '#' < letters)
    assert(m.entries.map(_._1) ==
      IndexedSeq("##a", "##b", "a", "b", "ab", "ba"))
    assert(m.entries.map(_._2) == IndexedSeq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(m.maxContentLen == 2)
  }

  test("encode: ids assemble in order; [UNK] maps to unkId") {
    val train = Seq((1L, "ab ab ac")).toDF("id", "text")
    val ms = Wordpiece.learnMerges(train, "text", 1) // merge ab
    val m = Wordpiece.model(train, col("text"), ms)
    // vocab: ##b,##c,a,ab (alphabet ##b ##c a then merged ab)
    val ids = m.entries.toMap
    val enc = Wordpiece.encode(
      Seq((7L, "ab ac zz"), (8L, "")).toDF("id", "text"),
      "id", col("text"), m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(enc(7L) == List(ids("ab"), ids("a"), ids("##c"), -1L))
    assert(enc(8L) == Nil)
  }

  test("segmentCol expression ≡ kernel over fixture word types") {
    val docs = spark.read.parquet(sf("documents"))
    val ms = Wordpiece.learnMerges(docs, "text", 4)
    val m = Wordpiece.model(docs, col("text"), ms)
    val vset = vocab(m.entries.map(_._1): _*)
    val got = docs
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .where(length(col("word")) > 0).distinct()
      .select(col("word"), m.segmentCol(col("word")).as("seg"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    assert(got.nonEmpty)
    got.foreach { case (w, seg) =>
      assert(seg == WordpieceLm.segment(w, vset, m.maxContentLen).toList,
        s"word $w")
      // reassembly invariant: non-UNK pieces concatenate back to the word
      if (seg != List("[UNK]"))
        assert(seg.map(p => if (p.startsWith("##")) p.drop(2) else p)
          .mkString == w, s"word $w")
    }
  }

  test("learnMergesContinue: learn(a) + continue(b) ≡ learn(a+b)") {
    val corpus = Seq("aab aab ab ba bab aab ba").toDF("text")
    val whole = Wordpiece.learnMerges(corpus, "text", 4)
    val first = Wordpiece.learnMerges(corpus, "text", 2)
    val more = Wordpiece.learnMergesContinue(corpus, "text", first, 2)
    assert(first ++ more == whole)
  }

  test("learnMerges deterministic under repartitioning") {
    val docs = spark.read.parquet(sf("documents"))
    val a = Wordpiece.learnMerges(docs, "text", 4)
    val b = Wordpiece.learnMerges(docs.repartition(7), "text", 4)
    assert(a == b)
  }

  test("decode: ##-strip join inverts encode at the collapsed grain") {
    val docs = Seq((1L, "abab ab  ba"), (2L, " ab abab ")).toDF("id", "text")
    val ms = Wordpiece.learnMerges(docs, "text", 2)
    val m = Wordpiece.model(docs, col("text"), ms)
    val enc = Wordpiece.encode(docs, "id", col("text"), m)
    val got = Wordpiece.decode(enc, "id", "ids", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no [UNK] on the training corpus → exact up to whitespace collapse
    assert(got(1L) == "abab ab ba")
    assert(got(2L) == "ab abab")
  }

  test("decode: unknown ids render as the [UNK] literal (lossy arm)") {
    val train = Seq((1L, "ab ab")).toDF("id", "text")
    val m = Wordpiece.model(train, col("text"),
      Wordpiece.learnMerges(train, "text", 1))
    // 'zz' segments to [UNK] → unkId (-1) → decodes to the literal
    val enc = Wordpiece.encode(
      Seq((1L, "ab zz ab")).toDF("id", "text"), "id", col("text"), m)
    val got = Wordpiece.decode(enc, "id", "ids", m)
      .collect().head.getString(1)
    assert(got == "ab [UNK] ab")
  }

  test("fertility: [UNK] word counts one piece; groups add up") {
    val train = Seq((1L, "ab ab")).toDF("id", "text")
    val ms = Wordpiece.learnMerges(train, "text", 1)
    val m = Wordpiece.model(train, col("text"), ms)
    val f = Wordpiece.fertilityByKey(
      Seq((1L, "g1", "ab zz"), (2L, "g2", "ab ab ab")).toDF(
        "id", "g", "text"),
      col("text"), col("g"), m)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(f("g1") == ((2L, 2L))) // ab→1 piece, zz→[UNK]→1 piece
    assert(f("g2") == ((3L, 3L)))
  }
}
