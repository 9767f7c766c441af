package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** BPE merge learning (ops.Bpe): hand-worked merges, greedy fold edges,
  * segmentation under a learned merge list. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("learnMerges: hand-worked merge sequence") {
    // 'aaab' ×3, 'aab' ×1 → pairs: (a,a)=3·2+1=7, (a,b)=4
    val corpus = Seq("aaab aaab aaab aab").toDF("text")
    val m = Bpe.learnMerges(corpus, "text", 3)
    // round 1: (a,a)=7 → aaab=[aa,a,b], aab=[aa,b]
    assert(m(0) == Bpe.Merge("a", "a", 7))
    // round 2: pairs now (aa,a)=3, (a,b)=3, (aa,b)=1 → tie broken by
    // (l, r) lexicographic: "a" < "aa" so (a,b) wins
    assert(m(1) == Bpe.Merge("a", "b", 3))
    // round 3: aaab=[aa,ab], aab=[aa,b] → (aa,ab)=3, (aa,b)=1
    assert(m(2) == Bpe.Merge("aa", "ab", 3))
  }

  test("mergeOnce: greedy left-to-right, no re-merge of fresh symbols") {
    val got = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
        Seq("b", "a", "a"), Seq("a"), Seq.empty[String])
      .toDF("syms").select(Bpe.mergeOnce($"syms", "a", "a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.toList == List(List("aa", "a"), List("aa", "aa"),
      List("b", "aa"), List("a"), Nil))
  }

  test("bpeSegment applies merges in order") {
    val merges = Seq(Bpe.Merge("a", "a", 0L), Bpe.Merge("aa", "b", 0L))
    val got = Seq("aabab", "aaaab", "xy").toDF("w")
      .select(Bpe.bpeSegment($"w", merges)).collect()
      .map(_.getSeq[String](0).toList)
    assert(got.toList == List(
      List("aab", "a", "b"),      // [aa,b,a,b] → aa+b merges, lone a,b stay
      List("aa", "aab"),          // [aa,aa,b] → second aa takes the b
      List("x", "y")))            // untouched by either merge
  }

  test("learnMerges exhausts when every word is one symbol") {
    val m = Bpe.learnMerges(Seq("ab ab cd").toDF("text"), "text", 10)
    // only 2 possible merges exist: (a,b) then (c,d)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"), ("c", "d")))
  }
}
