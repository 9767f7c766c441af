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

  test("learnMerges matches an in-memory reference on randomized corpora") {
    // independent reference: true left-to-right greedy merge (index walk,
    // not the check-last fold) + explicit (cnt desc, l, r) selection
    def reference(text: String, k: Int): Seq[Bpe.Merge] = {
      var vocab: Map[List[String], Long] = text.split("\\s+")
        .filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => w.map(_.toString).toList -> ws.length.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.zip(syms.drop(1)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + f } }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq
            .sortBy { case ((l, r), c) => (-c, l, r) }.head
          out += Bpe.Merge(l, r, c)
          vocab = vocab.map { case (syms, f) =>
            val b = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.toList -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val text = Seq.fill(40)(
        (0 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .mkString(" ")
      val want = reference(text, 5)
      val got = Bpe.learnMerges(Seq(text).toDF("text"), "text", 5)
      assert(got == want, s"trial $trial corpus=$text")
    }
  }

  test("learnMerges exhausts when every word is one symbol") {
    val m = Bpe.learnMerges(Seq("ab ab cd").toDF("text"), "text", 10)
    // only 2 possible merges exist: (a,b) then (c,d)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"), ("c", "d")))
  }

  test("learnMerges leaves no checkpointed state behind (bounded storage)") {
    // each round localCheckpoints the next vocab table; the previous round's
    // blocks must be released or k rounds pin k tables — at k=32000 that is
    // thousands of dead materializations
    def live: Int = spark.sparkContext.getPersistentRDDs.size
    val before = live
    val corpus = Seq("aaab aaab aaab aab abab baba").toDF("text")
    val m = Bpe.learnMerges(corpus, "text", 6)
    assert(m.nonEmpty)
    assert(live == before,
      s"learnMerges leaked ${live - before} persistent RDDs")
  }
}
