package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase
import graft.expr.{TextHash, TextKernels}

/** Winnowing fingerprints (TextKernels.winnow / Dedup.winnowPairs). */
class WinnowSpec extends SparkTestBase {

  /** From-scratch O(m·w) reference: independent hash computation (no
    * rolling recurrence) + literal rightmost-argmin per window. */
  private def refWinnow(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val b = s.getBytes("UTF-8")
    val m = b.length - k + 1
    if (m <= 0) return Seq.empty
    val hs = (0 until m).map { i =>
      var h = 0L
      (i until i + k).foreach(j => h = h * TextHash.FnvPrime + (b(j) & 0xffL))
      TextHash.avalanche(h)
    }
    val win = math.min(w, m)
    val sels = (win - 1 until m).map { j =>
      // rightmost argmin over [j-win+1, j]
      (j - win + 1 to j).foldLeft(j - win + 1) { (best, jj) =>
        if (hs(jj) <= hs(best)) jj else best
      }
    }
    sels.distinct.map(p => (p, hs(p)))
  }

  private def kernel(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val a = TextKernels.winnow(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getInt(0), r.getLong(1))
    }
  }

  test("kernel == from-scratch reference on random strings") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefg "
    (0 until 60).foreach { _ =>
      val s = (0 until (rnd.nextInt(120) + 1))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val k = rnd.nextInt(6) + 2
      val w = rnd.nextInt(8) + 1
      assert(kernel(s, k, w) == refWinnow(s, k, w), s"k=$k w=$w s=$s")
    }
  }

  test("winnowing guarantee: shared substring >= k+w-1 bytes => shared fp") {
    val rnd = new scala.util.Random(13)
    val k = 8; val w = 6
    (0 until 30).foreach { _ =>
      def rndStr(n: Int) =
        (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val shared = rndStr(k + w - 1)
      val a = rndStr(rnd.nextInt(40)) + shared + rndStr(rnd.nextInt(40))
      val b = rndStr(rnd.nextInt(40)) + shared + rndStr(rnd.nextInt(40))
      val fa = kernel(a, k, w).map(_._2).toSet
      val fb = kernel(b, k, w).map(_._2).toSet
      assert(fa.intersect(fb).nonEmpty, s"a=$a b=$b")
    }
  }

  test("edges: short text, single window, density ~ 1/w") {
    assert(kernel("", 8, 4).isEmpty)
    assert(kernel("abcdefg", 8, 4).isEmpty)
    // exactly k bytes: one gram, one fingerprint at pos 0
    val one = kernel("abcdefgh", 8, 4)
    assert(one.map(_._1) == Seq(0))
    // fewer grams than the window: one global (rightmost-min) selection
    val few = kernel("abcdefghij", 8, 16)
    assert(few.size == 1 && few == refWinnow("abcdefghij", 8, 16))
    // long text: selection density lands near 2/(w+1) (paper's expectation)
    val rnd = new scala.util.Random(3)
    val long = (0 until 8000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val n = kernel(long, 8, 16).size
    val m = long.length - 8 + 1
    assert(n > m / 16 / 2 && n < m / 4, s"density off: $n of $m")
  }

  test("winnowPairs: planted overlap found, boilerplate dropped, " +
      "containment, partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def rndText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = rndText(120)
    val boiler = rndText(80) // appears in 5 docs > maxDocFreq -> dropped
    val docs = Seq(
      (1L, boiler + " " + shared + " " + rndText(60)),
      (2L, rndText(50) + " " + boiler + " " + shared),
      (3L, boiler + " " + rndText(200)),
      (4L, rndText(180) + " " + boiler),
      // 5 is a SHORT doc fully contained in 6's long text
      (5L, shared),
      (6L, rndText(150) + shared + rndText(150) + " " + boiler))
    val df = docs.toDF("id", "text")
    val got = Dedup.winnowPairs(df, "id", col("text"),
        k = 24, window = 8, minShared = 2, maxDocFreq = 4)
      .orderBy("idA", "idB").collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every doc-pair sharing the 120-byte run must surface
    Seq((1L, 2L), (1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L), (5L, 6L))
      .foreach(p => assert(pairs.contains(p), s"missing $p"))
    // boilerplate-only pairs (3, 4) must NOT surface: boiler fps occur
    // in 5 docs > maxDocFreq (the shared run sits in exactly 4 = the cap)
    assert(!pairs.contains((3L, 4L)))
    // containment: doc 5 inside doc 6 scores full overlap
    val c56 = got.find(r => r.getLong(0) == 5L && r.getLong(1) == 6L).get
    assert(c56.getDouble(5) == 1.0)
    val again = Dedup.winnowPairs(df.repartition(7), "id", col("text"),
        k = 24, window = 8, minShared = 2, maxDocFreq = 4)
      .orderBy("idA", "idB").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("winnowPairsBetween: cross-side contamination only, union df cap") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def rndText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val evalItem = rndText(100)
    val boiler = rndText(80)
    // train: two docs embed the eval item (contaminated), one clean pair
    // shares a run ONLY within the train side (must NOT be reported)
    val trainRun = rndText(100)
    val train = Seq(
      (1L, rndText(50) + evalItem + rndText(50)),
      (2L, evalItem + " " + boiler),
      (3L, trainRun + rndText(40) + " " + boiler),
      (4L, rndText(40) + trainRun + " " + boiler)).toDF("id", "text")
    val bench = Seq(
      (100L, evalItem),
      (101L, rndText(90) + " " + boiler)).toDF("id", "text")
    val got = Dedup.winnowPairsBetween(train, bench, "id", col("text"),
        k = 24, window = 8, minShared = 2, maxDocFreq = 5)
      .orderBy("idA", "idB").collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 100L)) && pairs.contains((2L, 100L)))
    // output is strictly cross-side: the train-train run (3,4) never
    // appears, idA is always a train id, idB always a bench id
    assert(!pairs.exists { case (a, b) => a >= 100L || b < 100L })
    // bench doc embedded in train doc 1: near-total containment (only
    // edge windows — within `window` grams of the boundary — may select
    // differently in the larger context)
    val c = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 100L).get
    assert(c.getDouble(5) >= 0.75, c.toString)
    // tighter cap drops boilerplate pairings entirely
    val capped = Dedup.winnowPairsBetween(train, bench, "id", col("text"),
        k = 24, window = 8, minShared = 2, maxDocFreq = 3)
      .orderBy("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.forall { case (_, b) => b == 100L })
  }

  test("winnowSourceCrosstab: shared run links its sources, others don't") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def rndText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val run = rndText(120)
    val docs = Seq(
      (1L, "sA", run + rndText(60)),
      (2L, "sA", rndText(150)),
      (3L, "sB", rndText(40) + run),
      (4L, "sB", rndText(150)),
      (5L, "sC", rndText(150))).toDF("id", "src", "text")
    val out = Dedup.winnowSourceCrosstab(docs, "id", col("text"),
        col("src"), k = 24, window = 8, maxDocFreq = 10)
      .collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byPair.contains(("sA", "sB")))
    val ab = byPair(("sA", "sB"))
    assert(ab.getLong(2) >= 5) // the 120-byte run winnows to many fps
    // sC shares nothing with anyone
    assert(!out.exists(r => r.getString(0) == "sC" ||
      r.getString(1) == "sC"))
    // totals count DISTINCT fps per source, so overlap <= 1
    out.foreach(r => assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0))
  }
}
