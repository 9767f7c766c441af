package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Maximal shared token runs (Dedup.sharedRuns): planted full-extent
  * repeats, duplicate occurrences, and a brute-force reference. */
class SharedRunsSpec extends SparkTestBase {
  import spark.implicits._

  private def runsOf(df: org.apache.spark.sql.DataFrame, w: Int) =
    Dedup.sharedRuns(df, "doc_id", "text", windowTokens = w,
        maxDocsPerSpan = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
      .sortBy(x => (x._1, x._2, x._3, x._4))

  test("planted repeats are reported at their FULL extent, not per window") {
    // doc 1: 100 unique tokens a0..a99; doc 2 copies a10..a39 (30 tokens)
    // at position 5 and a60..a71 (12 tokens) at position 50, padded with
    // its own unique tokens elsewhere
    val d1 = (0 until 100).map(i => s"a$i")
    val d2 = (0 until 5).map(i => s"b$i") ++
      (10 to 39).map(i => s"a$i") ++
      (35 until 50).map(i => s"b$i") ++
      (60 to 71).map(i => s"a$i") ++
      (62 until 70).map(i => s"b$i")
    val df = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    val got = runsOf(df, 8)
    // one 30-token run (NOT 23 window hits) + one 12-token run (NOT 5)
    assert(got.toSeq == Seq((1L, 2L, 10, 5, 30), (1L, 2L, 60, 50, 12)))
  }

  test("a block repeated twice in B yields two runs on distinct diagonals") {
    val block = (10 to 29).map(i => s"a$i") // 20 shared tokens
    val d1 = (0 until 60).map(i => s"a$i")
    val d3 = (0 until 4).map(i => s"c$i") ++ block ++
      (4 until 12).map(i => s"c$i") ++ block ++ (12 until 20).map(i => s"c$i")
    val df = Seq((1L, d1.mkString(" ")), (3L, d3.mkString(" ")))
      .toDF("doc_id", "text")
    val got = runsOf(df, 8)
    assert(got.toSeq == Seq((1L, 3L, 10, 4, 20), (1L, 3L, 10, 32, 20)))
  }

  test("shorter-than-window docs and run-length floor behave") {
    val df = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    assert(runsOf(df, 8).isEmpty) // no 8-token window exists
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")
    val df2 = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val floored = Dedup.sharedRuns(df2, "doc_id", "text", windowTokens = 8,
      minRunTokens = 30)
    assert(floored.count() == 0) // 20-token run < 30 floor
    assert(runsOf(df2, 8).toSeq == Seq((1L, 2L, 0, 0, 20)))
  }

  test("removeSharedRuns deletes planted repeats at full extent, keeps first") {
    val d1 = (0 until 40).map(i => s"a$i")
    // doc 2: 5 own tokens, then a copy of a10..a29 (20 tokens), then own
    val d2 = (0 until 5).map(i => s"b$i") ++ (10 to 29).map(i => s"a$i") ++
      (5 until 13).map(i => s"b$i")
    // doc 3: an exact copy of doc 1 → comes back empty
    val df = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")),
      (3L, d1.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.removeSharedRuns(df, "doc_id", "text", windowTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 is the first occurrence everywhere: untouched
    assert(got(1L) == ((d1.mkString(" "), 40L, 0L)))
    // doc 2 loses EXACTLY the 20-token block; its own tokens survive intact
    val d2kept = (0 until 5).map(i => s"b$i") ++ (5 until 13).map(i => s"b$i")
    assert(got(2L) == ((d2kept.mkString(" "), 13L, 20L)))
    // doc 3 is fully shared with doc 1 → empty, not missing
    assert(got(3L) == (("", 0L, 40L)))
  }

  test("removeSharedRuns composes overlapping runs from different partners") {
    // doc 3 shares tokens 0..19 with doc 1 and tokens 12..31 with doc 2;
    // the union 0..31 must go, not just one run
    val base = (0 until 40).map(i => s"c$i")
    val d1 = base.slice(0, 20) ++ (0 until 10).map(i => s"x$i")
    val d2 = (0 until 10).map(i => s"y$i") ++ base.slice(12, 32)
    val df = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")),
      (3L, base.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.removeSharedRuns(df, "doc_id", "text", windowTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((30L, 0L))) // smallest id keeps everything
    // docs 1 and 2 also overlap on c12..c19 (exactly one 8-token window) —
    // doc 2, the larger id of THAT pair, loses those 8 tokens too
    assert(got(2L) == ((22L, 8L)))
    assert(got(3L) == ((8L, 32L))) // union 0..31 gone; kept = c32..c39 only
  }

  test("removeSharedRuns: empty/whitespace-only docs report n_kept=0") {
    // split(trim(""), "\s+") yields [""] — the phantom token must not
    // survive as n_kept=1 / clean_text="" built from a bogus token
    val df = Seq((1L, ""), (2L, "   \t "), (3L, "real tokens here"))
      .toDF("doc_id", "text")
    val got = Dedup.removeSharedRuns(df, "doc_id", "text", windowTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("", 0L, 0L)))
    assert(got(2L) == (("", 0L, 0L)))
    assert(got(3L) == (("real tokens here", 3L, 0L)))
  }

  test("matches a brute-force reference on random small-vocab corpora") {
    val rnd = new scala.util.Random(1234)
    val w = 3
    for (trial <- 1 to 3) {
      val docs = (0L until 6L).map { id =>
        id -> Vector.fill(20 + rnd.nextInt(15))(s"t${rnd.nextInt(5)}")
      }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      // reference: all (pa, pb) with equal w-token windows, chained along
      // diagonals into maximal islands
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        ms = for {
          pa <- 0 to ta.length - w; pb <- 0 to tb.length - w
          if ta.slice(pa, pa + w) == tb.slice(pb, pb + w)
        } yield (pa, pb)
        ((_, _), grp) <- ms.groupBy { case (pa, pb) => (pa - pb, 0) }.toSeq
        island <- {
          val sorted = grp.sortBy(_._1)
          sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, m) =>
            if (m._1 == acc.last.last._1 + 1) acc.init :+ (acc.last :+ m)
            else acc :+ Vector(m)
          }
        }
      } yield (ia, ib, island.head._1, island.head._2,
        island.last._1 - island.head._1 + w))
        .sortBy(x => (x._1, x._2, x._3, x._4))
      val got = runsOf(df, w)
      assert(got.toSeq == want.toSeq, s"trial $trial")
    }
  }
}
