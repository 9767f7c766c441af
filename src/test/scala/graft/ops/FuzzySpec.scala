package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** PassJoin edit-distance join (Fuzzy.editDistanceJoin / editDistancePairs). */
class FuzzySpec extends SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Deterministic corpus with planted near-duplicates: substitutions,
    * deletions, insertions at various positions, plus unrelated strings. */
  private def corpus: Seq[(Long, String)] = {
    val bases = Seq(
      "the quick brown fox", "jumps over the lazy dog", "pack my box",
      "with five dozen jugs", "lorem ipsum dolor", "a tiny doc",
      "abcdefghij", "zzzzzzzzzz")
    val rng = new scala.util.Random(42)
    val mutated = bases.zipWithIndex.flatMap { case (b, i) =>
      val sub = { val p = rng.nextInt(b.length); b.updated(p, 'x') }
      val del = { val p = rng.nextInt(b.length); b.take(p) + b.drop(p + 1) }
      val ins = { val p = rng.nextInt(b.length); b.take(p) + "q" + b.drop(p) }
      val two = { val p = rng.nextInt(b.length - 1)
        b.updated(p, 'x').updated(p + 1, 'y') }
      Seq(b, sub, del, ins, two)
    }
    // short strings exercise the sub-τ+1 bucket
    val shorts = Seq("a", "ab", "b", "", "xy")
    (mutated ++ shorts).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  private def bruteforce(tau: Int): Set[(Long, Long, Int)] = {
    val c = corpus
    (for {
      (ia, sa) <- c; (ib, sb) <- c
      if ia < ib
      d = lev(sa, sb)
      if d <= tau
    } yield (ia, ib, d)).toSet
  }

  private def viaOp(tau: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    Fuzzy.editDistancePairs(corpus.toDF("id", "text"), "id", "text", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("self-join pairs == brute force at tau=1") {
    assert(viaOp(1) == bruteforce(1))
  }

  test("self-join pairs == brute force at tau=2 (incl. planted 2-edit pairs)") {
    val got = viaOp(2)
    val want = bruteforce(2)
    assert(got == want)
    assert(want.exists(_._3 == 2), "fixture must contain distance-2 pairs")
  }

  test("self-join pairs == brute force at tau=3") {
    assert(viaOp(3) == bruteforce(3))
  }

  test("tau=0 degenerates to an equality join") {
    import spark.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, "diff")).toDF("id", "text")
    val got = Fuzzy.editDistancePairs(df, "id", "text", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0)))
  }

  test("two-table join: typo'd lookups resolve, distances are true") {
    import spark.implicits._
    val catalog = Seq((10L, "anthracite"), (11L, "graphite"),
      (12L, "basalt")).toDF("cid", "name")
    val queries = Seq((1L, "anthrcite"), (2L, "graphitee"), (3L, "gneiss"))
      .toDF("qid", "q")
    val got = Fuzzy.editDistanceJoin(queries, "qid", "q",
        catalog, "cid", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)))
  }

  test("length-difference boundary: |len(a)-len(b)| == tau pairs are found") {
    import spark.implicits._
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefghXY")).toDF("id", "text")
    val got = Fuzzy.editDistancePairs(df, "id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 2)))
  }

  test("randomized small-alphabet corpora == brute force (segment boundaries)") {
    // short strings over {a,b} maximize coincidental near-matches and
    // exercise every segment-length remainder case (L mod tau+1)
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 3; tau <- 1 to 2) {
      val strs = (0 until 40).map { i =>
        (i.toLong, (0 until (tau + 1 + rng.nextInt(8)))
          .map(_ => if (rng.nextBoolean()) 'a' else 'b').mkString)
      }
      val got = Fuzzy.editDistancePairs(strs.toDF("id", "text"),
          "id", "text", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs
        if ia < ib
        d = lev(sa, sb)
        if d <= tau
      } yield (ia, ib, d)).toSet
      assert(got == want, s"trial=$trial tau=$tau")
    }
  }

  test("pair-set semantics: duplicate input rows don't multiply output, any tau") {
    import spark.implicits._
    val left = Seq((1L, "abc"), (1L, "abc"), (2L, "abc")).toDF("id", "t")
    val right = Seq((9L, "abc")).toDF("id", "t")
    for (tau <- 0 to 1) {
      val got = Fuzzy.editDistanceJoin(left, "id", "t", right, "id", "t", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = Fuzzy.editDistanceJoin(left, "id", "t", right, "id", "t", tau)
        .count()
      assert(got == Set((1L, 9L), (2L, 9L)), s"tau=$tau")
      assert(n == 2, s"tau=$tau expected 2 rows, got $n")
    }
  }

  test("duplicate RIGHT rows don't multiply output (main + short buckets)") {
    import spark.implicits._
    // "abc" exercises the main blocked path; "a" the short bucket (τ=1)
    val left = Seq((1L, "abc"), (2L, "a")).toDF("id", "t")
    val right = Seq((9L, "abc"), (9L, "abc"), (8L, "a"), (8L, "a"))
      .toDF("id", "t")
    for (tau <- 0 to 1) {
      val rows = Fuzzy.editDistanceJoin(left, "id", "t", right, "id", "t", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(rows.length == rows.map(r => (r._1, r._2)).distinct.length,
        s"tau=$tau duplicated pair rows: ${rows.toSeq}")
      assert(rows.toSet == Set((1L, 9L, 0), (2L, 8L, 0)), s"tau=$tau")
    }
  }

  test("one id with two texts yields one pair row with the min distance") {
    import spark.implicits._
    val left = Seq((1L, "abc")).toDF("id", "t")
    val right = Seq((9L, "abd"), (9L, "abc")).toDF("id", "t")
    val rows = Fuzzy.editDistanceJoin(left, "id", "t", right, "id", "t", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows == Seq((1L, 9L, 0)))
  }

  test("hot-segment guard drops only pairs whose every witness is hot") {
    import spark.implicits._
    // 20 strings share the (len=8, i=0, "AAAA") segment key — the planted
    // boilerplate-prefix hot spot. Their suffixes never witness a pair
    // (shifted probe substrings mix prefix chars and digits), so every
    // filler pair is hot-witness-only. The "BBBB" pair's shared segment
    // indexes just 2 strings and must survive the guard.
    val hot = (0 until 20).map(i => (i.toLong, f"AAAA$i%04d"))
    val planted = Seq((100L, "BBBBcdef"), (101L, "BBBBcdeg"))
    val df = (hot ++ planted).toDF("id", "text")
    val exact = Fuzzy.editDistancePairs(df, "id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val guarded = Fuzzy.editDistancePairs(df, "id", "text", 1,
        maxStringsPerSeg = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact.exists(p => p._1 < 20 && p._2 < 20),
      "fixture must contain hot-witness-only pairs")
    assert(guarded.subsetOf(exact))
    assert(guarded.contains((100L, 101L, 1)),
      "pair with a non-hot witnessing segment must survive")
    assert(!guarded.exists(p => p._1 < 20 && p._2 < 20),
      "hot-witness-only pairs must be dropped under the guard")
    // guard wide enough to keep every key ≡ exact
    val loose = Fuzzy.editDistancePairs(df, "id", "text", 1,
        maxStringsPerSeg = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(loose == exact)
  }

  test("null texts are dropped, not matched") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, null.asInstanceOf[String]),
      (3L, "alphq")).toDF("id", "text")
    val got = Fuzzy.editDistancePairs(df, "id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)))
  }
}
