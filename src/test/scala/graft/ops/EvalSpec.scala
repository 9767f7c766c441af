package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Classifier evaluation (Eval.auc / Eval.prAtThresholds). */
class EvalSpec extends SparkTestBase {

  /** Brute-force pair-counting reference: concordant + half-ties over all
    * (pos, neg) pairs — exact rational, so comparisons are equality. */
  private def refAuc(data: Seq[(Double, Boolean)]): Option[Double] = {
    val pos = data.collect { case (s, true) => s }
    val neg = data.collect { case (s, false) => s }
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val num2 = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      Some(num2.toDouble / (2.0 * pos.size * neg.size))
    }
  }

  private def runAuc(data: Seq[(Double, Boolean)]): (Long, Long, Option[Double]) = {
    import spark.implicits._
    val row = Eval.auc(data.toDF("score", "label"),
      col("score"), col("label")).head()
    (row.getLong(0), row.getLong(1),
      if (row.isNullAt(3)) None else Some(row.getDouble(3)))
  }

  test("auc matches brute-force pair counting, with and without ties") {
    val clean = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, true),
      (0.4, false), (0.2, false))
    assert(runAuc(clean)._3 == refAuc(clean))

    val tied = Seq((0.5, true), (0.5, false), (0.5, true), (0.3, false),
      (0.7, true), (0.7, false), (0.1, false))
    val (np, nn, got) = runAuc(tied)
    assert((np, nn) == (3L, 4L))
    assert(got == refAuc(tied))
  }

  test("auc extremes: perfect, inverted, all-tied, single-class, empty") {
    assert(runAuc(Seq((0.9, true), (0.8, true), (0.2, false)))._3 ==
      Some(1.0))
    assert(runAuc(Seq((0.1, true), (0.2, false)))._3 == Some(0.0))
    // every score identical: all pairs are half-ties -> 0.5 exactly
    assert(runAuc(Seq.fill(5)((0.3, true)) ++ Seq.fill(7)((0.3, false)))._3 ==
      Some(0.5))
    assert(runAuc(Seq((0.9, true), (0.8, true)))._3.isEmpty)
    assert(runAuc(Seq((0.9, false)))._3.isEmpty)
    val (np, nn, a) = runAuc(Seq.empty)
    assert((np, nn, a) == (0L, 0L, None))
  }

  test("auc randomized: equals pair counting under heavy ties, any bucketing") {
    val rnd = new scala.util.Random(42)
    val data = (0 until 400).map { _ =>
      (math.floor(rnd.nextDouble() * 10) / 10.0, rnd.nextBoolean())
    }
    val expect = refAuc(data)
    import spark.implicits._
    val df = data.toDF("score", "label").repartition(13)
    for (buckets <- Seq(0, 2, 7)) {
      val row = Eval.auc(df, col("score"), col("label"), buckets).head()
      assert(Some(row.getDouble(3)) == expect, s"buckets=$buckets")
    }
  }

  test("auc ignores null scores and labels") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.9, true), (null, true), (0.4, null), (0.2, false))
      .toDF("score", "label")
    val row = Eval.auc(df, col("score"), col("label")).head()
    assert((row.getLong(0), row.getLong(1)) == (1L, 1L))
    assert(row.getDouble(3) == 1.0)
  }

  test("aucByGroup matches per-group brute force; single-class groups null") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0 until 300).map { i =>
      val g = s"g${i % 4}"
      // group g3 is all-positive -> auc undefined there
      val y = if (g == "g3") true else rnd.nextBoolean()
      (g, math.floor(rnd.nextDouble() * 20) / 20.0, y)
    }
    val got = Eval.aucByGroup(data.toDF("g", "score", "label").repartition(11),
        Seq("g"), col("score"), col("label"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val expect = refAuc(rows.map(t => (t._2, t._3)))
      assert(got(g) == expect, s"group $g")
    }
    assert(got("g3").isEmpty)
  }

  test("calibrationBins: exact counts, edge score 1.0 in last bin, range filter") {
    import spark.implicits._
    val df = Seq((0.0, false), (0.04, false), (0.05, true), (0.5, true),
      (0.95, true), (1.0, true), (1.5, false), (-0.1, true))
      .toDF("score", "label")
    val got = Eval.calibrationBins(df, col("score"), col("label"), 20)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0) == ((2L, 0L)))      // 0.0, 0.04
    assert(got(1) == ((1L, 1L)))      // 0.05 opens bin 1
    assert(got(10) == ((1L, 1L)))     // 0.5
    assert(got(19) == ((2L, 2L)))     // 0.95 and the closed top edge 1.0
    assert(!got.contains(30) && got.values.map(_._1).sum == 6) // 1.5/-0.1 dropped
  }

  test("calibrationSummary: hand ECE/MCE/Brier, perfect scorer zeros") {
    import spark.implicits._
    // bin 1: (0.1,F),(0.1,T) -> gap 0.4 ; bin 9: (0.9,T),(0.9,T) -> 0.1
    val df = Seq((0.1, false), (0.1, true), (0.9, true), (0.9, true))
      .toDF("s", "y")
    val r = Eval.calibrationSummary(df, col("s"), col("y"), 10).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-15)  // (2*.4+2*.1)/4
    assert(math.abs(r.getDouble(3) - 0.4) < 1e-15)
    assert(math.abs(r.getDouble(4) - 0.21) < 1e-15)  // mean sq error
    val perfect = Seq((1.0, true), (0.0, false), (1.0, true)).toDF("s", "y")
    val p = Eval.calibrationSummary(perfect, col("s"), col("y"), 10).head()
    assert(p.getDouble(2) == 0.0 && p.getDouble(4) == 0.0)
  }

  test("prAtThresholds: exact counts and ratios at each operating point") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.7, false), (0.5, true), (0.3, false),
      (0.1, true)).toDF("score", "label")
    val got = Eval.prAtThresholds(df, col("score"), col("label"),
        Seq(0.5, 0.8, 0.05))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // τ=0.5: predicted {0.9,0.7,0.5} -> tp=2 fp=1 fn=1 tn=1
    assert(got(0.5) == ((2L, 1L, 1L, 1L)))
    // τ=0.8: predicted {0.9} -> tp=1 fp=0 fn=2 tn=2
    assert(got(0.8) == ((1L, 0L, 2L, 2L)))
    // τ=0.05: everything predicted positive
    assert(got(0.05) == ((3L, 2L, 0L, 0L)))

    val r08 = Eval.prAtThresholds(df, col("score"), col("label"), Seq(0.8))
      .head()
    assert(r08.getDouble(5) == 1.0)           // precision 1/1
    assert(r08.getDouble(6) == 1.0 / 3.0)     // recall 1/3
    assert(math.abs(r08.getDouble(7) - 0.5) < 1e-15) // f1 = 2pr/(p+r)
  }

  test("prAtThresholds: zero-denominator ratios are null, not 0 or NaN") {
    import spark.implicits._
    // τ above every score: no predicted positives -> precision null
    val df = Seq((0.2, false), (0.1, false)).toDF("score", "label")
    val r = Eval.prAtThresholds(df, col("score"), col("label"), Seq(0.5))
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((0L, 0L, 0L, 2L)))
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }

  test("classifierReport: hand-computed 3-class confusion") {
    import spark.implicits._
    // confusion (label, pred, count):
    //   a->a 4, a->b 1, b->b 3, b->c 2, c->c 1, c->a 1   (n = 12)
    val rows = Seq.fill(4)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(3)(("b", "b")) ++ Seq.fill(2)(("b", "c")) ++
      Seq(("c", "c"), ("c", "a"))
    val df = rows.toDF("label", "pred")
    val r = Eval.classifierReport(df, col("label"), col("pred")).head()
    val n = 12.0
    assert(r.getLong(0) == 12L && r.getLong(1) == 3L)
    val acc = 8.0 / n
    assert(math.abs(r.getDouble(2) - acc) < 1e-15)
    // marginals: t = (5,5,2); p = (5,4,3)
    val pe = (5.0 * 5 + 5.0 * 4 + 2.0 * 3) / (n * n)
    assert(math.abs(r.getDouble(3) - (acc - pe) / (1 - pe)) < 1e-15)
    val mccNum = 8.0 * 12 - (5.0 * 5 + 5.0 * 4 + 2.0 * 3)
    val mccDen = math.sqrt(144.0 - (25 + 16 + 9)) *
      math.sqrt(144.0 - (25 + 25 + 4))
    assert(math.abs(r.getDouble(4) - mccNum / mccDen) < 1e-15)
    val precs = Seq(4.0 / 5, 3.0 / 4, 1.0 / 3)
    val recs = Seq(4.0 / 5, 3.0 / 5, 1.0 / 2)
    val f1s = precs.zip(recs).map { case (p, c) => 2 * p * c / (p + c) }
    assert(math.abs(r.getDouble(5) - precs.sum / 3) < 1e-15)
    assert(math.abs(r.getDouble(6) - recs.sum / 3) < 1e-15)
    assert(math.abs(r.getDouble(7) - f1s.sum / 3) < 1e-15)
  }

  test("classifierReport: perfect and degenerate cases") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("l", "p")
    val rp = Eval.classifierReport(perfect, col("l"), col("p")).head()
    assert(rp.getDouble(2) == 1.0 && rp.getDouble(3) == 1.0 &&
      rp.getDouble(4) == 1.0 && rp.getDouble(7) == 1.0)
    // single class + constant prediction: kappa/mcc undefined -> NULL
    val const = Seq(("x", "x"), ("x", "x")).toDF("l", "p")
    val rc = Eval.classifierReport(const, col("l"), col("p")).head()
    assert(rc.getDouble(2) == 1.0 && rc.isNullAt(3) && rc.isNullAt(4))
    // a class never predicted: its precision contributes 0 to the macro
    val dropped = Seq(("a", "a"), ("b", "a")).toDF("l", "p")
    val rd = Eval.classifierReport(dropped, col("l"), col("p")).head()
    assert(math.abs(rd.getDouble(5) - 0.25) < 1e-15) // (1/2 + 0)/2
    // NULLs excluded
    val withNull = Seq(("a", "a"), (null, "a"), ("a", null)).toDF("l", "p")
    assert(Eval.classifierReport(withNull, col("l"), col("p"))
      .head().getLong(0) == 1L)
  }

  test("classifierReport is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map { _ =>
      (s"c${rnd.nextInt(4)}", s"c${rnd.nextInt(4)}") }
    val r1 = Eval.classifierReport(rows.toDF("l", "p").repartition(1),
      col("l"), col("p")).head()
    val r7 = Eval.classifierReport(rows.toDF("l", "p").repartition(7),
      col("l"), col("p")).head()
    assert(r1.toSeq == r7.toSeq)
  }

  // ---- Fleiss' kappa ----

  /** Independent reimplementation of the (variable-n) Fleiss formula. */
  private def refFleiss(ratings: Seq[(Int, String)])
      : Option[(Double, Double, Double)] = {
    val byItem = ratings.groupBy(_._1).filter(_._2.size >= 2)
    if (byItem.isEmpty) return None
    val pis = byItem.values.map { rs =>
      val ni = rs.size
      val agree = rs.groupBy(_._2).values.map(v =>
        v.size.toLong * (v.size - 1)).sum
      agree.toDouble / (ni.toLong * (ni - 1))
    }
    val pBar = pis.sum / pis.size
    val total = byItem.values.map(_.size.toLong).sum
    val catTotals = byItem.values.flatten.groupBy(_._2).values
      .map(_.size.toLong)
    val peBar = catTotals.map(c => c.toDouble * c).sum /
      (total.toDouble * total)
    Some((pBar, peBar, (pBar - peBar) / (1.0 - peBar)))
  }

  test("fleissKappa reproduces the Fleiss 1971 textbook table") {
    import spark.implicits._
    // 10 subjects x 14 raters x 5 categories (Fleiss 1971, the worked
    // example everywhere): kappa rounds to 0.210
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val ratings = table.zipWithIndex.flatMap { case (cs, i) =>
      cs.zipWithIndex.flatMap { case (c, j) =>
        Seq.fill(c)((i, s"cat$j")) } }
    val r = Eval.fleissKappa(ratings.toDF("item", "cat"),
      col("item"), col("cat")).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 140L &&
      r.getLong(2) == 5L && r.getLong(3) == 14L && r.getLong(4) == 14L)
    val Some((pb, pe, k)) = refFleiss(ratings)
    assert(math.abs(r.getDouble(5) - pb) < 1e-12)
    assert(math.abs(r.getDouble(6) - pe) < 1e-12)
    assert(math.abs(r.getDouble(7) - k) < 1e-12)
    assert(math.round(r.getDouble(7) * 1000) == 210L)
  }

  test("fleissKappa: variable raters, <2-vote items excluded, edge cases") {
    import spark.implicits._
    // item 3 has one rating -> excluded entirely (from marginals too)
    val mixed = Seq((1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "b"),
      (3, "zzz"))
    val r = Eval.fleissKappa(mixed.toDF("item", "cat"),
      col("item"), col("cat")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L)
    val Some((pb, pe, k)) = refFleiss(mixed)
    assert(math.abs(r.getDouble(5) - pb) < 1e-12)
    assert(math.abs(r.getDouble(7) - k) < 1e-12)

    // perfect agreement in ONE category: pe = 1 -> kappa NULL
    val onecat = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a"))
    assert(Eval.fleissKappa(onecat.toDF("item", "cat"),
      col("item"), col("cat")).head().isNullAt(7))

    // perfect agreement across DIFFERENT categories: kappa = 1 exactly
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
    assert(Eval.fleissKappa(perfect.toDF("item", "cat"),
      col("item"), col("cat")).head().getDouble(7) == 1.0)

    // nothing usable -> all-NULL stats row
    val tiny = Seq((1, "a")).toDF("item", "cat")
    val rt = Eval.fleissKappa(tiny, col("item"), col("cat")).head()
    assert(rt.getLong(0) == 0L && rt.isNullAt(7))
  }

  test("fleissKappa is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i % 40, s"c${rnd.nextInt(3)}") }
    val a = Eval.fleissKappa(rows.toDF("item", "cat").repartition(1),
      col("item"), col("cat")).head()
    val b = Eval.fleissKappa(rows.toDF("item", "cat").repartition(7),
      col("item"), col("cat")).head()
    assert(a.toSeq == b.toSeq)
  }

  // ---- BLEU ----

  test("bleu: clipping, brevity penalty, identity, zero overlap") {
    import spark.implicits._
    // the classic clipping example: candidate "the the the cat mat" vs
    // reference "the cat is on the mat":
    // p1 = (min(3,2)+1+1)/5 = 0.8; p2 = 1/4 ("the cat" only)
    val df = Seq((1L, "the cat is on the mat", "the the the cat mat"))
      .toDF("id", "ref", "cand")
    val r = Eval.bleu(df, "id", col("ref"), col("cand"), Nil, 2).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 6L && r.getLong(2) == 5L)
    assert(math.abs(r.getDouble(3) - 0.8) < 1e-15)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-15)
    val bp = math.exp(1.0 - 6.0 / 5.0)
    assert(math.abs(r.getDouble(5) - bp) < 1e-15)
    assert(math.abs(r.getDouble(6) -
      bp * math.exp((math.log(0.8) + math.log(0.25)) / 2)) < 1e-15)

    // identical candidate: every precision 1, bp 1, bleu 1
    val same = Seq((1L, "a b c d e", "a b c d e")).toDF("id", "ref", "cand")
    val rs = Eval.bleu(same, "id", col("ref"), col("cand")).head()
    (3 to 6).foreach(i => assert(rs.getDouble(i) == 1.0))
    assert(rs.getDouble(8) == 1.0)

    // zero n-gram overlap -> bleu 0 (not NULL: candidate HAS n-grams)
    val none = Seq((1L, "a b c d", "x y z w")).toDF("id", "ref", "cand")
    assert(Eval.bleu(none, "id", col("ref"), col("cand")).head()
      .getDouble(8) == 0.0)

    // candidate shorter than maxN: p4 NULL -> bleu NULL
    val short = Seq((1L, "a b c d e", "a b")).toDF("id", "ref", "cand")
    val rn = Eval.bleu(short, "id", col("ref"), col("cand")).head()
    assert(!rn.isNullAt(3) && rn.isNullAt(6) && rn.isNullAt(8))
  }

  test("bleu: corpus pooling and groups") {
    import spark.implicits._
    // corpus-level = pooled counts, NOT mean of sentence scores
    val df = Seq(
      (1L, "g1", "a b c", "a b c"),
      (2L, "g1", "d e f g", "d e x g"),
      (3L, "g2", "h i", "h i")).toDF("id", "grp", "ref", "cand")
    val g1 = Eval.bleu(df.where(col("grp") === "g1"), "id",
      col("ref"), col("cand"), Nil, 2).head()
    // unigrams: (3 + 3)/7 ; bigrams: (2 + 1)/5  ("d e" x, "x g" x, "e x" x
    //   -> of cand bigrams d-e? no: cand bigrams g1 = (a b)(b c)(d e)(e x)(x g):
    //   clipped (a b)(b c) + (d e) = 3
    assert(math.abs(g1.getDouble(3) - 6.0 / 7) < 1e-15)
    assert(math.abs(g1.getDouble(4) - 3.0 / 5) < 1e-15)
    val grouped = Eval.bleu(df, "id", col("ref"), col("cand"),
      Seq("grp"), 2).orderBy("grp").collect()
    assert(grouped.length == 2)
    assert(grouped(0).getString(0) == "g1" &&
      math.abs(grouped(0).getDouble(5) - g1.getDouble(4)) < 1e-15)
    assert(grouped(1).getString(0) == "g2" && grouped(1).getDouble(7) == 1.0)
  }

  // ---- chrF ----

  test("chrF: hand-computed orders, identity, disjoint, whitespace, beta") {
    import spark.implicits._
    // ref abcd vs cand abdc at maxN=2: P1=R1=1, P2=R2=1/3 -> P=R=2/3,
    // and with P=R the F-beta collapses to P for any beta
    val df = Seq((1L, "abcd", "abdc")).toDF("id", "ref", "cand")
    val r = Eval.chrF(df, "id", col("ref"), col("cand"), Nil, 2).head()
    assert(math.abs(r.getDouble(1) - 2.0 / 3) < 1e-15)
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-15)
    assert(math.abs(r.getDouble(3) - 2.0 / 3) < 1e-15)

    val same = Seq((1L, "hello world", "hello world")).toDF("id", "ref", "cand")
    assert(Eval.chrF(same, "id", col("ref"), col("cand")).head()
      .getDouble(3) == 1.0)
    val none = Seq((1L, "aaaa", "bbbb")).toDF("id", "ref", "cand")
    assert(Eval.chrF(none, "id", col("ref"), col("cand")).head()
      .getDouble(3) == 0.0)
    // whitespace is removed entirely before gramming: "a b c" vs "abc"
    // scores exactly like "abc" vs itself (0.5 here — only 3 of 6 fixed
    // orders have grams in a 3-char doc, the pinned corpus convention)
    val ws = Eval.chrF(Seq((1L, "a b\tc", "abc")).toDF("id", "ref", "cand"),
      "id", col("ref"), col("cand")).head()
    val wsRef = Eval.chrF(Seq((1L, "abc", "abc")).toDF("id", "ref", "cand"),
      "id", col("ref"), col("cand")).head()
    assert(ws.getDouble(3) == wsRef.getDouble(3) && ws.getDouble(3) == 0.5)
    // orders beyond the doc length still divide the macro average
    val short = Seq((1L, "ab", "ab")).toDF("id", "ref", "cand")
    val rs = Eval.chrF(short, "id", col("ref"), col("cand"), Nil, 4).head()
    assert(math.abs(rs.getDouble(3) - 0.5) < 1e-15)
    // beta = 2 weights recall: ref aaa vs cand a at maxN=1 ->
    // P=1, R=1/3, chrF2 = 5*(1/3)/(4 + 1/3) = 5/13
    val rb = Eval.chrF(Seq((1L, "aaa", "a")).toDF("id", "ref", "cand"),
      "id", col("ref"), col("cand"), Nil, 1).head()
    assert(math.abs(rb.getDouble(3) - 5.0 / 13) < 1e-15)
  }

  test("chrF groups pool corpus-level counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "g1", "abcd", "abcd"),
      (2L, "g1", "wxyz", "wxqz"),
      (3L, "g2", "mm", "mm")).toDF("id", "grp", "ref", "cand")
    val rows = Eval.chrF(df, "id", col("ref"), col("cand"), Seq("grp"), 2)
      .orderBy("grp").collect()
    assert(rows.length == 2)
    // g1 pooled n=1: clip 7 of 8; n=2: clip 4 of 6 ("wx","qz" miss... )
    //   cand bigrams: ab,bc,cd + wx,xq,qz -> clip ab,bc,cd,wx = 4
    val p = (7.0 / 8 + 4.0 / 6) / 2
    assert(math.abs(rows(0).getDouble(2) - p) < 1e-15) // symmetric: R = P
    assert(rows(1).getString(0) == "g2" && rows(1).getDouble(4) == 1.0)
  }

  // ---- distinct-n / self-BLEU diversity ----

  test("distinctN: hand counts, collapse detection, groups") {
    import spark.implicits._
    // "a b a b": unigrams 4 total 2 distinct; bigrams 3 total 2 distinct
    val df = Seq(("g", "a b a b")).toDF("src", "t")
    val rows = Eval.distinctN(df, col("t"), 2, Seq("src"))
      .orderBy("n").collect()
    assert(rows(0).getInt(1) == 1 && rows(0).getLong(2) == 4L &&
      rows(0).getLong(3) == 2L && rows(0).getDouble(4) == 0.5)
    assert(rows(1).getLong(2) == 3L && rows(1).getLong(3) == 2L)
    // a template-looping "generator" collapses; varied text does not
    val gen = (0 until 50).map(i => ("loop", "the same template again"))
    val var_ = (0 until 50).map(i => ("vary", s"doc $i token${i * 7} x$i"))
    val d2 = Eval.distinctN((gen ++ var_).toDF("src", "t"), col("t"), 2,
      Seq("src")).where(col("n") === 2).orderBy("src").collect()
    assert(d2(0).getDouble(4) <= 0.02 && d2(1).getDouble(4) > 0.5)
  }

  test("selfBleu: identical docs -> 1, disjoint docs -> 0, pool size") {
    import spark.implicits._
    val same = (0 until 10).map(i => (i.toLong, "g", "w1 w2 w3 w4 w5"))
      .toDF("id", "src", "t")
    val r1 = Eval.selfBleu(same, "id", col("t"), Seq("src"),
      poolSize = 4, maxN = 2).head()
    // 10 docs x 4 partners minus self-pairs (pool members meet
    // themselves): 40 - 4 = 36
    assert(r1.getLong(1) == 36L)
    assert(r1.getDouble(7) == 1.0) // identical docs: total mode collapse
    val disj = (0 until 10).map(i =>
      (i.toLong, "g", s"a$i b$i c$i d$i")).toDF("id", "src", "t")
    val r0 = Eval.selfBleu(disj, "id", col("t"), Seq("src"),
      poolSize = 4, maxN = 2).head()
    assert(r0.getDouble(7) == 0.0)
    // ungrouped path (global bottom-k pool, no window)
    val rg = Eval.selfBleu(same, "id", col("t"), Nil, poolSize = 3,
      maxN = 2).head()
    assert(rg.getLong(0) == 27L && rg.getDouble(6) == 1.0)
  }

  // ---- ROUGE-L ----

  /** Exponential-identity-free reference LCS over token sequences. */
  private def refLcs(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("token_lcs kernel == DP reference; edges") {
    import graft.expr.TextKernels
    import org.apache.spark.unsafe.types.UTF8String
    def lcs(a: String, b: String): Int =
      TextKernels.tokenLcs(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(lcs("a b c d", "a c d") == 3)
    assert(lcs("a b c", "x y z") == 0)
    assert(lcs("", "a b") == 0 && lcs("a", "") == 0 && lcs("  ", "a") == 0)
    assert(lcs("a b a b a", "b a b a b") == 4)
    // multi-space runs tokenize like single spaces
    assert(lcs("a  b\tc", "a b c") == 3)
    val rnd = new scala.util.Random(17)
    (0 until 80).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(20))(s"t${rnd.nextInt(5)}")
      val b = Seq.fill(rnd.nextInt(20))(s"t${rnd.nextInt(5)}")
      assert(lcs(a.mkString(" "), b.mkString(" ")) == refLcs(a, b),
        s"a=$a b=$b")
    }
  }

  test("rougeL: hand pair, empty candidate, groups, symmetry of P/R") {
    import spark.implicits._
    // ref "a b c d" vs cand "a c d x": LCS 3, P 3/4, R 3/4, F 3/4
    val df = Seq((1L, "a b c d", "a c d x")).toDF("id", "ref", "cand")
    val r = Eval.rougeL(df, "id", col("ref"), col("cand")).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 0.75 &&
      r.getDouble(4) == 0.75)
    // empty candidate: P = R = F = 0, not NULL/NaN
    val e = Eval.rougeL(Seq((1L, "a b", "")).toDF("id", "ref", "cand"),
      "id", col("ref"), col("cand")).head()
    assert(e.getLong(1) == 0L && e.getDouble(4) == 0.0)
    // swapping ref and cand swaps P and R, keeps F
    val asym = Seq((1L, "a b c d e", "a c")).toDF("id", "ref", "cand")
    val x = Eval.rougeL(asym, "id", col("ref"), col("cand")).head()
    val y = Eval.rougeL(asym, "id", col("cand"), col("ref")).head()
    assert(x.getDouble(2) == y.getDouble(3) &&
      x.getDouble(3) == y.getDouble(2) &&
      math.abs(x.getDouble(4) - y.getDouble(4)) < 1e-15)
    // groups macro-average per group
    val gdf = Seq((1L, "g1", "a b", "a b"), (2L, "g1", "c d", "c x"),
      (3L, "g2", "m", "m")).toDF("id", "grp", "ref", "cand")
    val rows = Eval.rougeL(gdf, "id", col("ref"), col("cand"), Seq("grp"))
      .orderBy("grp").collect()
    assert(rows(0).getLong(2) == 3L) // 2 + 1
    assert(math.abs(rows(0).getDouble(3) - 0.75) < 1e-15) // (1 + 0.5)/2
    assert(rows(1).getDouble(5) == 1.0)
  }

  // ---- metric stability replicates ----

  test("metricReplicates: deterministic membership, exact means") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (s"d$i", i.toDouble))
    val df = rows.toDF("id", "v")
    val got = Eval.metricReplicates(df, col("id"), col("v"), 8)
      .orderBy("replicate").collect()
    assert(got.length == 8)
    // recompute membership through the engine's own hash64 column
    val member = df.select(col("id"), col("v"),
        explode(org.apache.spark.sql.functions.sequence(lit(0), lit(7)))
          .as("r"))
      .withColumn("h", pmod(graft.api.functions.hash64(
        concat(col("id"), lit(":"), col("r"))), lit(2)))
      .where(col("h") === 0)
      .collect().map(r => (r.getInt(2), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { r =>
      val vs = member(r.getInt(0))
      assert(r.getLong(1) == vs.length.toLong)
      assert(math.abs(r.getDouble(2) - vs.sum / vs.length) < 1e-9)
    }
    // half-subsample: every replicate holds roughly half the corpus
    got.foreach(r => assert(r.getLong(1) > 60 && r.getLong(1) < 140))
    // partitioning-invariant, bit for bit
    val again = Eval.metricReplicates(df.repartition(7), col("id"),
      col("v"), 8).orderBy("replicate").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("majorityVote elects the modal answer, smallest on ties") {
    import spark.implicits._
    val df = Seq[(String, String)](
      // p1: b×2, a×1 -> b; p2: tie a×2 b×2 -> a (smallest)
      ("p1", "b"), ("p1", "b"), ("p1", "a"),
      ("p2", "b"), ("p2", "a"), ("p2", "b"), ("p2", "a"),
      // p3: single answer; p4: NULL answers refused work
      ("p3", "z"), ("p4", null), ("p4", "c"))
      .toDF("prompt", "ans")
    val got = Eval.majorityVote(df, Seq("prompt"), col("ans"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got("p1") == ("b", 2L, 3L, 2L, 2.0 / 3.0))
    assert(got("p2") == ("a", 2L, 4L, 2L, 0.5))
    assert(got("p3") == ("z", 1L, 1L, 1L, 1.0))
    assert(got("p4") == ("c", 1L, 1L, 1L, 1.0))
  }

  test("majorityVote weighs votes when asked") {
    import spark.implicits._
    val df = Seq(("p", "a", 1L), ("p", "a", 1L), ("p", "b", 5L))
      .toDF("prompt", "ans", "w")
    val r = Eval.majorityVote(df, Seq("prompt"), col("ans"),
      col("w")).collect()(0)
    assert(r.getString(1) == "b" && r.getLong(2) == 5L &&
      r.getLong(3) == 7L)
  }

  test("temperatureFit: the well-calibrated temperature wins") {
    import spark.implicits._
    // logits already match labels perfectly at T=1 (|l| large):
    // colder/hotter both lose NLL
    val df = (1 to 50).map(i =>
      (if (i % 2 == 0) 4.0 else -4.0, i % 2 == 0))
      .toDF("l", "y")
    val got = Eval.temperatureFit(df, col("l"), col("y"),
        Seq(0.5, 1.0, 4.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getDouble(r.fieldIndex("nll")), r.getBoolean(3))).toMap
    // NLL at T: softplus(-4/T) for every row
    def nllAt(t: Double) = math.log1p(math.exp(-4.0 / t))
    assert(math.abs(got(1.0)._1 - nllAt(1.0)) < 1e-12)
    assert(math.abs(got(4.0)._1 - nllAt(4.0)) < 1e-12)
    // confident correct logits: the COLDEST temperature wins
    assert(got(0.5)._2 && !got(1.0)._2 && !got(4.0)._2)
    assert(got(0.5)._1 < got(1.0)._1 && got(1.0)._1 < got(4.0)._1)
  }

  test("rankingMetrics: hand-worked NDCG/MRR, no-relevance refusal") {
    import spark.implicits._
    // q1: docs ranked by score desc = (d1 rel 0, d2 rel 2, d3 rel 1)
    val df = Seq(("q1", 1L, 9.0, 0L), ("q1", 2L, 8.0, 2L),
      ("q1", 3L, 7.0, 1L), ("q2", 4L, 5.0, 0L)).toDF("q", "id", "s", "rel")
    val got = Eval.rankingMetrics(df, Seq("q"), col("s"), col("rel"),
        col("id"), k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    val q1 = got("q1")
    val dcg = 3.0 / (math.log(3.0) / math.log(2.0)) + 1.0 / 2.0
    val idcg = 3.0 / 1.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(q1.getDouble(q1.fieldIndex("ndcg")) - dcg / idcg)
      < 1e-12)
    assert(q1.getDouble(q1.fieldIndex("mrr")) == 0.5)
    assert(q1.getDouble(q1.fieldIndex("recall_k")) == 1.0)
    // q2 has nothing relevant: refuses ndcg/mrr/recall
    assert(got("q2").isNullAt(got("q2").fieldIndex("ndcg")))
    assert(got("q2").isNullAt(got("q2").fieldIndex("mrr")))
  }

  test("rrfFuse: both rankers count, ranks are deterministic") {
    import spark.implicits._
    // A ranks: d1, d2, d3; B ranks: d3, d2, d1. Convexity of 1/x means
    // the split-rank docs (1st+3rd) fuse ABOVE the symmetric middle:
    // 1/61 + 1/63 > 2/62 — and d1/d3 tie exactly, so id breaks it
    val df = Seq(("q", 1L, 3.0, 1.0), ("q", 2L, 2.0, 2.0),
      ("q", 3L, 1.0, 3.0)).toDF("q", "id", "sa", "sb")
    val got = Eval.rrfFuse(df, Seq("q"), col("sa"), col("sb"),
        col("id"), k = 3)
      .collect().map(r => r.getLong(r.fieldIndex("fused_rank")) ->
        (r.getLong(1), r.getDouble(r.fieldIndex("rrf")))).toMap
    assert(got(1L)._1 == 1L && got(2L)._1 == 3L)
    assert(got(1L)._2 == got(2L)._2)
    assert(got(1L)._2 == 1.0 / 61 + 1.0 / 63)
    assert(got(3L)._1 == 2L)
    assert(got(3L)._2 == 2.0 / 62.0)
  }

  test("conditionalEntropy: deterministic stream predicts perfectly") {
    import spark.implicits._
    // ababab: every context determines its successor -> H(next|cur)=0,
    // contexts split evenly -> H(cur) = ln 2
    val det = Seq(Seq(1L, 2L, 1L, 2L, 1L)).toDF("ids")
    val d = Vocab.conditionalEntropy(det, col("ids")).collect()(0)
    assert(d.getLong(0) == 4L) // bigrams
    assert(d.getLong(1) == 2L && d.getLong(2) == 2L)
    assert(d.getDouble(3) == 0.0)
    assert(math.abs(d.getDouble(4) - math.log(2.0)) < 1e-12)
    // bigrams never cross documents
    val two = Seq(Seq(1L, 2L), Seq(3L, 4L)).toDF("ids")
    val t2 = Vocab.conditionalEntropy(two, col("ids")).collect()(0)
    assert(t2.getLong(0) == 2L) // (1,2) and (3,4) only — no (2,3)
    // single-token docs carry no bigram
    val one = Seq(Seq(1L, 2L), Seq(9L)).toDF("ids")
    assert(Vocab.conditionalEntropy(one, col("ids"))
      .collect()(0).getLong(0) == 1L)
  }

  test("powerAnalysis: hand-worked n_req, zero-effect refusal") {
    import spark.implicits._
    // g1: d = (2, 4) -> mean 3, var 2; n_req = ceil(7.848876...*2/9)
    // g2: d = (1, -1) -> mean 0: refused
    val df = Seq(("g1", 3.0, 1.0), ("g1", 9.0, 5.0),
      ("g2", 2.0, 1.0), ("g2", 0.0, 1.0))
      .toDF("g", "a", "b")
    val got = Eval.powerAnalysis(df, Seq("g"), col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert(g1.getDouble(g1.fieldIndex("mean_diff")) == 3.0)
    assert(g1.getDouble(g1.fieldIndex("var_diff")) == 2.0)
    val z = 1.959963984540054 + 0.8416212335729143
    // z² · 2/9 ≈ 1.744 -> n_req = 2; n = 2 meets it exactly
    assert(g1.getLong(g1.fieldIndex("n_req")) ==
      math.ceil(z * z * 2.0 / 9.0).toLong)
    assert(g1.getLong(g1.fieldIndex("n_req")) == 2L)
    assert(g1.getBoolean(g1.fieldIndex("enough")))
    assert(got("g2").isNullAt(got("g2").fieldIndex("n_req")))
  }

  test("pinballLoss: asymmetric penalties by hand") {
    import spark.implicits._
    // errors e = (+4, -2): at tau=0.25 -> (1, 1.5); at 0.75 -> (3, 0.5)
    val df = Seq(("g", 0.0, 4.0), ("g", 0.0, -2.0)).toDF("g", "p", "y")
    val got = Eval.pinballLoss(df, Seq("g"), col("p"), col("y"),
        Seq(0.25, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(got(0.25) == 1.25)
    assert(got(0.75) == 1.75)
  }

  test("renyiEfficiency: uniform ids score 1, skew scores below") {
    import spark.implicits._
    // 4 ids used equally: H_a = ln 4 for every a -> efficiency 1
    val uni = Seq(Seq(0L, 1L), Seq(2L, 3L)).toDF("ids")
    val u = Vocab.renyiEfficiency(uni, col("ids"), 2.5).collect()(0)
    assert(u.getLong(0) == 4L && u.getLong(1) == 4L)
    assert(math.abs(u.getDouble(2) - math.log(4.0)) < 1e-12)
    assert(math.abs(u.getDouble(3) - math.log(4.0)) < 1e-12)
    assert(math.abs(u.getDouble(4) - 1.0) < 1e-12)
    // skewed: 3x id 0, 1x id 1 -> H_2.5 = ln(0.75^2.5 + 0.25^2.5)/-1.5
    val skew = Seq(Seq(0L, 0L, 0L, 1L)).toDF("ids")
    val s = Vocab.renyiEfficiency(skew, col("ids"), 2.5).collect()(0)
    val h = math.log(math.pow(0.75, 2.5) + math.pow(0.25, 2.5)) / -1.5
    assert(math.abs(s.getDouble(2) - h) < 1e-12)
    assert(s.getDouble(4) < 1.0)
  }

  test("mcnemar: contingency by hand, no-discordance refusal") {
    import spark.implicits._
    val df = Seq(("g", true, true), ("g", true, false),
      ("g", true, false), ("g", true, false), ("g", false, true),
      ("g", false, false), ("h", true, true), ("h", false, false))
      .toDF("grp", "a", "b")
    val got = Eval.mcnemar(df, Seq("grp"), col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert((g.getLong(g.fieldIndex("n00")), g.getLong(g.fieldIndex("n01")),
      g.getLong(g.fieldIndex("n10")), g.getLong(g.fieldIndex("n11")))
      == (1L, 1L, 3L, 1L))
    // (|1-3| - 1)^2 / 4 = 0.25
    assert(g.getDouble(g.fieldIndex("chi2")) == 0.25)
    // h has no discordant pairs: nothing to test
    assert(got("h").isNullAt(got("h").fieldIndex("chi2")))
  }

  test("conformalThreshold: k-th order statistic, small groups refuse") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("g1", i.toDouble)) ++
      Seq(("g2", 1.0), ("g2", 2.0))).toDF("g", "s")
    val got = Eval.conformalThreshold(df, Seq("g"), col("s"),
        col("s"), Seq(0.25, 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r).toMap
    // g1 n=10: k = ceil(11*0.75) = 9 -> qhat 9, coverage 0.9
    val a = got(("g1", 0.25))
    assert(a.getLong(a.fieldIndex("n")) == 10L)
    assert(a.getLong(a.fieldIndex("k_rank")) == 9L)
    assert(a.getDouble(a.fieldIndex("qhat")) == 9.0)
    assert(a.getDouble(a.fieldIndex("coverage")) == 0.9)
    // alpha = 0.5: k = ceil(11*0.5) = 6
    val b = got(("g1", 0.5))
    assert(b.getDouble(b.fieldIndex("qhat")) == 6.0)
    assert(b.getDouble(b.fieldIndex("coverage")) == 0.6)
    // g2 n=2 at alpha=0.25: k = 3 > n -> refused
    val c = got(("g2", 0.25))
    assert(c.getLong(c.fieldIndex("k_rank")) == 3L)
    assert(c.isNullAt(c.fieldIndex("qhat")))
  }

  test("riskCoverage: hand-worked curve and AURC") {
    import spark.implicits._
    // confidence-desc order: errors 0, 1, 0, 1
    val df = Seq(("g", 4.0, false, 1L), ("g", 3.0, true, 2L),
      ("g", 2.0, false, 3L), ("g", 1.0, true, 4L))
      .toDF("g", "conf", "err", "id")
    val r = Eval.riskCoverage(df, Seq("g"), col("conf"), col("err"),
      col("id")).collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 4L)
    assert(r.getLong(r.fieldIndex("n_err")) == 2L)
    assert(math.abs(r.getDouble(r.fieldIndex("aurc")) - 1.0 / 3.0)
      < 1e-15)
    assert(r.getDouble(r.fieldIndex("risk25")) == 0.0)
    assert(r.getDouble(r.fieldIndex("risk50")) == 0.5)
    assert(math.abs(r.getDouble(r.fieldIndex("risk75")) - 1.0 / 3.0)
      < 1e-15)
    assert(r.getDouble(r.fieldIndex("risk100")) == 0.5)
  }

  test("bestOfN: unbiased expected-max curve from order statistics") {
    import spark.implicits._
    val df = Seq(("p", 1.0), ("p", 3.0), ("p", 5.0), ("p", 7.0))
      .toDF("prompt", "r")
    val got = Eval.bestOfN(df, Seq("prompt"), col("r"), Seq(1, 2, 4, 5))
      .collect().map(r => r.getLong(r.fieldIndex("n_subset")) ->
        r).toMap
    // n=1: the plain mean
    val n1 = got(1L)
    assert(n1.getDouble(n1.fieldIndex("num")) == 16.0)
    assert(n1.getLong(n1.fieldIndex("den")) == 4L)
    assert(n1.getDouble(n1.fieldIndex("emax")) == 4.0)
    // n=2: weights C(i-1,1) = 0,1,2,3 -> 34 / C(4,2)=6
    val n2 = got(2L)
    assert(n2.getDouble(n2.fieldIndex("num")) == 34.0)
    assert(n2.getLong(n2.fieldIndex("den")) == 6L)
    assert(math.abs(n2.getDouble(n2.fieldIndex("emax")) - 34.0 / 6)
      < 1e-15)
    // n=N: exactly the max
    val n4 = got(4L)
    assert(n4.getDouble(n4.fieldIndex("emax")) == 7.0)
    // n > N refuses
    assert(got(5L).isNullAt(n1.fieldIndex("emax")))
  }

  test("bestOfN is monotone in n and partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 12).map(i => ("p", (i * 37 % 11).toDouble))
      .toDF("prompt", "r")
    val e = Eval.bestOfN(df, Seq("prompt"), col("r"), Seq(1, 2, 4, 8))
      .orderBy("n_subset").collect()
      .map(r => r.getDouble(r.fieldIndex("emax")))
    assert(e.sliding(2).forall(p => p(0) <= p(1)))
    val again = Eval.bestOfN(df.repartition(7), Seq("prompt"),
        col("r"), Seq(1, 2, 4, 8))
      .orderBy("n_subset").collect()
      .map(r => r.getDouble(r.fieldIndex("emax")))
    assert(e.sameElements(again))
  }

  test("wilsonInterval: hand-worked band, clamps at the edges") {
    import spark.implicits._
    // g1: s=0 of n=4 at z=2 -> center 0.25, half 0.25 -> [0, 0.5] exact
    // g2: s=3 of n=4
    val df = Seq(("g1", 0), ("g1", 0), ("g1", 0), ("g1", 0),
      ("g2", 1), ("g2", 1), ("g2", 1), ("g2", 0))
      .toDF("g", "ok")
    val got = Eval.wilsonInterval(df, Seq("g"), col("ok"), z = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got("g1") == (4L, 0L, 0.0, 0.0, 0.5))
    val (_, _, p, lo, hi) = got("g2")
    assert(p == 0.75)
    val half = math.sqrt(0.75 * 0.25 / 4 + 4.0 / 64)
    assert(math.abs(lo - (0.625 - half)) < 1e-15)
    assert(math.abs(hi - (0.625 + half)) < 1e-15)
  }

  test("passAtK: exact binomial products and the boundary cases") {
    import spark.implicits._
    // problem q1: 4 attempts, 2 pass; q2: 3 attempts, 0 pass;
    // q3: 2 attempts, 2 pass
    val df = Seq(("q1", 1), ("q1", 0), ("q1", 1), ("q1", 0),
      ("q2", 0), ("q2", 0), ("q2", 0), ("q3", 1), ("q3", 1))
      .toDF("prob", "ok")
    val got = Eval.passAtK(df, Seq("prob"), col("ok"), Seq(2, 5))
      .collect().map(r => (r.getString(0), r.getLong(3)) -> r).toMap
    val q1 = got(("q1", 2L))
    // C(2,2)/C(4,2): num = 2*1, den = 4*3, pass = 1 - 1/6
    assert(q1.getLong(q1.fieldIndex("num")) == 2L)
    assert(q1.getLong(q1.fieldIndex("den")) == 12L)
    assert(math.abs(q1.getDouble(q1.fieldIndex("pass_at_k"))
      - 5.0 / 6.0) < 1e-15)
    // zero successes -> 0; all successes -> 1
    val q2 = got(("q2", 2L))
    assert(q2.getDouble(q2.fieldIndex("pass_at_k")) == 0.0)
    val q3 = got(("q3", 2L))
    assert(q3.getLong(q3.fieldIndex("num")) == 0L)
    assert(q3.getDouble(q3.fieldIndex("pass_at_k")) == 1.0)
    // k > n refuses the estimate
    assert(got(("q1", 5L)).isNullAt(q1.fieldIndex("pass_at_k")))
    assert(got(("q3", 5L)).isNullAt(q1.fieldIndex("num")))
  }
  /** Plain-Scala coincidence-matrix reference: full pairwise definition
    * (Krippendorff 2011), no shared algebra with the op. */
  private def refAlpha(ratings: Seq[(Int, String)]): Option[Double] = {
    val byItem = ratings.groupBy(_._1).view.mapValues(_.map(_._2))
      .filter(_._2.size >= 2).toMap
    if (byItem.isEmpty) return None
    val n = byItem.values.map(_.size).sum.toDouble
    var agree = 0.0
    for ((_, vs) <- byItem) {
      val ni = vs.size
      for (c <- vs.distinct) {
        val nc = vs.count(_ == c)
        agree += nc.toDouble * (nc - 1) / (ni - 1)
      }
    }
    val dO = (n - agree) / n
    val marg = byItem.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).values.toSeq
    val dE = (n * n - marg.map(m => m.toDouble * m).sum) / (n * (n - 1))
    if (dE > 0) Some(1.0 - dO / dE) else None
  }

  test("krippendorffAlpha: hand-worked sparse example") {
    import spark.implicits._
    // A: x,x agree; B: x,y disagree; C: y singleton (excluded)
    val df = Seq((1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "y"))
      .toDF("item", "cat")
    val r = Eval.krippendorffAlpha(df, col("item"), col("cat")).head()
    assert(r.getLong(r.fieldIndex("n_items")) == 2L)
    assert(r.getLong(r.fieldIndex("n_pairable")) == 4L)
    assert(r.getLong(r.fieldIndex("n_categories")) == 2L)
    assert(r.getDouble(r.fieldIndex("d_o")) == 0.5)
    assert(r.getDouble(r.fieldIndex("d_e")) == 0.5)
    assert(r.getDouble(r.fieldIndex("alpha")) == 0.0)
  }

  test("krippendorffAlpha: perfect agreement -> 1; one category -> NULL; " +
      "singletons only -> NULL") {
    import spark.implicits._
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"))
      .toDF("item", "cat")
    val p = Eval.krippendorffAlpha(perfect, col("item"), col("cat")).head()
    assert(p.getDouble(p.fieldIndex("alpha")) == 1.0)
    val mono = Seq((1, "x"), (1, "x"), (2, "x"), (2, "x"))
      .toDF("item", "cat")
    val m = Eval.krippendorffAlpha(mono, col("item"), col("cat")).head()
    assert(m.isNullAt(m.fieldIndex("alpha"))) // d_e = 0
    val singles = Seq((1, "x"), (2, "y")).toDF("item", "cat")
    val s0 = Eval.krippendorffAlpha(singles, col("item"), col("cat")).head()
    assert(s0.getLong(s0.fieldIndex("n_items")) == 0L)
    assert(s0.isNullAt(s0.fieldIndex("alpha")))
  }

  test("krippendorffAlpha == coincidence-matrix reference on a " +
      "hash-generated sparse design, partition-invariant") {
    import spark.implicits._
    // 40 items, 0-5 raters each, 4 categories -- deterministic LCG
    var st = 12345L
    def nxt(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st >>> 33 }
    val rows = for {
      i <- 0 until 40
      r <- 0 until (nxt() % 6).toInt
    } yield (i, "c" + (nxt() % 4))
    val want = refAlpha(rows).get
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("item", "cat").repartition(parts)
      val got = Eval.krippendorffAlpha(df, col("item"), col("cat")).head()
      assert(math.abs(got.getDouble(got.fieldIndex("alpha")) - want) < 1e-12)
    }
  }
  test("cuped: hand-worked pooled theta, adjusted means and variances") {
    import spark.implicits._
    // perfectly correlated x = 2y within each arm -> theta = 0.5 pooled,
    // var_adj collapses to 0
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0))
      .map { case (g, y) => (g, y, 2.0 * y) }.toDF("arm", "y", "x")
    val got = Eval.cuped(df, Seq("arm"), col("y"), col("x"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getDouble(a.fieldIndex("theta")) == 0.5)
    assert(a.getDouble(a.fieldIndex("mean_y")) == 2.0)
    // mean_adj = mean_y - theta*(mean_x_g - pooled_xbar) = 2 - .5*(4-6) = 3
    assert(a.getDouble(a.fieldIndex("mean_adj")) == 3.0)
    assert(a.getDouble(a.fieldIndex("var_y")) == 2.0)
    assert(math.abs(a.getDouble(a.fieldIndex("var_adj"))) < 1e-12)
    assert(math.abs(a.getDouble(a.fieldIndex("var_reduction")) - 1.0)
      < 1e-12)
    // arm means stay comparable: adjustment shifts both arms by the
    // SAME pooled rule (b: 4 - .5*(8-6) = 3)
    val b = got("b")
    assert(b.getDouble(b.fieldIndex("mean_adj")) == 3.0)
  }

  test("cuped: uncorrelated covariate leaves variance ~unchanged; " +
      "degenerate var(X) = 0 yields NULL fit") {
    import spark.implicits._
    // x alternates independently of y
    val rows = (0 until 64).map(i =>
      ("g", (i % 8).toDouble, (i % 2).toDouble))
    val r = Eval.cuped(rows.toDF("arm", "y", "x"), Seq("arm"),
      col("y"), col("x")).head()
    // theta finite, reduction tiny
    assert(math.abs(r.getDouble(r.fieldIndex("var_reduction"))) < 0.05)
    val const = Seq(("g", 1.0, 5.0), ("g", 2.0, 5.0))
      .toDF("arm", "y", "x")
    val c = Eval.cuped(const, Seq("arm"), col("y"), col("x")).head()
    assert(c.isNullAt(c.fieldIndex("theta"))
      || c.getDouble(c.fieldIndex("theta")).isNaN)
  }
  /** Brute max-min isotonic reference: iso_i = max_{j<=i} min_{k>=i}
    * pooled-rate(j..k) over non-empty bins — no shared algorithm with
    * the op's PAV sweep. */
  private def refIso(cells: Seq[(Long, Long)]): Seq[Double] =
    cells.indices.map { i =>
      (0 to i).map { j =>
        (i until cells.length).map { k =>
          val span = cells.slice(j, k + 1)
          span.map(_._2).sum.toDouble / span.map(_._1).sum
        }.min
      }.max
    }

  test("isotonicFit: violators pool weighted; monotone input unchanged") {
    import spark.implicits._
    // two bins (0.6 at n=10, 0.2 at n=10) -> both pooled to 0.4
    val rows = (0 until 10).map(i => (0.1, i < 6)) ++
      (0 until 10).map(i => (0.9, i < 2))
    val got = Eval.isotonicFit(rows.toDF("s", "y"), col("s"), col("y"),
        bins = 2)
      .orderBy("bin").collect()
    assert(got.map(_.getDouble(4)).toSeq == Seq(0.4, 0.4))
    assert(got.map(_.getDouble(3)).toSeq == Seq(0.6, 0.2))
    val mono = (0 until 10).map(i => (0.1, i < 2)) ++
      (0 until 10).map(i => (0.9, i < 8))
    val m = Eval.isotonicFit(mono.toDF("s", "y"), col("s"), col("y"),
        bins = 2)
      .orderBy("bin").collect()
    assert(m.map(_.getDouble(4)).toSeq == Seq(0.2, 0.8))
  }

  test("isotonicFit == max-min characterization on a hash-generated " +
      "profile; out-of-range scores refused") {
    import spark.implicits._
    var st = 987654321L
    def nxt(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st >>> 33 }
    val rows = (0 until 400).map { _ =>
      val b = (nxt() % 8).toInt
      ((b + 0.5) / 8.0, nxt() % 100 < (17 * ((b * 3) % 7) + 5) % 95)
    }
    val got = Eval.isotonicFit(rows.toDF("s", "y"), col("s"), col("y"),
        bins = 8)
      .orderBy("bin").collect()
    val cells = got.map(r => (r.getLong(1), r.getLong(2))).toSeq
    val want = refIso(cells)
    got.map(_.getDouble(4)).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12)
    }
    // iso is non-decreasing
    assert(got.map(_.getDouble(4)).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
    val bad = Seq((1.5, true), (-0.1, false), (0.5, true))
      .toDF("s", "y")
    val b = Eval.isotonicFit(bad, col("s"), col("y"), bins = 4)
      .collect()
    assert(b.length == 1 && b.head.getLong(1) == 1L)
  }
  test("postStratify: hand-worked reweighting, variance, guards") {
    import spark.implicits._
    // stratum a: {1, 3} (mean 2, s2 2); b: {10, 14} (mean 12, s2 8)
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0))
      .toDF("h", "y")
    val got = Eval.postStratify(df, col("h"), col("y"),
        Seq("a" -> 0.75, "b" -> 0.25))
      .collect().map(r => r.getString(0) -> r).toMap
    val o = got("__overall")
    // mean = .75*2 + .25*12 = 4.5; var = .75^2*(2/2) + .25^2*(8/2)
    assert(o.getDouble(o.fieldIndex("mean")) == 4.5)
    assert(math.abs(o.getDouble(o.fieldIndex("var_mean"))
      - (0.5625 * 1.0 + 0.0625 * 4.0)) < 1e-14)
    assert(got("a").getLong(1) == 2L)
    // unknown stratum in data -> fail fast
    intercept[IllegalArgumentException] {
      Eval.postStratify(df, col("h"), col("y"), Seq("a" -> 1.0))
        .collect()
    }
    // weighted stratum absent from data -> overall undefined
    val miss = Eval.postStratify(df, col("h"), col("y"),
        Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(miss("c").getLong(1) == 0L)
    assert(miss("__overall").isNullAt(
      miss("__overall").fieldIndex("mean")))
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Eval.postStratify(df, col("h"), col("y"), Seq("a" -> 0.5))
    }
  }
  test("aucDeLong: placements match a brute reference; mean placement " +
      "IS the exact AUC; degenerate inputs yield NULLs") {
    import spark.implicits._
    var st = 24680L
    def nxt(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st >>> 33 }
    val data = (0 until 300).map { _ =>
      val y = nxt() % 3 == 0
      val s = ((nxt() % 40) + (if (y) 8 else 0)).toDouble
      (s, y)
    }
    // brute placements
    val pos = data.filter(_._2).map(_._1); val neg = data.filterNot(_._2).map(_._1)
    def v10(x: Double) = (neg.count(_ < x) + 0.5 * neg.count(_ == x)) / neg.size
    def v01(x: Double) = (pos.count(_ > x) + 0.5 * pos.count(_ == x)) / pos.size
    val m10 = pos.map(v10); val m01 = neg.map(v01)
    def svar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val wantAuc = m10.sum / m10.size
    val wantSe = math.sqrt(svar(m10) / pos.size + svar(m01) / neg.size)
    val r = Eval.aucDeLong(data.toDF("s", "y"), col("s"), col("y")).head()
    assert(math.abs(r.getDouble(r.fieldIndex("auc")) - wantAuc) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("se")) - wantSe) < 1e-12)
    // mean placement == the exact pair-counting AUC
    val exact = Eval.auc(data.toDF("s", "y"), col("s"), col("y")).head()
    assert(math.abs(r.getDouble(r.fieldIndex("auc"))
      - exact.getDouble(exact.fieldIndex("auc"))) < 1e-12)
    // bounds bracket the estimate and clip to [0, 1]
    assert(r.getDouble(r.fieldIndex("lo95")) <=
      r.getDouble(r.fieldIndex("auc")))
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "y")
    val p1 = Eval.aucDeLong(sep, col("s"), col("y")).head()
    assert(p1.getDouble(p1.fieldIndex("auc")) == 1.0)
    assert(p1.getDouble(p1.fieldIndex("hi95")) == 1.0) // clipped
    val mono = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    val m = Eval.aucDeLong(mono, col("s"), col("y")).head()
    assert(m.isNullAt(m.fieldIndex("auc")))
  }
  test("effectiveSampleSize: Kish formula, degeneracies, refusals") {
    import spark.implicits._
    // equal weights -> ess = n, efficiency 1
    val eq = Seq(("g", 2.0), ("g", 2.0), ("g", 2.0)).toDF("g", "w")
    val e = Eval.effectiveSampleSize(eq, Seq("g"), col("w")).head()
    assert(e.getDouble(e.fieldIndex("ess")) == 3.0)
    assert(e.getDouble(e.fieldIndex("efficiency")) == 1.0)
    // one dominant weight -> ess ~ 1
    val dom = Seq(("g", 1000.0), ("g", 1.0), ("g", 1.0)).toDF("g", "w")
    val d = Eval.effectiveSampleSize(dom, Seq("g"), col("w")).head()
    assert(d.getDouble(d.fieldIndex("ess")) < 1.01)
    // hand: w = {1, 3} -> (4)^2 / 10 = 1.6
    val h = Eval.effectiveSampleSize(
      Seq(("g", 1.0), ("g", 3.0)).toDF("g", "w"), Seq("g"), col("w"))
      .head()
    assert(h.getDouble(h.fieldIndex("ess")) == 1.6)
    // all-zero weights -> ess NULL (no evidence, not division error)
    val z = Eval.effectiveSampleSize(
      Seq(("g", 0.0), ("g", 0.0)).toDF("g", "w"), Seq("g"), col("w"))
      .head()
    assert(z.isNullAt(z.fieldIndex("ess")))
    // negative / NaN / infinite weights are refused work
    val bad = Seq(("g", 1.0), ("g", -2.0), ("g", Double.NaN),
      ("g", Double.PositiveInfinity)).toDF("g", "w")
    val b = Eval.effectiveSampleSize(bad, Seq("g"), col("w")).head()
    assert(b.getLong(b.fieldIndex("n")) == 1L)
  }

  test("mantelHaenszel: hand-worked two-strata example; guards") {
    import spark.implicits._
    // stratum s1: a=8,b=2,c=5,d=5; stratum s2: a=3,b=7,c=1,d=9
    def mk(s: String, arm: Boolean, suc: Boolean, n: Int) =
      Seq.fill(n)((s, arm, suc))
    val df = (mk("s1", true, true, 8) ++ mk("s1", true, false, 2)
      ++ mk("s1", false, true, 5) ++ mk("s1", false, false, 5)
      ++ mk("s2", true, true, 3) ++ mk("s2", true, false, 7)
      ++ mk("s2", false, true, 1) ++ mk("s2", false, false, 9))
      .toDF("s", "a", "y")
    val r = Eval.mantelHaenszel(df, Seq("s"), col("a"), col("y"))
      .head()
    // OR_MH = (8*5/20 + 3*9/20) / (2*5/20 + 7*1/20) = 3.35/0.85
    assert(math.abs(r.getDouble(r.fieldIndex("or_mh")) - 3.35 / 0.85)
      < 1e-12)
    // E = 10*13/20 + 10*4/20 = 8.5; V = 10*10*13*7/(400*19)
    //   + 10*10*4*16/(400*19)
    val v = (10.0 * 10 * 13 * 7 + 10.0 * 10 * 4 * 16) / (400 * 19)
    assert(math.abs(r.getDouble(r.fieldIndex("expected_a")) - 8.5)
      < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("var_a")) - v) < 1e-12)
    val chi = math.pow(11 - 8.5, 2) / v
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) - chi) < 1e-12)
    // single-member strata: contribute 0 variance, no ANSI error
    val tiny = Seq(("x", true, true), ("y", false, false))
      .toDF("s", "a", "y")
    val rt = Eval.mantelHaenszel(tiny, Seq("s"), col("a"), col("y"))
      .head()
    assert(rt.getDouble(rt.fieldIndex("var_a")) == 0.0)
    assert(rt.isNullAt(rt.fieldIndex("chi2")))
  }

  test("bhAdjust: hand-worked step-up, tie handling, clipping, " +
      "NULL pass-through, partition-invariance") {
    import spark.implicits._
    // classic: p = (.01, .02, .03, .04, .05) at n=5 ->
    // raw = (.05, .05, .05, .05, .05) -> adj all .05
    val ps = Seq(0.01, 0.02, 0.03, 0.04, 0.05).map(Tuple1(_))
      .toDF("p")
    val a1 = Eval.bhAdjust(ps, col("p")).orderBy("p").collect()
      .map(r => r.getDouble(r.fieldIndex("p_adj")))
    a1.foreach(v => assert(math.abs(v - 0.05) < 1e-12))
    // p = (.01, .4, .9): raw = (.03, .6, .9) -> monotone, no change
    val a2 = Eval.bhAdjust(Seq(0.01, 0.4, 0.9).map(Tuple1(_)).toDF("p"),
        col("p")).orderBy("p").collect()
      .map(r => r.getDouble(r.fieldIndex("p_adj")))
    assert(math.abs(a2(0) - 0.03) < 1e-12)
    assert(math.abs(a2(1) - 0.6) < 1e-12)
    assert(math.abs(a2(2) - 0.9) < 1e-12)
    // ties share the largest rank; clip at 1
    val a3 = Eval.bhAdjust(
        Seq(Some(0.5), Some(0.5), Some(0.9), None).map(Tuple1(_))
          .toDF("p"), col("p"))
      .orderBy(col("p").asc_nulls_last).collect()
    assert(math.abs(a3(0).getDouble(1) - 0.75) < 1e-12) // .5*3/2
    assert(a3(2).getDouble(1) == 0.9)
    assert(a3(3).isNullAt(1))
    val big = (1 to 500).map(i => Tuple1((i * 37 % 101) / 101.0 + 0.001))
      .toDF("p")
    def run(parts: Int) = Eval.bhAdjust(big.repartition(parts), col("p"))
      .orderBy("p").collect().map(_.toString).toSeq
    assert(run(1) == run(9))
  }

  test("cochranQ: hand-worked 3-system example; k=2 reduces to " +
      "uncorrected McNemar; incomplete design refused") {
    import spark.implicits._
    // items 1..4, systems a/b/c:
    // R = (2, 1, 2, 1); C = (4, 1, 1); N = 6
    val df = Seq(
      (1, "a", true), (1, "b", true), (1, "c", false),
      (2, "a", true), (2, "b", false), (2, "c", false),
      (3, "a", true), (3, "b", false), (3, "c", true),
      (4, "a", true), (4, "b", false), (4, "c", false))
      .toDF("i", "s", "ok")
    val r = Eval.cochranQ(df, col("i"), col("s"), col("ok")).head()
    val num = math.pow(4 - 2.0, 2) + math.pow(1 - 2.0, 2) +
      math.pow(1 - 2.0, 2)
    val den = 3.0 * 6 - (4 + 1 + 4 + 1)
    val qWant = 3 * 2 * num / den
    assert(r.getLong(r.fieldIndex("n_items")) == 4L)
    assert(r.getLong(r.fieldIndex("k")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("q")) - qWant) < 1e-12)
    // k=2: Q == McNemar's uncorrected (b-c)^2/(b+c)
    val two = (1 to 40).map(i =>
      (i, "x", i % 3 == 0)) ++ (1 to 40).map(i => (i, "y", i % 5 == 0))
    val rq = Eval.cochranQ(two.toDF("i", "s", "ok"), col("i"),
      col("s"), col("ok")).head()
    val b = (1 to 40).count(i => i % 3 == 0 && i % 5 != 0)
    val c = (1 to 40).count(i => i % 3 != 0 && i % 5 == 0)
    assert(math.abs(rq.getDouble(rq.fieldIndex("q"))
      - math.pow(b - c, 2).toDouble / (b + c)) < 1e-12)
    intercept[IllegalArgumentException] {
      Eval.cochranQ(df.where(!(col("i") === 1 && col("s") === "c")),
        col("i"), col("s"), col("ok"))
    }
  }

  test("friedmanTest: tie-free matches the classic 12/(nk(k+1)) form; " +
      "ties go through midranks; W in [0,1]; guards") {
    import spark.implicits._
    // 3 items x 3 systems, scores rank systems differently
    val df = Seq(
      (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
      (2, "a", 1.0), (2, "b", 3.0), (2, "c", 2.0),
      (3, "a", 1.0), (3, "b", 2.0), (3, "c", 3.0))
      .toDF("i", "s", "v")
    val r = Eval.friedmanTest(df, col("i"), col("s"), col("v")).head()
    // ranks: a=(1,1,1) R=3; b=(2,3,2) R=7; c=(3,2,3) R=8; center 6
    val chiWant = 12.0 / (3 * 3 * 4) * (9 + 1 + 4)
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) - chiWant) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("w"))
      - chiWant / (3 * 2)) < 1e-12)
    // perfect agreement: W == 1
    val perfect = (1 to 10).flatMap(i => Seq((i, "a", 1.0),
      (i, "b", 2.0), (i, "c", 3.0))).toDF("i", "s", "v")
    val rp = Eval.friedmanTest(perfect, col("i"), col("s"), col("v"))
      .head()
    assert(math.abs(rp.getDouble(rp.fieldIndex("w")) - 1.0) < 1e-12)
    // all-tied items: denominator 0 -> NULL
    val flat = (1 to 5).flatMap(i => Seq((i, "a", 1.0), (i, "b", 1.0)))
      .toDF("i", "s", "v")
    val rf = Eval.friedmanTest(flat, col("i"), col("s"), col("v"))
      .head()
    assert(rf.isNullAt(rf.fieldIndex("chi2")))
    // ties: midranks (hand): item ranks (1.5, 1.5, 3) etc.
    val tied = Seq(
      (1, "a", 1.0), (1, "b", 1.0), (1, "c", 2.0),
      (2, "a", 1.0), (2, "b", 2.0), (2, "c", 3.0))
      .toDF("i", "s", "v")
    val rt = Eval.friedmanTest(tied, col("i"), col("s"), col("v"))
      .head()
    // R: a=1.5+1=2.5, b=1.5+2=3.5, c=3+3=6; center 4; num=2.25+0.25+4
    // sum r^2 = (1.5^2+1.5^2+9) + (1+4+9) = 13.5+14 = 27.5
    // den = 27.5 - 2*3*16/4 = 3.5; chi2 = (k-1)*num/den
    val chiT = 2 * (2.25 + 0.25 + 4.0) / (27.5 - 2 * 3 * 16 / 4.0)
    assert(math.abs(rt.getDouble(rt.fieldIndex("chi2")) - chiT) < 1e-12)
  }

  test("holmAdjust: hand-worked step-down, ties share the smallest " +
      "rank, clip at 1, matches scipy semantics; partition-invariant") {
    import spark.implicits._
    // p = (.01, .04, .03): sorted (.01, .03, .04), raws (.03, .06, .04)
    // cummax -> (.03, .06, .06)
    val a = Eval.holmAdjust(Seq(0.01, 0.04, 0.03).map(Tuple1(_))
        .toDF("p"), col("p"))
      .orderBy("p").collect().map(_.getDouble(1))
    assert(math.abs(a(0) - 0.03) < 1e-12)
    assert(math.abs(a(1) - 0.06) < 1e-12)
    assert(math.abs(a(2) - 0.06) < 1e-12)
    // ties: p = (.2, .2, .5) at n=3: tie run rank_min=1 -> raw .6;
    // then .5*(3-3+1) = .5, cummax = .6
    val t = Eval.holmAdjust(Seq(0.2, 0.2, 0.5).map(Tuple1(_))
        .toDF("p"), col("p"))
      .orderBy("p").collect().map(_.getDouble(1))
    assert(math.abs(t(0) - 0.6) < 1e-12 && math.abs(t(1) - 0.6) < 1e-12)
    assert(math.abs(t(2) - 0.6) < 1e-12) // cummax carries forward
    // clip: p = (.9, .95) -> raws (1.8, .95) -> (1, 1)
    val c = Eval.holmAdjust(Seq(0.9, 0.95).map(Tuple1(_)).toDF("p"),
        col("p")).orderBy("p").collect().map(_.getDouble(1))
    assert(c(0) == 1.0 && c(1) == 1.0)
    val big = (1 to 400).map(i => Tuple1((i * 53 % 211) / 211.0 + 0.001))
      .toDF("p")
    def run(parts: Int) = Eval.holmAdjust(big.repartition(parts),
      col("p")).orderBy("p").collect().map(_.toString).toSeq
    assert(run(1) == run(9))
  }

  test("twoProportionTest: hand-worked pooled z + unpooled CI; guards") {
    import spark.implicits._
    // A: 30/50 successes, B: 20/50
    val df = ((1 to 50).map(i => (true, i <= 30))
      ++ (1 to 50).map(i => (false, i <= 20))).toDF("a", "s")
    val r = Eval.twoProportionTest(df, col("a"), col("s")).head()
    assert(r.getLong(r.fieldIndex("k_a")) == 30L)
    assert(r.getLong(r.fieldIndex("k_b")) == 20L)
    val (pa, pb, pp) = (0.6, 0.4, 0.5)
    val zWant = (pa - pb) / math.sqrt(pp * 0.5 * (1.0 / 50 + 1.0 / 50))
    assert(math.abs(r.getDouble(r.fieldIndex("z")) - zWant) < 1e-12)
    val se = math.sqrt(pa * 0.4 / 50 + pb * 0.6 / 50)
    assert(math.abs(r.getDouble(r.fieldIndex("lo95"))
      - (0.2 - 1.959963984540054 * se)) < 1e-12)
    // all successes on both sides: pooled var 0 -> z NULL, diff 0
    val allS = Seq((true, true), (false, true)).toDF("a", "s")
    val ra = Eval.twoProportionTest(allS, col("a"), col("s")).head()
    assert(ra.isNullAt(ra.fieldIndex("z")))
    assert(ra.getDouble(ra.fieldIndex("diff")) == 0.0)
    // empty side: p_b NULL, z NULL
    val one = Seq((true, true), (true, false)).toDF("a", "s")
    val ro = Eval.twoProportionTest(one, col("a"), col("s")).head()
    assert(ro.isNullAt(ro.fieldIndex("p_b")))
    assert(ro.isNullAt(ro.fieldIndex("z")))
  }

  test("cochranArmitage: hand-worked 3-dose trend; degenerate guards") {
    import spark.implicits._
    // doses 0/1/2 with (n, r) = (10,2)(10,5)(10,8): T = 21 - 15 = 6,
    // Var = .25 * (50 - 900/30) = 5, z = 6/sqrt(5)
    val rows = (0 until 10).flatMap(i => Seq(
      (0.0, i < 2), (1.0, i < 5), (2.0, i < 8)))
    val df = rows.toDF("w", "ok")
    val r = Eval.cochranArmitage(df, col("w"), col("ok")).head()
    assert(r.getLong(r.fieldIndex("n")) == 30L)
    assert(r.getLong(r.fieldIndex("k")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("t")) - 6.0) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("var_t")) - 5.0) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("z")) - 6.0 / math.sqrt(5.0))
      < 1e-12)
    // all-success: Var = 0 -> z NULL, t still reported
    val flat = Seq((0.0, true), (1.0, true), (2.0, true)).toDF("w", "ok")
    val rf = Eval.cochranArmitage(flat, col("w"), col("ok")).head()
    assert(rf.isNullAt(rf.fieldIndex("z")))
    // single dose level: Var = 0 -> z NULL
    val onew = Seq((1.0, true), (1.0, false)).toDF("w", "ok")
    val r1 = Eval.cochranArmitage(onew, col("w"), col("ok")).head()
    assert(r1.isNullAt(r1.fieldIndex("z")))
  }

  test("fisherExact: tea-tasting 2x2 exact tails; doubling rule; guards") {
    import spark.implicits._
    // a=3 b=1 c=1 d=3: pmf over k in 0..4 = (1,16,36,16,1)/70
    val rows = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("arm", "ok")
    val r = Eval.fisherExact(df, col("arm"), col("ok")).head()
    assert(r.getLong(r.fieldIndex("a")) == 3L)
    assert(math.abs(r.getDouble(r.fieldIndex("p_less")) - 69.0 / 70)
      < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("p_greater")) - 17.0 / 70)
      < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("p_two")) - 34.0 / 70)
      < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("odds_ratio")) - 9.0)
      < 1e-12)
    // zero cell: odds ratio NULL, p still exact; one-point support = 1
    val z = Seq((true, true), (false, false)).toDF("arm", "ok")
    val rz = Eval.fisherExact(z, col("arm"), col("ok")).head()
    assert(rz.isNullAt(rz.fieldIndex("odds_ratio")))
    assert(rz.getDouble(rz.fieldIndex("p_greater")) == 0.5)
    // support guard fails fast
    val big = (1 to 100).map(i => (i % 2 == 0, i % 3 == 0)).toDF("arm", "ok")
    intercept[IllegalArgumentException] {
      Eval.fisherExact(big, col("arm"), col("ok"), maxSupport = 10L)
    }
  }

  test("ebShrinkRates: small groups pulled toward the grand rate, big " +
      "groups barely move; posterior-mean formula; degenerate panel " +
      "pools completely") {
    import spark.implicits._
    // big group: 1000 rows at 30%; small: 4 rows at 75% (noise)
    val rows = (1 to 1000).map(i => ("big", i % 10 < 3)) ++
      (1 to 4).map(i => ("small", i <= 3)) ++
      (1 to 500).map(i => ("mid", i % 10 < 4))
    val out = Eval.ebShrinkRates(rows.toDF("g", "s"), Seq("g"),
      col("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val big = out("big"); val small = out("small")
    val a = big.getDouble(big.fieldIndex("alpha"))
    val b = big.getDouble(big.fieldIndex("beta"))
    // posterior-mean formula holds exactly
    out.values.foreach { r =>
      val n = r.getLong(r.fieldIndex("n")).toDouble
      val k = r.getLong(r.fieldIndex("k")).toDouble
      // mirror the op's association: n + (alpha+beta), not (n+a)+b
      assert(r.getDouble(r.fieldIndex("shrunk"))
        == (k + a) / (n + (a + b)))
    }
    // big group's shrunk ~ raw; small group moves a lot toward center
    assert(math.abs(big.getDouble(big.fieldIndex("shrunk"))
      - big.getDouble(big.fieldIndex("raw"))) < 0.02)
    val smallMove = math.abs(small.getDouble(small.fieldIndex("shrunk"))
      - small.getDouble(small.fieldIndex("raw")))
    assert(smallMove > 0.1,
      s"4-row 75% slice should shrink hard, moved $smallMove")
    // rates less dispersed than binomial noise: complete pooling
    // (success alternates in blocks of 4 so every group sits at ~50%
    // with near-zero between-group variance)
    val flat = (1 to 100).map(i => (s"g${i % 4}", (i / 4) % 2 == 0))
    val rf = Eval.ebShrinkRates(flat.toDF("g", "s"), Seq("g"),
      col("s")).head()
    assert(rf.getDouble(rf.fieldIndex("alpha"))
      + rf.getDouble(rf.fieldIndex("beta")) >= 9999.0)
    intercept[IllegalArgumentException] {
      Eval.ebShrinkRates(Seq(("one", true)).toDF("g", "s"), Seq("g"),
        col("s"))
    }
  }

  test("balanceTable: hand-worked SMD; weighting restores balance; " +
      "constant covariate NULL smd") {
    import spark.implicits._
    // T = {1,3}, C = {5,7}: means 2 vs 6, vars 2 and 2 -> SMD = -4/sqrt(2)
    // weight the C rows 3:1 toward the small value to shift wmean_c
    val df = Seq((true, 1.0, 1.0), (true, 3.0, 1.0),
      (false, 5.0, 3.0), (false, 7.0, 1.0)).toDF("t", "x", "w")
    val r = Eval.balanceTable(df, col("t"),
      Seq("x" -> col("x")), col("w")).head()
    assert(r.getDouble(r.fieldIndex("smd")) == -4.0 / math.sqrt(2.0))
    assert(r.getDouble(r.fieldIndex("mean_t")) == 2.0)
    // weighted C mean = (3*5 + 7)/4 = 5.5; weighted var population
    val wmC = r.getDouble(r.fieldIndex("wmean_c"))
    assert(wmC == 5.5)
    val wvC = (3 * (5.0 - 5.5) * (5.0 - 5.5)
      + (7.0 - 5.5) * (7.0 - 5.5)) / 4
    val wvT = ((1.0 - 2) * (1.0 - 2) + (3.0 - 2) * (3.0 - 2)) / 2
    assert(math.abs(r.getDouble(r.fieldIndex("wsmd"))
      - (2.0 - 5.5) / math.sqrt((wvT + wvC) / 2)) < 1e-12)
    // constant covariate: pooled var 0 -> NULL
    val c = Seq((true, 1.0, 1.0), (true, 1.0, 1.0), (false, 1.0, 1.0),
      (false, 1.0, 1.0)).toDF("t", "x", "w")
    val rc = Eval.balanceTable(c, col("t"), Seq("x" -> col("x")),
      col("w")).head()
    assert(rc.isNullAt(rc.fieldIndex("smd")))
    // two covariates come back as two rows
    assert(Eval.balanceTable(df, col("t"),
      Seq("x" -> col("x"), "x2" -> (col("x") * 2)), col("w"))
      .count() == 2L)
  }

  test("diffInDiff: hand-worked 2x2; control drift nets out; tiny " +
      "cell NULL se") {
    import spark.implicits._
    // pre->post: T 10->17 (+7), C 20->23 (+3) => DiD = 4
    val rows =
      Seq((true, false, 9.0), (true, false, 11.0),
        (true, true, 16.0), (true, true, 18.0),
        (false, false, 19.0), (false, false, 21.0),
        (false, true, 22.0), (false, true, 24.0))
    val r = Eval.diffInDiff(rows.toDF("t", "p", "y"), col("t"),
      col("p"), col("y")).head()
    assert(r.getDouble(r.fieldIndex("did")) == 4.0)
    // all four cells var 2, n 2 -> se = sqrt(4 * 2/2) = 2
    assert(math.abs(r.getDouble(r.fieldIndex("se")) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("lo95"))
      - (4.0 - 1.959963984540054 * 2)) < 1e-12)
    // one-member cell: did still exact, se NULL
    val tiny = rows.take(7)
    val rt = Eval.diffInDiff(tiny.toDF("t", "p", "y"), col("t"),
      col("p"), col("y")).head()
    assert(rt.isNullAt(rt.fieldIndex("se")))
    assert(rt.getDouble(rt.fieldIndex("did"))
      == (17.0 - 10.0) - (22.0 - 20.0))
  }

  test("pageTrend: hand-worked rising design; reversed order flips L; " +
      "incomplete design refused") {
    import spark.implicits._
    // 2 items x 3 systems, scores rise with system label:
    // R = (2,4,6), L = 2+8+18 = 28, E = 24, Var = 4, z = 2
    val df = Seq((1, 0.0, 1.0), (1, 1.0, 2.0), (1, 2.0, 3.0),
      (2, 0.0, 2.0), (2, 1.0, 4.0), (2, 2.0, 6.0))
      .toDF("item", "sys", "v")
    val r = Eval.pageTrend(df, col("item"), col("sys"), col("v")).head()
    assert(r.getDouble(r.fieldIndex("l")) == 28.0)
    assert(r.getDouble(r.fieldIndex("e_l")) == 24.0)
    assert(r.getDouble(r.fieldIndex("z")) == 2.0)
    // reversing the hypothesized order mirrors L around E
    val rev = Eval.pageTrend(df, col("item"), -col("sys"), col("v"))
      .head()
    assert(rev.getDouble(rev.fieldIndex("l")) == 20.0)
    assert(rev.getDouble(rev.fieldIndex("z")) == -2.0)
    intercept[IllegalArgumentException] {
      Eval.pageTrend(df.limit(5), col("item"), col("sys"), col("v"))
    }
  }
}
