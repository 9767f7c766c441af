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
}
