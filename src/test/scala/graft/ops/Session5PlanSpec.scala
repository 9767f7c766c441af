package graft.ops

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window,
  Sort, Join}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Plan-shape assertions for the session-5/6 eval & telemetry ops —
  * the 100 TB contract is structural: these must stay one-aggregation
  * (or one-window) shapes with no stray global Sort, no matter what
  * the implementation looks like after a refactor. */
class Session5PlanSpec extends SparkTestBase {

  private def ev = {
    import spark.implicits._
    (1 to 64).map(i => ("g" + (i % 4), i.toLong, i * 1.5, i * 0.5,
      i % 3 == 0)).toDF("g", "id", "a", "b", "ok")
  }

  private def logical(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan

  test("single-aggregation ops plan exactly one grouped Aggregate") {
    // each of these must reduce the corpus in ONE groupBy pass —
    // a second corpus-grain Aggregate or any Sort is a regression
    val plans = Seq(
      Reward.klEstimators(ev, Seq("g"), col("a"), col("b")),
      Reward.specDecodeAcceptance(ev, Seq("g"), col("a"), col("b"), 4),
      Eval.mcnemar(ev, Seq("g"), col("ok"), col("a") > 3),
      Eval.wilsonInterval(ev, Seq("g"), col("ok")),
      Packing.kvPageStats(ev, Seq("g"), col("id"), 16))
    plans.foreach { df =>
      val p = logical(df)
      val aggs = p.collect { case a: Aggregate => a }
      assert(aggs.size == 1, s"expected 1 Aggregate, got:\n$p")
      assert(p.collect { case s: Sort => s }.isEmpty,
        s"unexpected Sort in:\n$p")
      assert(p.collect { case w: Window => w }.isEmpty,
        s"unexpected Window in:\n$p")
    }
  }

  test("gaeAdvantage: both windows share one partition+order spec") {
    val p = logical(Reward.gaeAdvantage(ev, Seq("g"), col("id"),
      col("id"), col("a"), col("b")))
    val wins = p.collect { case w: Window => w }
    assert(wins.nonEmpty)
    val specs = wins.flatMap(w =>
      w.windowExpressions.map(_ => (w.partitionSpec.map(_.sql),
        w.orderSpec.map(_.sql)))).distinct
    assert(specs.size == 1,
      s"windows split across specs (extra exchange/sort): $specs")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "corpus-global window"))
  }

  test("riskCoverage and conformal windows are always partitioned") {
    val rc = logical(Eval.riskCoverage(ev, Seq("g"), col("a"),
      col("ok"), col("id")))
    val ct = logical(Eval.conformalThreshold(ev, Seq("g"), col("a"),
      col("id"), Seq(0.25)))
    Seq(rc, ct).foreach { p =>
      val wins = p.collect { case w: Window => w }
      assert(wins.nonEmpty)
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"corpus-global window in:\n$p"))
    }
  }

  test("bestOfN folds in-cell: no join, no window, one grouped pass") {
    val p = logical(Eval.bestOfN(ev, Seq("g"), col("a"), Seq(1, 2)))
    assert(p.collect { case j: Join => j }.isEmpty)
    assert(p.collect { case w: Window => w }.isEmpty)
    assert(p.collect { case a: Aggregate => a }.size == 1)
  }

  test("pairedBootstrapTest shuffles replicate partials, not rows") {
    // the explode happens scan-side; the only aggregates are the
    // (group, replicate) partial fold and the two group-level folds
    val p = logical(Robust.pairedBootstrapTest(ev, Seq("g"), col("id"),
      col("a"), col("b"), replicates = 8))
    val aggs = p.collect { case a: Aggregate => a }
    assert(aggs.size == 3, s"expected 3 Aggregates, got ${aggs.size}")
    assert(p.collect { case s: Sort => s }.isEmpty)
  }
}
