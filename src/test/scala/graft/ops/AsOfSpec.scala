package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** As-of join vs a brute-force per-row scan over collected data. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  // (key, t, id) probe / (key, t, v) build fixture with ties, gaps,
  // keys missing on either side, and a NULL build value
  private val probeRows = Seq(
    (1L, 10.0, "p1"), (1L, 20.0, "p2"), (1L, 20.5, "p3"),
    (2L, 5.0, "p4"), (2L, 30.0, "p5"),
    (3L, 7.0, "p6"), // key absent from build
    (1L, 3.0, "p7")) // before any build row
  private val buildRows = Seq(
    (1L, 10.0, java.lang.Double.valueOf(100.0)), // tie with p1
    (1L, 15.0, null.asInstanceOf[java.lang.Double]), // NULL value row
    (1L, 25.0, java.lang.Double.valueOf(300.0)),
    (2L, 4.0, java.lang.Double.valueOf(400.0)),
    (2L, 31.0, java.lang.Double.valueOf(500.0)),
    (4L, 1.0, java.lang.Double.valueOf(600.0))) // key absent from probe

  private def probeDf = probeRows.toDF("k", "t", "pid")
  private def buildDf = buildRows.toDF("k", "t", "v")

  private def expected(forward: Boolean, tol: Option[Double]) =
    probeRows.map { case (k, t, pid) =>
      val cands = buildRows.filter(b => b._1 == k &&
        (if (forward) b._2 >= t else b._2 <= t) &&
        tol.forall(x => math.abs(b._2 - t) <= x))
      val best =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._2) else cands.maxBy(_._2))
      (k, t, pid, best.map(_._2), best.flatMap(b => Option(b._3).map(_.doubleValue)))
    }.toSet

  private def run(forward: Boolean = false, tol: Option[Double] = None,
      inner: Boolean = false) =
    AsOf.joinAsOf(probeDf, buildDf, Seq("k"), "t", "t",
        forward = forward, toleranceSec = tol, inner = inner)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet

  test("backward as-of matches brute force (ties inclusive, NULL row atomic)") {
    assert(run() == expected(forward = false, None))
    // p2 (t=20) must match the t=15 build row WITH its NULL value — not
    // resurrect 100.0 from t=10 (per-column last() would)
    val p2 = run().find(_._3 == "p2").get
    assert(p2._4.contains(15.0) && p2._5.isEmpty)
  }

  test("forward as-of matches brute force") {
    assert(run(forward = true) == expected(forward = true, None))
  }

  test("tolerance nulls out distant matches") {
    assert(run(tol = Some(2.0)) == expected(forward = false, Some(2.0)))
  }

  test("inner drops unmatched probe rows only") {
    val exp = expected(forward = false, None).filter(_._4.nonEmpty)
    assert(run(inner = true) == exp)
  }

  test("plan is one shuffle + window, not a range join") {
    val plan = AsOf.joinAsOf(probeDf, buildDf, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  private def runB(forward: Boolean = false, tol: Option[Double] = None,
      inner: Boolean = false) =
    AsOf.joinAsOfBroadcast(probeDf, buildDf, Seq("k"), "t", "t",
        forward = forward, toleranceSec = tol, inner = inner)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet

  test("broadcast variant ≡ window variant on every mode") {
    assert(runB() == run())
    assert(runB(forward = true) == run(forward = true))
    assert(runB(tol = Some(2.0)) == run(tol = Some(2.0)))
    assert(runB(inner = true) == run(inner = true))
  }

  test("broadcast variant: probe side has no shuffle, no sort") {
    val plan = AsOf.joinAsOfBroadcast(probeDf, buildDf, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window") &&
      !plan.toLowerCase.contains("sortmerge"), plan)
  }

  test("broadcast multi-key (rows fallback) ≡ window variant") {
    // second key splits each k into two series; compare against joinAsOf
    val p2 = probeDf.withColumn("k2", col("k") % 2)
    val b2 = buildDf.withColumn("k2", col("k") % 2)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "k2", "t", "pid", "t_b", "v_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet
    val a = norm(AsOf.joinAsOf(p2, b2, Seq("k", "k2"), "t", "t"))
    val b = norm(AsOf.joinAsOfBroadcast(p2, b2, Seq("k", "k2"), "t", "t"))
    assert(a == b)
  }

  test("broadcast string-key path works (codegen'd Object overload)") {
    val p = probeDf.withColumn("k", concat(lit("u"), col("k")))
    val b = buildDf.withColumn("k", concat(lit("u"), col("k")))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "t", "pid", "t_b", "v_b").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(norm(AsOf.joinAsOfBroadcast(p, b, Seq("k"), "t", "t")) ==
      norm(AsOf.joinAsOf(p, b, Seq("k"), "t", "t")))
  }

  test("broadcast variant: maxBuildRows guard fails fast") {
    intercept[IllegalArgumentException] {
      AsOf.joinAsOfBroadcast(probeDf, buildDf, Seq("k"), "t", "t",
        maxBuildRows = 2)
    }
  }

  test("broadcast variant ≡ window variant on real event timestamps") {
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"event_id", $"ts_b", $"value_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val a = norm(AsOf.joinAsOf(clicks, purchases, Seq("user_id"), "ts", "ts"))
    val b = norm(AsOf.joinAsOfBroadcast(clicks, purchases, Seq("user_id"), "ts", "ts"))
    assert(a == b)
  }

  test("timestamp time columns work end-to-end on events") {
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val joined = AsOf.joinAsOf(clicks, purchases, Seq("user_id"), "ts", "ts")
    assert(joined.count() == clicks.count())
    val matched = joined.where($"ts_b".isNotNull)
    assert(matched.count() > 0)
    assert(matched.where($"ts_b" > $"ts").count() == 0, "backward: ts_b <= ts")
  }
}
