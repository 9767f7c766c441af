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
      inner: Boolean = false, timeSplits: Int = 1) =
    AsOf.joinAsOf(probeDf, buildDf, Seq("k"), "t", "t",
        forward = forward, toleranceSec = tol, inner = inner,
        timeSplits = timeSplits)
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

  test("NULL keys and NULL times never match — identical across all variants") {
    val p = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Double.valueOf(10.0), "a"),
      (null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(10.0), "nullkey"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Double], "nulltime"),
      (java.lang.Long.valueOf(2L), java.lang.Double.valueOf(10.0), "b"))
      .toDF("k", "t", "pid")
    val b = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Double.valueOf(5.0), "m1"),
      // NULL build key / NULL build time: must match NOTHING (SQL ASOF
      // semantics), in particular not the NULL-keyed/timed probe rows
      (null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(1.0), "mnullk"),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double], "mnullt"))
      .toDF("k", "t", "v")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "t_b", "v_b").collect()
        .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.toString))).toSet
    for (fwd <- Seq(false, true)) {
      val expectA =
        if (!fwd) Set(("a", Some(5.0), Some("m1")), ("nullkey", None, None),
          ("nulltime", None, None), ("b", None, None))
        else Set(("a", None, None), ("nullkey", None, None),
          ("nulltime", None, None), ("b", None, None))
      val base = norm(AsOf.joinAsOf(p, b, Seq("k"), "t", "t", forward = fwd))
      assert(base == expectA, s"forward=$fwd")
      assert(norm(AsOf.joinAsOf(p, b, Seq("k"), "t", "t", forward = fwd,
        timeSplits = 4)) == base, s"split forward=$fwd")
      assert(norm(AsOf.joinAsOfBroadcast(p, b, Seq("k"), "t", "t",
        forward = fwd)) == base, s"broadcast forward=$fwd")
      // multi-key rows fallback with a NULL in the second key component
      val p2 = p.withColumn("k2",
        when(col("pid") === "nullkey", lit(null)).otherwise(lit(1L)))
      val b2 = b.withColumn("k2", lit(1L))
      assert(norm(AsOf.joinAsOfBroadcast(p2, b2, Seq("k", "k2"), "t", "t",
          forward = fwd)) ==
        norm(AsOf.joinAsOf(p2, b2, Seq("k", "k2"), "t", "t", forward = fwd)),
        s"rows-fallback forward=$fwd")
    }
  }

  test("timeSplits ≡ base path on every mode of the mixed fixture") {
    assert(run(timeSplits = 4) == expected(forward = false, None))
    assert(run(forward = true, timeSplits = 4) == expected(forward = true, None))
    assert(run(tol = Some(2.0), timeSplits = 4) ==
      expected(forward = false, Some(2.0)))
    assert(run(inner = true, timeSplits = 4) ==
      expected(forward = false, None).filter(_._4.nonEmpty))
  }

  test("timeSplits: one hot key spreads over split sub-partitions, same result") {
    // one key holds ALL rows — the base path serializes its sort onto a
    // single task; timeSplits must range-split it and still agree exactly
    val p = spark.range(20000).select(lit(7L).as("k"),
      (col("id") * 1.0).as("t"), col("id").as("pid"))
    val b = spark.range(2000).select(lit(7L).as("k"),
      (col("id") * 10.0 + 0.5).as("t"), (col("id") * 2).as("v"))
    for (fwd <- Seq(false, true)) {
      val base = AsOf.joinAsOf(p, b, Seq("k"), "t", "t", forward = fwd)
      val split = AsOf.joinAsOf(p, b, Seq("k"), "t", "t", forward = fwd,
        timeSplits = 8)
      assert(split.except(base).isEmpty && base.except(split).isEmpty,
        s"forward=$fwd")
      // the big window really partitions by (key, split): multi-task
      val plan = split.queryExecution.executedPlan.toString
      assert(plan.contains("__split"), plan)
    }
    // boundary repair: probe rows in build-empty splits inherit across
    // multiple empty splits (build only in the first 1/10 of the range)
    val bSparse = spark.range(20).select(lit(7L).as("k"),
      (col("id") * 1.0).as("t"), col("id").as("v"))
    val baseS = AsOf.joinAsOf(p, bSparse, Seq("k"), "t", "t")
    val splitS = AsOf.joinAsOf(p, bSparse, Seq("k"), "t", "t", timeSplits = 8)
    assert(splitS.except(baseS).isEmpty && baseS.except(splitS).isEmpty)
  }

  test("joinTemporal: interval containment, gaps, open versions, end-exclusive") {
    // versions for key 1: [0,10) v=a, gap [10,20), [20,30) v=c, [30,∞) v=d
    val build = Seq(
      (1L, 0.0, java.lang.Double.valueOf(10.0), "a"),
      (1L, 20.0, java.lang.Double.valueOf(30.0), "c"),
      (1L, 30.0, null.asInstanceOf[java.lang.Double], "d"),
      (2L, 5.0, java.lang.Double.valueOf(6.0), "z"))
      .toDF("k", "vf", "vt", "ver")
    val probe = Seq(
      (1L, -1.0, "before"), (1L, 0.0, "at-start"), (1L, 9.99, "in-a"),
      (1L, 10.0, "gap-start"), (1L, 15.0, "in-gap"), (1L, 20.0, "in-c"),
      (1L, 30.0, "at-d"), (1L, 99.0, "open-d"),
      (2L, 6.0, "at-z-end"), (3L, 1.0, "no-key"))
      .toDF("k", "t", "pid")
    val want = Map(
      "before" -> None, "at-start" -> Some("a"), "in-a" -> Some("a"),
      "gap-start" -> None, // end-exclusive: t == vt of a
      "in-gap" -> None, // older version exists but EXPIRED — not an as-of
      "in-c" -> Some("c"), "at-d" -> Some("d"), "open-d" -> Some("d"),
      "at-z-end" -> None, "no-key" -> None)
    for (splits <- Seq(1, 4)) {
      val got = AsOf.joinTemporal(probe, build, Seq("k"), "t", "vf", "vt",
          timeSplits = splits)
        .select("pid", "ver_b").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(got == want, s"splits=$splits")
      // expired version must null EVERY build column atomically
      val gapRow = AsOf.joinTemporal(probe, build, Seq("k"), "t", "vf", "vt",
        timeSplits = splits).where(col("pid") === "in-gap").head()
      assert(gapRow.isNullAt(gapRow.fieldIndex("vf_b")) &&
        gapRow.isNullAt(gapRow.fieldIndex("vt_b")) &&
        gapRow.isNullAt(gapRow.fieldIndex("ver_b")))
    }
    // inner mode keeps only live matches
    val inner = AsOf.joinTemporal(probe, build, Seq("k"), "t", "vf", "vt",
      inner = true).select("pid").as[String].collect().toSet
    assert(inner == want.collect { case (p, Some(_)) => p }.toSet)
    // plan: still the window formulation, no range join
    val plan = AsOf.joinTemporal(probe, build, Seq("k"), "t", "vf", "vt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("reserved internal column names are rejected up front") {
    val bad = probeDf.withColumn("__match", lit(1))
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(bad, buildDf, Seq("k"), "t", "t")
    }
    intercept[IllegalArgumentException] {
      AsOf.joinAsOfBroadcast(probeDf, buildDf.withColumn("__bt", lit(1)),
        Seq("k"), "t", "t")
    }
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
