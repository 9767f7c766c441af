package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Survival analysis (Survival.kaplanMeier / logRank). */
class SurvivalSpec extends SparkTestBase {

  test("kaplanMeier: textbook curve with censoring, grouped path") {
    import spark.implicits._
    // classic toy: events at 1, 3, 5; censored at 2, 4 (n=5)
    val df = Seq(("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, true),
      ("g", 4.0, false), ("g", 5.0, true)).toDF("g", "t", "e")
    val got = Survival.kaplanMeier(df, Seq("g"), col("t"), col("e"))
      .orderBy("t").collect()
    assert(got.map(_.getLong(2)) sameElements Array(5L, 4L, 3L, 2L, 1L))
    val s = got.map(r => r.getDouble(r.fieldIndex("survival")))
    // S(1)=4/5; S(2)=4/5 (censor); S(3)=4/5*2/3; S(4) same; S(5)=0
    assert(math.abs(s(0) - 0.8) < 1e-12)
    assert(math.abs(s(1) - 0.8) < 1e-12)
    assert(math.abs(s(2) - 0.8 * 2 / 3) < 1e-12)
    assert(math.abs(s(3) - 0.8 * 2 / 3) < 1e-12)
    assert(s(4) == 0.0) // d = n_risk at the last time: exact zero
  }

  test("kaplanMeier: global (distributed) path equals grouped path " +
      "and is partition-invariant") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      ("all", (i * 7 % 23).toDouble, i % 3 != 0)
    }
    val df = rows.toDF("g", "t", "e")
    val grouped = Survival.kaplanMeier(df, Seq("g"), col("t"), col("e"))
      .drop("g").orderBy("t").collect().map(_.toString).toSeq
    val global = Survival.kaplanMeier(df.repartition(7), Seq.empty,
        col("t"), col("e"))
      .orderBy("t").collect().map(_.toString).toSeq
    assert(grouped == global)
    val global1 = Survival.kaplanMeier(df.repartition(1), Seq.empty,
        col("t"), col("e"))
      .orderBy("t").collect().map(_.toString).toSeq
    assert(global == global1)
  }

  test("kaplanMeier: no censoring reduces to the empirical survivor " +
      "function") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toDouble, true)).toDF("t", "e")
    val got = Survival.kaplanMeier(df, Seq.empty, col("t"), col("e"))
      .orderBy("t").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val expected = (10.0 - (i + 1)) / 10.0
      assert(math.abs(r.getDouble(r.fieldIndex("survival")) - expected)
        < 1e-12, s"row $i")
    }
  }

  test("logRank: identical curves give chi2 ~ 0; hand-worked example") {
    import spark.implicits._
    // identical samples on both sides -> O = E exactly
    val same = (1 to 20).flatMap(i => Seq(
      ((i % 5).toDouble + 1, i % 4 != 0, true),
      ((i % 5).toDouble + 1, i % 4 != 0, false)))
      .toDF("t", "e", "a")
    val r0 = Survival.logRank(same, col("t"), col("e"), col("a")).head()
    assert(math.abs(r0.getDouble(r0.fieldIndex("o_minus_e"))) < 1e-12)
    // hand-worked: A = events at 1, 2; B = events at 3, 4
    // t=1: n1=2,n0=2,d=1 -> e1 = 0.5, v = 1*(2/4)*(2/4)*(3/3) = 0.25
    // t=2: n1=1,n0=2,d=1 -> e1 = 1/3, v = (1/3)*(2/3)*(1) = 2/9
    // t=3: n1=0,n0=2,d=1 -> e1 = 0,   v = 0
    // t=4: n1=0,n0=1,d=1 -> n=1 < 2  -> v term 0
    val df = Seq((1.0, true, true), (2.0, true, true),
      (3.0, true, false), (4.0, true, false)).toDF("t", "e", "a")
    val r = Survival.logRank(df, col("t"), col("e"), col("a")).head()
    val oe = 2.0 - (0.5 + 1.0 / 3)
    val v = 0.25 + 2.0 / 9
    assert(math.abs(r.getDouble(r.fieldIndex("o_minus_e")) - oe) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("var_o")) - v) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) - oe * oe / v)
      < 1e-12)
    assert(r.getLong(r.fieldIndex("events_a")) == 2L)
    assert(r.getLong(r.fieldIndex("events_b")) == 2L)
  }

  test("kaplanMeier: Nelson-Aalen cum_hazard matches the hand fold " +
      "in both arms") {
    import spark.implicits._
    val df = Seq(("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, true),
      ("g", 4.0, false), ("g", 5.0, true)).toDF("g", "t", "e")
    val want = Array(1.0 / 5, 1.0 / 5, 1.0 / 5 + 1.0 / 3,
      1.0 / 5 + 1.0 / 3, 1.0 / 5 + 1.0 / 3 + 1.0)
    val grouped = Survival.kaplanMeier(df, Seq("g"), col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => r.getDouble(r.fieldIndex("cum_hazard")))
    val global = Survival.kaplanMeier(df, Seq.empty, col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => r.getDouble(r.fieldIndex("cum_hazard")))
    grouped.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12) }
    assert(grouped.toSeq == global.toSeq) // bit-identical arms
  }

  test("rmst: hand-worked step integral; tau below first event; " +
      "negative durations refused") {
    import spark.implicits._
    // events at 1, 3; censor at 2 (n=3): S=2/3 on [1,3), S=0 after 3
    // (at t=3 the last at-risk subject dies)
    val df = Seq((1.0, true), (2.0, false), (3.0, true)).toDF("t", "e")
    // tau=4: 1*[0,1) + 2/3*[1,3) + 0*[3,4) = 1 + 4/3
    val r = Survival.rmst(df, col("t"), col("e"), 4.0).head()
    assert(math.abs(r.getDouble(r.fieldIndex("rmst")) - (1 + 4.0 / 3))
      < 1e-12)
    // tau=2: 1*[0,1) + 2/3*[1,2) = 5/3
    val r2 = Survival.rmst(df, col("t"), col("e"), 2.0).head()
    assert(math.abs(r2.getDouble(r2.fieldIndex("rmst")) - 5.0 / 3)
      < 1e-12)
    // tau below the first time: survival 1 throughout -> rmst = tau
    val r3 = Survival.rmst(df, col("t"), col("e"), 0.5).head()
    assert(r3.getDouble(r3.fieldIndex("rmst")) == 0.5)
    intercept[IllegalArgumentException] {
      Survival.rmst(Seq((-1.0, true)).toDF("t", "e"), col("t"),
        col("e"), 1.0)
    }
  }

  test("cumulativeIncidence: hand-worked two-cause example; " +
      "mass conservation") {
    import spark.implicits._
    // t=1: cause 1 (n=4); t=2: cause 2 (n=3); t=3: censored (n=2);
    // t=4: cause 1 (n=1)
    val df = Seq((1.0, 1L), (2.0, 2L), (3.0, 0L), (4.0, 1L))
      .toDF("t", "k")
    val got = Survival.cumulativeIncidence(df, col("t"), col("k"))
      .orderBy("t", "cause").collect()
    // S(0)=1, S(1)=3/4, S(2)=1/2, S(3)=1/2, S(4)=0
    // CIF1(1) = 1*(1/4); CIF2(2) = 3/4*(1/3) = 1/4
    // CIF1(4) = 1/4 + 1/2*(1/1) = 3/4
    assert(got.length == 3)
    val byKey = got.map(r => (r.getDouble(0), r.getLong(1)) ->
      r.getDouble(r.fieldIndex("cif"))).toMap
    assert(math.abs(byKey((1.0, 1L)) - 0.25) < 1e-12)
    assert(math.abs(byKey((2.0, 2L)) - 0.25) < 1e-12)
    assert(math.abs(byKey((4.0, 1L)) - 0.75) < 1e-12)
    // mass conservation: sum of final CIFs + S(inf) = 1 (S(inf)=0 here)
    val finals = got.groupBy(_.getLong(1)).map(_._2.maxBy(_.getDouble(0)))
      .map(r => r.getDouble(r.fieldIndex("cif"))).sum
    assert(math.abs(finals - 1.0) < 1e-12)
  }

  test("cumulativeIncidence: partition-invariant bit-wise") {
    import spark.implicits._
    val rows = (1 to 500).map(i =>
      ((i * 7 % 41).toDouble, (i % 4 match {
        case 0 => 0L; case 1 => 1L; case 2 => 2L; case _ => 1L
      })))
    val df = rows.toDF("t", "k")
    def run(parts: Int) = Survival.cumulativeIncidence(
        df.repartition(parts), col("t"), col("k"))
      .orderBy("t", "cause").collect().map(_.toString).toSeq
    assert(run(1) == run(11))
  }

  test("logRank: partition-invariant; empty side gives NULL chi2") {
    import spark.implicits._
    val rows = (1 to 300).map(i =>
      ((i * 11 % 17).toDouble, i % 5 != 0, i % 2 == 0))
    val df = rows.toDF("t", "e", "a")
    val a = Survival.logRank(df.repartition(1), col("t"), col("e"),
      col("a")).head().toString
    val b = Survival.logRank(df.repartition(13), col("t"), col("e"),
      col("a")).head().toString
    assert(a == b)
    val oneSided = Survival.logRank(df.where(col("a")), col("t"),
      col("e"), col("a")).head()
    assert(oneSided.isNullAt(oneSided.fieldIndex("chi2")))
  }

  test("coxPH: sequential Breslow-Newton agreement with ties; sign " +
      "recovers the planted effect; gradient receipt near 0; " +
      "degenerate guards") {
    import spark.implicits._
    def brute(rows: Seq[(Double, Boolean, Double)], iters: Int)
        : (Double, Double, Double) = {
      var b = 0.0
      var (u, i2) = (0.0, 0.0)
      for (it <- 0 to iters) {
        val times = rows.map(_._1).distinct.sorted
        u = 0.0; i2 = 0.0
        for (t <- times) {
          val risk = rows.filter(_._1 >= t)
          val s0 = risk.map(r => math.exp(b * r._3)).sum
          val s1 = risk.map(r => r._3 * math.exp(b * r._3)).sum
          val s2 = risk.map(r => r._3 * r._3 * math.exp(b * r._3)).sum
          val ev = rows.filter(r => r._1 == t && r._2)
          if (ev.nonEmpty) {
            u += ev.map(_._3).sum - ev.size * (s1 / s0)
            i2 += ev.size * (s2 / s0 - (s1 / s0) * (s1 / s0))
          }
        }
        if (it < iters) b += u / i2
      }
      (b, u, i2)
    }
    // planted effect: x = 1 halves the time scale -> beta > 0, with
    // heavy ties from the small integer lattice
    val rows = (1 to 80).map { i =>
      val x = (i % 2).toDouble
      val t = ((i * 7) % 20 + 1 + (1 - x) * 12).toDouble
      (t, i % 5 != 0, x)
    }
    val df = rows.toDF("t", "e", "x")
    val r = Survival.coxPH(df, col("t"), col("e"), col("x")).head()
    val (bRef, uRef, iRef) = brute(rows, 8)
    assert(math.abs(r.getDouble(r.fieldIndex("beta")) - bRef) < 1e-9,
      s"got ${r.getDouble(r.fieldIndex("beta"))} ref $bRef")
    assert(r.getDouble(r.fieldIndex("beta")) > 0.3)
    assert(math.abs(r.getDouble(r.fieldIndex("u_final"))) < 1e-6,
      "post-fit gradient receipt should be ~0 on a converged fit")
    assert(math.abs(r.getDouble(r.fieldIndex("u_final")) - uRef) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("se"))
      - 1.0 / math.sqrt(iRef)) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("hr"))
      - math.exp(bRef)) < 1e-9)
    // constant covariate: information 0 -> NULL beta, counts intact
    val const = rows.map { case (t, e, _) => (t, e, 1.0) }
      .toDF("t", "e", "x")
    val rc = Survival.coxPH(const, col("t"), col("e"), col("x")).head()
    assert(rc.isNullAt(rc.fieldIndex("beta")))
    assert(rc.getLong(rc.fieldIndex("n")) == 80L)
    // no events: NULL
    val ne = rows.map { case (t, _, x) => (t, false, x) }
      .toDF("t", "e", "x")
    val rn = Survival.coxPH(ne, col("t"), col("e"), col("x")).head()
    assert(rn.isNullAt(rn.fieldIndex("beta")))
    // partition invariance
    val a = Survival.coxPH(df.repartition(1), col("t"), col("e"),
      col("x")).head().toString
    val b = Survival.coxPH(df.repartition(13), col("t"), col("e"),
      col("x")).head().toString
    assert(a == b)
  }

  test("coxPH stratified: per-stratum risk sets match a sequential " +
      "stratified replay; stratification removes a planted baseline " +
      "confounder") {
    import spark.implicits._
    def brute(rows: Seq[(String, Double, Boolean, Double)], iters: Int)
        : Double = {
      var bta = 0.0
      for (it <- 0 until iters) {
        var u = 0.0; var i2 = 0.0
        for (s <- rows.map(_._1).distinct.sorted) {
          val sr = rows.filter(_._1 == s)
          for (t <- sr.map(_._2).distinct.sorted) {
            val risk = sr.filter(_._2 >= t)
            val s0 = risk.map(r => math.exp(bta * r._4)).sum
            val s1 = risk.map(r => r._4 * math.exp(bta * r._4)).sum
            val s2 = risk.map(r => r._4 * r._4 * math.exp(bta * r._4))
              .sum
            val ev = sr.filter(r => r._2 == t && r._3)
            if (ev.nonEmpty) {
              u += ev.map(_._4).sum - ev.size * (s1 / s0)
              i2 += ev.size * (s2 / s0 - (s1 / s0) * (s1 / s0))
            }
          }
        }
        bta += u / i2
      }
      bta
    }
    // stratum B shifts every time by +50 (baseline change), x is
    // MOSTLY 1 in stratum B — unstratified, x looks protective; the
    // true within-stratum effect is hazard-raising (planted)
    val rows = (1 to 120).map { i =>
      val s = if (i % 3 == 0) "B" else "A"
      val x = if (s == "B") (if (i % 5 == 0) 0.0 else 1.0)
              else (if (i % 5 == 0) 1.0 else 0.0)
      val t = ((i * 7) % 20 + 1).toDouble +
        (if (x > 0) 0.0 else 8.0) + (if (s == "B") 50.0 else 0.0)
      (s, t, i % 4 != 0, x)
    }
    val df = rows.toDF("s", "t", "e", "x")
    val r = Survival.coxPH(df, col("t"), col("e"), col("x"),
      strataCols = Seq("s")).head()
    val bRef = brute(rows, 8)
    assert(math.abs(r.getDouble(r.fieldIndex("beta")) - bRef) < 1e-9,
      s"got ${r.getDouble(r.fieldIndex("beta"))} ref $bRef")
    assert(r.getDouble(r.fieldIndex("beta")) > 0.3,
      "stratified fit must recover the hazard-raising effect")
    // the unstratified fit is dragged down by the confounded baseline
    val ru = Survival.coxPH(df, col("t"), col("e"), col("x")).head()
    assert(ru.getDouble(ru.fieldIndex("beta"))
      < r.getDouble(r.fieldIndex("beta")),
      "unstratified beta should be biased low on this fixture")
  }
}
