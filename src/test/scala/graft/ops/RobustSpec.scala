package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Robust per-group statistics (Robust.medianMad / robustZ / outliers /
  * quantileBand). */
class RobustSpec extends SparkTestBase {

  /** Sequential reference median with linear interpolation at (n−1)·q —
    * the percentile/quantile_cont convention. */
  private def refQuantile(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val pos = (s.size - 1) * q
    val lo = pos.toInt
    if (lo == s.size - 1) s(lo)
    else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
  }

  private val data: Seq[(String, Double)] =
    Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0, "a" -> 100.0,
      "b" -> 10.0, "b" -> 12.0, "b" -> 14.0,
      "c" -> 5.0, "c" -> 5.0, "c" -> 5.0)

  test("medianMad exact matches the sequential reference per group") {
    import spark.implicits._
    val df = data.toDF("g", "x")
    val got = Robust.medianMad(df, Seq("g"), col("x"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val xs = rows.map(_._2)
      val med = refQuantile(xs, 0.5)
      val mad = refQuantile(xs.map(x => math.abs(x - med)), 0.5)
      assert(got(g) == ((med, mad)), s"group $g")
    }
    // spot values: a -> med 3, deviations {2,1,0,1,97} -> mad 1
    assert(got("a") == ((3.0, 1.0)))
    assert(got("c") == ((5.0, 0.0)))
  }

  test("outliers: the planted extreme is flagged; constant group never is") {
    import spark.implicits._
    val df = data.toDF("g", "x")
    val out = Robust.outliers(df, Seq("g"), col("x"), 3.5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    // a: z(100) = 97/1.4826 = 65.4 -> out; z(1)=2/1.4826=1.35 -> in
    assert(out == Set("a" -> 100.0))
    // c has MAD 0: z is NULL there, never an outlier — and robustZ says so
    val zc = Robust.robustZ(df, Seq("g"), col("x"), "z")
      .where(col("g") === "c").select("z").collect()
    assert(zc.forall(_.isNullAt(0)))
  }

  test("quantileBand trims exactly at the interpolated edges, inclusive") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "x")
    val kept = Robust.quantileBand(df, Seq("g"), col("x"), 0.05, 0.90)
      .select("x").collect().map(_.getDouble(0)).sorted
    // p05 of 1..100 = 1 + 99*0.05 = 5.95; p90 = 1 + 99*0.9 = 90.1
    assert(kept.head == 6.0 && kept.last == 90.0)
    assert(kept.length == 85)
  }

  test("sketch path tracks exact within digest tolerance and scales keys") {
    import spark.implicits._
    // two groups with different spreads; 20k rows each
    val df = (0 until 40000).map { i =>
      val g = if (i % 2 == 0) "u" else "n"
      val x = if (g == "u") (i % 1000).toDouble
        else 500.0 + ((i * 2654435761L) % 97).toDouble / 10.0
      (g, x)
    }.toDF("g", "x")
    val exact = Robust.medianMad(df, Seq("g"), col("x"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val approx = Robust.medianMad(df, Seq("g"), col("x"), approx = true)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    exact.foreach { case (g, (med, mad)) =>
      val (amed, amad) = approx(g)
      val tolMed = math.max(1e-9, math.abs(med) * 0.02)
      assert(math.abs(amed - med) <= tolMed, s"$g med $amed vs $med")
      assert(math.abs(amad - mad) <= math.max(0.5, mad * 0.05),
        s"$g mad $amad vs $mad")
    }
  }

  test("corrMatrix: hand-checked values, self-corr 1, constant col null") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0),
      (4.0, 7.0, 5.0)).toDF("x", "y", "c")
    val got = Profile.corrMatrix(df, Seq("x", "y", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("x", "x")) == Some(1.0))
    assert(got(("y", "y")) == Some(1.0))
    // x=1..4, y=2,4,6,7: corr = cov/sd — sequential reference
    val xs = Seq(1.0, 2.0, 3.0, 4.0); val ys = Seq(2.0, 4.0, 6.0, 7.0)
    val n = 4.0
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val den = math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
      math.sqrt(n * ys.map(b => b * b).sum - ys.sum * ys.sum)
    assert(math.abs(got(("x", "y")).get - num / den) < 1e-12)
    // constant column: zero variance -> null, for self and cross pairs
    assert(got(("c", "c")).isEmpty && got(("x", "c")).isEmpty)
    // listwise deletion: a null row drops from EVERY pair's n
    val withNull = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 2.0, 1.0), (2.0, 4.0, null), (3.0, 6.0, 2.0))
      .toDF("x", "y", "c")
    val m2 = Profile.corrMatrix(withNull, Seq("x", "y", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(m2(("x", "y")).get - 1.0) < 1e-12) // 2 rows, perfectly linear
  }

  test("reserved/duplicate column guards fail fast") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 0.0)).toDF("g", "x", "mad")
    intercept[IllegalArgumentException] {
      Robust.medianMad(df, Seq("g"), col("x"))
    }
    val ok = Seq(("a", 1.0)).toDF("g", "x")
    intercept[IllegalArgumentException] {
      Robust.robustZ(ok, Seq("g"), col("x"), "x")
    }
    intercept[IllegalArgumentException] {
      Robust.quantileBand(ok, Seq("g"), col("x"), 0.6, 0.4)
    }
  }

  test("trimmedMean: drops the tails, winsorize clamps them") {
    import spark.implicits._
    val df = (Seq(100.0) ++ (1 to 7).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("g", "v", "id")
    val r = Robust.trimmedMean(df, Seq("g"), col("v"), col("id"),
      trim = 0.125).collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 8L)
    assert(r.getLong(r.fieldIndex("k_trim")) == 1L)
    // sorted: 1..7,100; band = ranks 2..7 = values 2..7 -> mean 4.5
    assert(r.getDouble(r.fieldIndex("trimmed_mean")) == 4.5)
    // winsorized: (27 + 1*2 + 1*7)/8 = 4.5 — the 100 clamps to 7
    assert(r.getDouble(r.fieldIndex("winsorized_mean")) == 4.5)
    // trim that floors to k=0 keeps everything
    val tiny = Seq(("h", 1.0, 1L), ("h", 2.0, 2L))
      .toDF("g", "v", "id")
    val t = Robust.trimmedMean(tiny, Seq("g"), col("v"), col("id"),
      trim = 0.4).collect()(0)
    assert(t.getDouble(t.fieldIndex("trimmed_mean")) == 1.5)
  }

  test("hillTailIndex: exact Pareto tail recovers its exponent") {
    import spark.implicits._
    // x_i = (N/i)^(1/a) is an exact Pareto(a) quantile grid
    val a = 2.0
    val n = 400
    val df = (1 to n).map(i => ("g",
      math.pow(n.toDouble / i, 1.0 / a), i.toLong))
      .toDF("g", "v", "id")
    val r = Robust.hillTailIndex(df, Seq("g"), col("v"), col("id"),
      k = 50).collect()(0)
    val alpha = r.getDouble(r.fieldIndex("alpha_hat"))
    assert(math.abs(alpha - a) < 0.3, s"alpha_hat = $alpha")
    // constant tail -> no tail to measure
    val const = (1 to 40).map(i => ("h", 5.0, i.toLong))
      .toDF("g", "v", "id")
    val c = Robust.hillTailIndex(const, Seq("g"), col("v"), col("id"),
      k = 10).collect()(0)
    assert(c.isNullAt(c.fieldIndex("alpha_hat")))
  }
  test("quantileNormalizeExact: hand mapping and identity") {
    import spark.implicits._
    val src = Seq(1.0, 2.0, 3.0).toDF("x")
    val tgt = Seq(10.0, 20.0, 30.0).toDF("x")
    val got = Robust.quantileNormalizeExact(src, col("x"), tgt, col("x"))
      .orderBy("value").collect()
      .map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(got == Map(1.0 -> 10.0, 2.0 -> 20.0, 3.0 -> 30.0))
    // self-normalization is the identity, duplicates included
    val dup = Seq(1.0, 1.0, 2.0, 5.0).toDF("x")
    val id = Robust.quantileNormalizeExact(dup, col("x"), dup, col("x"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2))
    assert(id.forall { case (v, m) => v == m })
  }

  test("percentileRank: ties count as <=, below-min is 0, NULL probes " +
      "stay NULL") {
    import spark.implicits._
    val ref = Seq(1.0, 2.0, 2.0, 5.0).toDF("x")
    val probes = Seq[java.lang.Double](0.0, 1.0, 2.0, 3.0, 5.0, 9.0, null)
      .toDF("v")
    val got = Robust.percentileRank(ref, col("x"), probes, col("v"))
      .collect().map(r => Option(r.get(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(Some(0.0)) == Some(0.0))
    assert(got(Some(1.0)) == Some(0.25))
    assert(got(Some(2.0)) == Some(0.75))
    assert(got(Some(3.0)) == Some(0.75))
    assert(got(Some(5.0)) == Some(1.0))
    assert(got(Some(9.0)) == Some(1.0))
    assert(got(None) == None)
  }

  test("quantileNormalizeSketch tracks the exact arm within digest " +
      "cdf error (the q328 receipt, asserted at spec grain)") {
    import spark.implicits._
    val src = (0 until 400).map(i => ((i * 37 % 211) + 1).toDouble).toDF("x")
    val tgt = (0 until 500).map(i => ((i * 53 % 307) * 3 + 2).toDouble).toDF("x")
    val ex = Robust.quantileNormalizeExact(src, col("x"), tgt, col("x"))
    val sk = Robust.quantileNormalizeSketch(src, col("x"), tgt, col("x"))
      .select(col("value"), col("mapped").as("msk"))
    val j = ex.join(sk, Seq("value"))
    val both = Robust.percentileRank(tgt, col("x"),
      Robust.percentileRank(tgt, col("x"), j, col("mapped"), "ce"),
      col("msk"), "cs")
    val worst = both.agg(max(abs(col("cs") - col("ce")))).head.getDouble(0)
    assert(worst < 0.05, s"target-cdf displacement $worst >= 0.05")
  }

  test("hodgesLehmann: hand-worked pairwise-difference medians; brute " +
      "agreement with multiplicities; empty side; pair guard") {
    import spark.implicits._
    // A={1,2}, B={5,7}: diffs sorted -6,-5,-4,-3 -> lower median -5
    val df = Seq((1.0, true), (2.0, true), (5.0, false), (7.0, false))
      .toDF("v", "a")
    val r = Robust.hodgesLehmann(df, col("v"), col("a")).head()
    assert(r.getDouble(r.fieldIndex("hl")) == -5.0)
    // multiplicities: A={0,0,2}, B={1}: diffs -1 (w2), 1 (w1) -> -1
    val t = Seq((0.0, true), (0.0, true), (2.0, true), (1.0, false))
      .toDF("v", "a")
    val rt = Robust.hodgesLehmann(t, col("v"), col("a")).head()
    assert(rt.getDouble(rt.fieldIndex("hl")) == -1.0)
    // brute agreement on a mixed lattice
    val as = (1 to 35).map(i => ((i * 13) % 9).toDouble)
    val bs = (1 to 27).map(i => ((i * 5) % 11).toDouble)
    val big = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "a")
    val rb = Robust.hodgesLehmann(big, col("v"), col("a")).head()
    val diffs = (for (x <- as; y <- bs) yield x - y).sorted
    val lower = diffs((diffs.length - 1) / 2)
    assert(rb.getDouble(rb.fieldIndex("hl")) == lower)
    // one empty side: hl NULL
    val e = Seq((1.0, true)).toDF("v", "a")
    val re = Robust.hodgesLehmann(e, col("v"), col("a")).head()
    assert(re.isNullAt(re.fieldIndex("hl")))
    intercept[IllegalArgumentException] {
      Robust.hodgesLehmann(big, col("v"), col("a"), maxCellPairs = 3L)
    }
  }

  test("poissonBootstrapRatioCI: den=1 reproduces the mean bootstrap " +
      "exactly; ratio point = sum/sum; zero-den replicates dropped") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      ("g", i.toLong, ((i * 13) % 47 + 1).toDouble))
    val df = rows.toDF("g", "id", "v").withColumn("one", lit(1.0))
    val rr = Robust.poissonBootstrapRatioCI(df, Seq("g"), col("id"),
      col("v"), col("one")).head()
    val rm = Robust.poissonBootstrapCI(df, Seq("g"), col("id"),
      col("v")).head()
    assert(rr.getDouble(rr.fieldIndex("ci_lo"))
      == rm.getDouble(rm.fieldIndex("ci_lo")))
    assert(rr.getDouble(rr.fieldIndex("ci_hi"))
      == rm.getDouble(rm.fieldIndex("ci_hi")))
    assert(rr.getLong(rr.fieldIndex("b_used"))
      == rm.getLong(rm.fieldIndex("b_used")))
    assert(rr.getDouble(rr.fieldIndex("ratio"))
      == rows.map(_._3).sum / 200.0)
    // a real ratio: point = sum(num)/sum(den), CI brackets it
    val two = rows.map { case (g, id, v) => (g, id, v, v + 3.0) }
      .toDF("g", "id", "num", "den")
    val r2 = Robust.poissonBootstrapRatioCI(two, Seq("g"), col("id"),
      col("num"), col("den")).head()
    val pt = rows.map(_._3).sum / rows.map(_._3 + 3.0).sum
    assert(r2.getDouble(r2.fieldIndex("ratio")) == pt)
    assert(r2.getDouble(r2.fieldIndex("ci_lo")) <= pt &&
      pt <= r2.getDouble(r2.fieldIndex("ci_hi")))
  }

  test("theilSen: exact line recovered; outlier robustness; brute " +
      "lower-median agreement; vertical-only group NULL; size guard") {
    import spark.implicits._
    // perfect line y = 3x + 1 -> every pairwise slope is exactly 3
    val line = (1 to 20).map(i => ("a", i.toDouble, 3.0 * i + 1))
    val rl = Robust.theilSen(line.toDF("g", "x", "y"), col("g"),
      col("x"), col("y")).head()
    assert(rl.getDouble(rl.fieldIndex("slope")) == 3.0)
    assert(rl.getLong(rl.fieldIndex("n_pairs")) == 190L)
    // one wild outlier barely moves the median slope
    val out = line :+ (("a", 21.0, 1000.0))
    val ro = Robust.theilSen(out.toDF("g", "x", "y"), col("g"),
      col("x"), col("y")).head()
    assert(ro.getDouble(ro.fieldIndex("slope")) == 3.0)
    // brute agreement on a noisy lattice, per group
    val pts = (1 to 40).map(i => ("b", (i % 13).toDouble,
      (2 * (i % 13) + (i * 7) % 5).toDouble))
    val rb = Robust.theilSen(pts.toDF("g", "x", "y"), col("g"),
      col("x"), col("y")).head()
    val slopes = (for {
      (_, x1, y1) <- pts; (_, x2, y2) <- pts; if x1 < x2
    } yield (y2 - y1) / (x2 - x1)).sorted
    assert(rb.getDouble(rb.fieldIndex("slope"))
      == slopes((slopes.length - 1) / 2))
    // all x equal: no usable pair -> NULL slope, n_pairs 0
    val vert = Seq(("c", 1.0, 2.0), ("c", 1.0, 5.0)).toDF("g", "x", "y")
    val rv = Robust.theilSen(vert, col("g"), col("x"), col("y")).head()
    assert(rv.isNullAt(rv.fieldIndex("slope")))
    assert(rv.getLong(rv.fieldIndex("n_pairs")) == 0L)
    intercept[IllegalArgumentException] {
      Robust.theilSen(pts.toDF("g", "x", "y"), col("g"), col("x"),
        col("y"), maxGroupRows = 5L)
    }
  }
}
