package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Poisson bootstrap CI (Robust.poissonBootstrapCI / poissonWeight). */
class BootstrapSpec extends SparkTestBase {

  test("poissonWeight matches the CDF table edge for edge") {
    import spark.implicits._
    // probe just below and at each threshold
    val probes = Robust.PoissonOneCdf.zipWithIndex.flatMap { case (c, k) =>
      Seq((c - 1e-12, k.toLong), (c, k + 1L))
    } :+ ((0.9999999, 8L))
    val got = probes.map(_._1).toDF("u")
      .select(col("u"), Robust.poissonWeight(col("u")).as("w"))
      .collect().map(r => r.getDouble(0) -> r.getInt(1).toLong).toMap
    probes.foreach { case (u, exp) =>
      assert(got(u) == exp, s"u=$u")
    }
  }

  test("replicate weights average ~1 and means bracket the truth") {
    import spark.implicits._
    val df = (1 to 400).map(i => ("g", i.toLong, (i % 97).toDouble))
      .toDF("g", "id", "x")
    val out = Robust.poissonBootstrapCI(df, Seq("g"), col("id"), col("x"),
      replicates = 32).collect()(0)
    val n = out.getLong(out.fieldIndex("n_rows"))
    val mean = out.getDouble(out.fieldIndex("mean"))
    val lo = out.getDouble(out.fieldIndex("ci_lo"))
    val hi = out.getDouble(out.fieldIndex("ci_hi"))
    assert(n == 400L)
    assert(lo <= mean && mean <= hi, s"$lo <= $mean <= $hi")
    assert(hi - lo > 0.0 && hi - lo < 20.0) // sane width for sd~28/sqrt(400)
    assert(out.getLong(out.fieldIndex("b_used")) == 32L)
  }

  test("bit-identical under repartitioning and across runs") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong, (i * 7 % 113).toDouble))
      .toDF("g", "id", "x")
    val a = Robust.poissonBootstrapCI(df.repartition(7), Seq("g"),
      col("id"), col("x")).orderBy("g").collect().toSeq
    val b = Robust.poissonBootstrapCI(df.coalesce(1), Seq("g"),
      col("id"), col("x")).orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("nearest-rank picks: alpha edges on a tiny replicate count") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "x")
    // B=4, alpha=0.5 -> klo=ceil(1)=1 (min), khi=ceil(3)=3rd smallest
    val out = Robust.poissonBootstrapCI(df, Seq("g"), col("id"), col("x"),
      replicates = 4, alpha = 0.5).collect()(0)
    assert(out.getDouble(out.fieldIndex("ci_lo")) <=
      out.getDouble(out.fieldIndex("ci_hi")))
  }

  test("coverage: CI of the mean covers truth on most synthetic groups") {
    import spark.implicits._
    // 20 groups of 200 draws from a known deterministic pattern with
    // mean 49.5 + g; a 95% CI should cover the true mean for >= 16/20
    val rows = for (g <- 0 until 20; i <- 0 until 200)
      yield (s"g$g", (g * 1000 + i).toLong, ((i * 37) % 100).toDouble + g)
    val df = rows.toDF("g", "id", "x")
    val out = Robust.poissonBootstrapCI(df, Seq("g"), col("id"), col("x"))
      .collect()
    val covered = out.count { r =>
      val g = r.getString(0).drop(1).toInt
      val truth = (0 until 200).map(i => ((i * 37) % 100).toDouble + g)
        .sum / 200.0
      r.getDouble(r.fieldIndex("ci_lo")) <= truth &&
        truth <= r.getDouble(r.fieldIndex("ci_hi"))
    }
    assert(covered >= 16, s"covered only $covered/20")
  }

  test("pairedBootstrapTest: clear winner vs coin flip, determinism") {
    import spark.implicits._
    // g_win: A beats B by 5 on every row -> every replicate mean > 0
    // g_tie: d alternates ±1 -> p_sign lands in the interior
    val df = ((0 until 200).map(i => ("g_win", i.toLong, 10.0, 5.0)) ++
      (0 until 200).map(i => ("g_tie", (1000 + i).toLong,
        if (i % 2 == 0) 1.0 else 0.0, if (i % 2 == 0) 0.0 else 1.0)))
      .toDF("g", "id", "a", "b")
    val got = Robust.pairedBootstrapTest(df, Seq("g"), col("id"),
        col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val w = got("g_win")
    assert(w.getLong(w.fieldIndex("n")) == 200L)
    assert(w.getDouble(w.fieldIndex("mean_diff")) == 5.0)
    assert(w.getLong(w.fieldIndex("reps_le0")) == 0L)
    assert(w.getDouble(w.fieldIndex("p_sign")) == 0.0)
    val t = got("g_tie")
    assert(t.getDouble(t.fieldIndex("mean_diff")) == 0.0)
    val p = t.getDouble(t.fieldIndex("p_sign"))
    assert(p > 0.1 && p < 0.9, s"tie p_sign = $p")
    // bit-identical under repartitioning
    val again = Robust.pairedBootstrapTest(df.repartition(7), Seq("g"),
        col("id"), col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(got.keySet.forall(k => got(k).toSeq == again(k)))
  }
}
