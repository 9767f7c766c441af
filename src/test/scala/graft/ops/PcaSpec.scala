package graft.ops

import graft.SparkTestBase
import graft.core.Jacobi
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // --- Jacobi kernel -------------------------------------------------------

  test("Jacobi: hand-checked 2x2") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; eigenvectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (ev, vecs) = Jacobi.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12)
    assert(math.abs(ev(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r2) < 1e-12)
    assert(math.abs(vecs(0)(1) - r2) < 1e-12)
    // sign convention: largest |component| positive
    assert(vecs(1)(0) * vecs(1)(1) < 0)
    assert(math.max(vecs(1)(0), vecs(1)(1)) > 0)
  }

  test("Jacobi: A v = lambda v and orthonormality on a random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val d = 8
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() * 2 - 1
      a(i)(j) = x; a(j)(i) = x
    }
    val (ev, vecs) = Jacobi.symEigen(a)
    // sorted descending
    assert(ev.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    for (k <- 0 until d) {
      val v = vecs(k)
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      val resid = math.sqrt(
        (0 until d).map(i => math.pow(av(i) - ev(k) * v(i), 2)).sum)
      assert(resid < 1e-10, s"eigenpair $k residual $resid")
      for (l <- k until d) {
        val dot = (0 until d).map(i => vecs(k)(i) * vecs(l)(i)).sum
        val want = if (k == l) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-10, s"<v$k, v$l> = $dot")
      }
    }
  }

  test("Jacobi: deterministic across calls") {
    val a = Array(Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.25),
      Array(0.5, 0.25, 2.0))
    val (e1, v1) = Jacobi.symEigen(a)
    val (e2, v2) = Jacobi.symEigen(a.map(_.clone()))
    assert(e1.sameElements(e2))
    assert(v1.zip(v2).forall { case (x, y) => x.sameElements(y) })
  }

  // --- covariance + PCA over DataFrames ------------------------------------

  private def vecsDf(rows: Seq[Seq[Double]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")

  test("covarianceMatrix matches a hand two-pass computation") {
    val data = Seq(Seq(1.0, 2.0, 0.0), Seq(3.0, 0.0, 1.0),
      Seq(-1.0, 4.0, 0.5), Seq(2.0, 2.0, -0.5))
    val got = Similarity.covarianceMatrix(vecsDf(data), col("vec"))
      .orderBy("dim_a", "dim_b")
      .select("dim_a", "dim_b", "cov")
      .as[(Int, Int, Double)].collect()
    val n = data.length
    val d = data.head.length
    val mean = (0 until d).map(j => data.map(_(j)).sum / n)
    for ((i, j, cov) <- got) {
      val want = data.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      assert(math.abs(cov - want) < 1e-12, s"cov($i,$j) $cov != $want")
    }
    assert(got.length == d * (d + 1) / 2)
  }

  test("pcaFit recovers a planted dominant direction; projection variances = eigenvalues") {
    // anisotropic cloud: x along (1,1,0)/sqrt2 with sd 3, plus small noise
    val rnd = new scala.util.Random(11)
    val r2 = 1.0 / math.sqrt(2.0)
    val data = (0 until 400).map { _ =>
      val t = rnd.nextGaussian() * 3.0
      val n1 = rnd.nextGaussian() * 0.1
      val n2 = rnd.nextGaussian() * 0.1
      Seq(t * r2 + n1 * r2, t * r2 - n1 * r2, n2)
    }
    val df = vecsDf(data)
    val model = Similarity.pcaFit(df, col("vec"))
    assert(model.nRows == 400)
    // top component aligns with (1,1,0)/sqrt2
    val c0 = model.components(0)
    val align = math.abs(c0(0) * r2 + c0(1) * r2)
    assert(align > 0.999, s"alignment $align")
    // per-coordinate variance of the projection equals the eigenvalue
    val proj = df.select(
      Similarity.pcaProject(col("vec"), model).as("p"))
    val vars = proj.select(posexplode(col("p")).as(Seq("k", "x")))
      .groupBy("k").agg(var_pop(col("x")).as("v"))
      .orderBy("k").as[(Int, Double)].collect()
    vars.foreach { case (k, v) =>
      assert(math.abs(v - model.eigenvalues(k)) <
        1e-9 * math.max(1.0, model.eigenvalues(k)),
        s"component $k: var $v != eigenvalue ${model.eigenvalues(k)}")
    }
  }

  test("pcaWhiten yields unit variance and zero cross-covariance") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 300).map { _ =>
      Seq(rnd.nextGaussian() * 5 + 1, rnd.nextGaussian() * 0.5 - 2,
        rnd.nextGaussian() * 2)
    }
    val df = vecsDf(data)
    val model = Similarity.pcaFit(df, col("vec"))
    val w = df.select(Similarity.pcaWhiten(col("vec"), model).as("w"))
    val stats = Similarity.covarianceMatrix(w, col("w"))
      .select("dim_a", "dim_b", "cov").as[(Int, Int, Double)].collect()
    stats.foreach { case (i, j, c) =>
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-9, s"whitened cov($i,$j) = $c")
    }
  }

  test("pcaFit is invariant to partitioning (exact_sum moments)") {
    val data = (0 until 64).map { i =>
      Seq(math.sin(i * 0.7) * 3, math.cos(i * 1.3), (i % 7) - 3.0)
    }
    val m1 = Similarity.pcaFit(vecsDf(data).repartition(1), col("vec"))
    val m7 = Similarity.pcaFit(vecsDf(data).repartition(7), col("vec"))
    assert(m1.eigenvalues.sameElements(m7.eigenvalues))
    assert(m1.components.zip(m7.components)
      .forall { case (a, b) => a.sameElements(b) })
    assert(m1.mean.sameElements(m7.mean))
  }

  test("plain-double Gram buffer (exact=false) agrees with the exact path") {
    // d=16, 5000 rows: raw sums drift only in accumulation ulps, so the
    // double path must match the exact path to a tight relative atol —
    // and must survive a parquet-free shuffle (serialize round-trip)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian() * (1 + i % 3)))
    }
    val df = rows.toDF("id", "v").repartition(7)
    def collectM(exact: Boolean): Map[(Int, Int), (Double, Long)] =
      Similarity.covMoments(df, col("v"), exact).collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getDouble(2), r.getLong(3)))).toMap
    val e = collectM(exact = true)
    val a = collectM(exact = false)
    assert(e.keySet == a.keySet)
    e.foreach { case (k, (es, en)) =>
      val (as_, an) = a(k)
      assert(an == en)
      val tol = 1e-10 * math.max(1.0, math.abs(es))
      assert(math.abs(as_ - es) <= tol, s"cell $k: $as_ vs $es")
    }
    // pcaFit on the double path stays within atol of the exact model
    val me = Similarity.pcaFit(df, col("v"))
    val ma = Similarity.pcaFit(df, col("v"), exact = false)
    me.eigenvalues.zip(ma.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-8 * math.max(1.0, math.abs(x)))
    }
  }

  test("covMoments is ONE logical Aggregate (single corpus pass)") {
    val data = (0 until 200).map(i =>
      Seq(i * 0.5, (i % 9).toDouble, -i * 0.25))
    val out = Similarity.covMoments(vecsDf(data), col("vec"))
    out.collect()
    val nAggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggs == 1, out.queryExecution.optimizedPlan.toString)
  }

  test("covMoments fails fast on ragged vector widths; skips nulls/empties") {
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0)))
      .toDF("id", "vec")
    val ex = intercept[Exception] {
      Similarity.covarianceMatrix(ragged, col("vec")).collect()
    }
    assert(ex.getMessage != null)
    val withNulls = Seq((1L, Some(Seq(1.0, 2.0))), (2L, None),
      (3L, Some(Seq.empty[Double])), (4L, Some(Seq(3.0, 4.0))))
      .toDF("id", "vec")
    val got = Similarity.covarianceMatrix(withNulls, col("vec"))
      .where(col("dim_a") === 0 && col("dim_b") === 0).head()
    assert(got.getLong(2) == 2L) // only the two real vectors counted
  }

  test("pcaProject truncation: k components keep the top-k coordinates") {
    val data = (0 until 50).map(i =>
      Seq(i.toDouble, (i * i % 13).toDouble, -i * 0.5, (i % 5).toDouble))
    val df = vecsDf(data)
    val model = Similarity.pcaFit(df, col("vec"), k = 2)
    assert(model.components.length == 2 && model.eigenvalues.length == 2)
    val full = Similarity.pcaFit(df, col("vec"))
    assert(model.eigenvalues.sameElements(full.eigenvalues.take(2)))
    val p = df.select(size(Similarity.pcaProject(col("vec"), model))
      .as("n")).distinct().as[Int].collect()
    assert(p.sameElements(Array(2)))
  }

  // ---- orthogonal Procrustes ----

  /** Deterministic full-rank test vectors. */
  private def vecs(n: Int, d: Int): Seq[Seq[Double]] =
    (0 until n).map { i =>
      (0 until d).map(j =>
        ((graft.expr.TextHash.avalanche(i.toLong * 31 + j) % 1000L)
          / 250.0) - 2.0)
    }

  /** Apply a row-major map: out = x · W. */
  private def app(x: Seq[Double], w: Array[Array[Double]]): Seq[Double] =
    w(0).indices.map(j => x.indices.map(i => x(i) * w(i)(j)).sum)

  test("procrustesFit recovers a planted rotation exactly") {
    import spark.implicits._
    val d = 6
    // planted W: product of Givens rotations on (0,1), (2,3), (4,5)
    val r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def givens(a: Int, b: Int, c: Double, s: Double): Unit = {
      r(a)(a) = c; r(a)(b) = s; r(b)(a) = -s; r(b)(b) = c
    }
    givens(0, 1, 0.6, 0.8); givens(2, 3, 0.8, -0.6); givens(4, 5, 0.28, 0.96)
    val xs = vecs(300, d)
    val pairs = xs.map(x => (x, app(x, r))).toDF("x", "y")
    val w = Similarity.procrustesFit(pairs, col("x"), col("y"))
    val maxDiff = (for (i <- 0 until d; j <- 0 until d)
      yield math.abs(w(i)(j) - r(i)(j))).max
    assert(maxDiff < 1e-10, s"‖W − R‖∞ = $maxDiff")
    // W is orthogonal: WᵀW = I
    val orth = (for (i <- 0 until d; j <- 0 until d) yield {
      val dot = (0 until d).map(k => w(k)(i) * w(k)(j)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    assert(orth < 1e-10, s"orthogonality defect $orth")
  }

  test("procrustesAlign maps the corpus onto the target space scan-side") {
    import spark.implicits._
    val d = 4
    val r = Array(
      Array(0.0, 1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.96, 0.28), Array(0.0, 0.0, -0.28, 0.96))
    val xs = vecs(200, d)
    val pairs = xs.map(x => (x, app(x, r))).toDF("x", "y")
    val w = Similarity.procrustesFit(pairs, col("x"), col("y"))
    val resid = pairs
      .select(Similarity.procrustesAlign(col("x"), w).as("ax"), col("y"))
      .select(aggregate(zip_with(col("ax"), col("y"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, v) => acc + v)
        .as("sq"))
      .agg(max("sq")).head().getDouble(0)
    assert(resid < 1e-18, s"max residual² $resid")
    // plan is scan-only: no shuffle in the alignment projection
    val plan = pairs.select(Similarity.procrustesAlign(col("x"), w))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("procrustes degenerate inputs: empty pairs, rank-deficient tolerance") {
    import spark.implicits._
    val empty = Seq.empty[(Seq[Double], Seq[Double])].toDF("x", "y")
    assert(Similarity.procrustesFit(empty, col("x"), col("y")).isEmpty)
    // x confined to a plane in 3D: the fit still reproduces y on that
    // plane (the null direction maps to 0 by the tol rule)
    val planar = (0 until 100).map { i =>
      val x = Seq((i % 13).toDouble - 6, (i % 7).toDouble - 3, 0.0)
      (x, Seq(x(1), -x(0), 0.0))
    }.toDF("x", "y")
    val w = Similarity.procrustesFit(planar, col("x"), col("y"))
    val back = app(Seq(2.0, 1.0, 0.0), w)
    assert(math.abs(back(0) - 1.0) < 1e-10 &&
      math.abs(back(1) + 2.0) < 1e-10, back.toString)
  }
}
