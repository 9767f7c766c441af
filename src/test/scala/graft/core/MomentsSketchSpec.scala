package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Ports the reference's stats oracle tests (crick/tests/test_stats.py):
  * numpy/scipy nan-aggregates comparison, merge equivalence, degenerate sets. */
class MomentsSketchSpec extends AnyFunSuite {
  private def naive(xs: Array[Double]) = {
    val v = xs.filterNot(_.isNaN)
    val n = v.length
    val mean = v.sum / n
    val m2 = v.map(x => math.pow(x - mean, 2)).sum / n
    val m3 = v.map(x => math.pow(x - mean, 3)).sum / n
    val m4 = v.map(x => math.pow(x - mean, 4)).sum / n
    (n, mean, m2, m3, m4)
  }

  private def build(xs: Array[Double]): MomentsSketch = {
    val s = new MomentsSketch
    xs.foreach(s.add(_))
    s
  }

  test("matches direct two-pass computation with NaNs skipped") {
    val rng = new Random(42)
    val xs = Array.fill(10000)(rng.nextGaussian() * 100 + 50)
    // inject NaNs like test_stats.py:9-11
    (0 until 1000).foreach(_ => xs(rng.nextInt(xs.length)) = Double.NaN)
    val s = build(xs)
    val (n, mean, m2, m3, m4) = naive(xs)
    assert(s.count == n)
    assert(math.abs(s.mean - mean) < 1e-9 * math.abs(mean))
    assert(math.abs(s.variance(0) - m2) < 1e-6 * m2)
    assert(math.abs(s.variance(1) - m2 * n / (n - 1)) < 1e-6 * m2)
    val skewBiased = m3 / math.pow(m2, 1.5)
    val kurtBiased = m4 / (m2 * m2) - 3
    assert(math.abs(s.skew(bias = true) - skewBiased) < 1e-6)
    assert(math.abs(s.kurt(fisher = true, bias = true) - kurtBiased) < 1e-6)
    // bias-corrected variants (scipy formulas, test_stats.py:57-88)
    val nn = n.toDouble
    val skewUnbiased = math.sqrt(nn * (nn - 1)) / (nn - 2) * skewBiased
    assert(math.abs(s.skew(bias = false) - skewUnbiased) < 1e-6)
    val g2 = m4 / (m2 * m2)
    val kurtUnbiased = ((nn * nn - 1) * g2 - 9 * nn + 15) / ((nn - 2) * (nn - 3))
    assert(math.abs(s.kurt(fisher = true, bias = false) - (kurtUnbiased - 3)) < 1e-6)
    assert(math.abs(s.kurt(fisher = false, bias = true) - g2) < 1e-6)
  }

  test("split-stream merge equals single stream (test_stats.py:148-165)") {
    val rng = new Random(7)
    val xs = Array.fill(5000)(rng.nextDouble() * 10)
    val whole = build(xs)
    val (a, b) = xs.splitAt(1234)
    val sa = build(a); val sb = build(b)
    sa.merge(sb)
    assert(sa.count == whole.count)
    assert(math.abs(sa.sum - whole.sum) < 1e-8)
    assert(math.abs(sa.m2 - whole.m2) < 1e-6 * whole.m2)
    assert(math.abs(sa.m3 - whole.m3) < 1e-5 * math.abs(whole.m3).max(1.0))
    assert(math.abs(sa.m4 - whole.m4) < 1e-6 * whole.m4)
    assert(sa.min == whole.min && sa.max == whole.max)
  }

  test("merge with empty is a no-op in both directions (test_stats.py:167-179)") {
    val s = build(Array(1.0, 2.0, 3.0))
    val e = new MomentsSketch
    val before = s.serialize().toSeq
    s.merge(new MomentsSketch)
    assert(s.serialize().toSeq == before)
    e.merge(s)
    assert(e.count == 3 && math.abs(e.mean - 2.0) < 1e-12)
  }

  test("degenerate sets (test_stats.py:13-18)") {
    val empty = new MomentsSketch
    assert(empty.mean.isNaN && empty.minOrNaN.isNaN && empty.maxOrNaN.isNaN)
    assert(empty.skew(bias = true).isNaN) // homogeneous

    val single = build(Array(1.0))
    assert(single.mean == 1.0 && single.variance(0) == 0.0)
    assert(single.skew(bias = true).isNaN) // homogeneous

    val homog = build(Array(1.0, 1.0))
    assert(homog.homogeneous && homog.skew(bias = true).isNaN &&
      homog.kurt(fisher = true, bias = true).isNaN)

    val pair = build(Array(1.0, 2.0))
    assert(!pair.homogeneous && !pair.skew(bias = true).isNaN)
  }

  test("all-negative stream reports correct max (divergence fix, SURVEY §7.4)") {
    val s = build(Array(-5.0, -3.0, -10.0))
    assert(s.maxOrNaN == -3.0)
  }

  test("weighted add means count repeats") {
    val s = new MomentsSketch
    s.add(2.0, 3); s.add(4.0, 1)
    val direct = build(Array(2.0, 2.0, 2.0, 4.0))
    assert(s.count == direct.count)
    assert(math.abs(s.mean - direct.mean) < 1e-12)
    assert(math.abs(s.m2 - direct.m2) < 1e-9)
  }

  test("serialization round-trip preserves state and allows further updates") {
    val s = build(Array(1.0, 2.0, 3.0, 4.0))
    val r = MomentsSketch.deserialize(s.serialize())
    assert(r.serialize().toSeq == s.serialize().toSeq)
    r.add(5.0)
    val direct = build(Array(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(math.abs(r.m2 - direct.m2) < 1e-9)
  }
}
