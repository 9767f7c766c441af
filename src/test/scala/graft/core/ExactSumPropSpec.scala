package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial fuzz coverage for the ExactSum superaccumulator: for ANY
  * finite-double multiset, the result must be the exact sum rounded once
  * (round-to-nearest, ties-to-even) and independent of order and merge
  * tree. Verified against BigDecimal (exact for binary doubles) without
  * trusting BigDecimal→double conversion: |exact − got| ≤ ulp/2, and a
  * half-ulp tie forces an even mantissa. Inputs are uniform over BIT
  * PATTERNS, which hits subnormals, extreme exponents, and odd mantissas
  * far more often than uniform-value sampling would. */
class ExactSumPropSpec extends AnyFunSuite {

  private def finiteDoubles(rnd: java.util.Random, n: Int): List[Double] =
    List.fill(n) {
      var d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      while (d.isNaN || d.isInfinite)
        d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      d
    }

  private def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)

  // java.math.BigDecimal: new BigDecimal(double) and add/subtract without a
  // MathContext are EXACT. (scala.math.BigDecimal defaults to DECIMAL128 —
  // 34 digits — which silently rounds the reference and mis-flags exact
  // half-ulp ties; that bug was caught by this very spec's first run.)
  private def jbd(x: Double) = new java.math.BigDecimal(x)

  private def checkCorrectlyRounded(xs: List[Double]): Unit = {
    val s = new ExactSum
    xs.foreach(s.add)
    val got = s.result()
    val exact = xs.foldLeft(java.math.BigDecimal.ZERO)((a, x) => a.add(jbd(x)))
    if (got.isInfinite) {
      // overflow: the exact magnitude must be ≥ the RNE-to-infinity
      // threshold (2 − 2^-53)·2^1023
      val thr = jbd(2.0).subtract(jbd(0.5).pow(53)).multiply(jbd(2.0).pow(1023))
      assert(exact.abs.compareTo(thr) >= 0, s"premature overflow: $exact")
      assert((got > 0) == (exact.signum > 0))
    } else if (exact.signum == 0) {
      assert(got == 0.0 && 1.0 / got > 0, s"exact zero must be +0.0, got $got")
    } else {
      val err = exact.subtract(jbd(got)).abs
      val halfUlp = jbd(math.ulp(math.abs(got))).divide(jbd(2.0))
      val cmp = err.compareTo(halfUlp)
      assert(cmp <= 0, s"not correctly rounded: xs=$xs got=$got err=$err")
      if (cmp == 0)
        assert((bits(got) & 1L) == 0L, s"half-ulp tie must round to even: $got")
    }
  }

  test("result is the correctly-rounded exact sum for random bit patterns") {
    val rnd = new java.util.Random(0xe5ac7)
    (1 to 500).foreach { _ =>
      checkCorrectlyRounded(finiteDoubles(rnd, rnd.nextInt(60)))
    }
  }

  test("order- and merge-tree-independence, bit for bit") {
    val rnd = new java.util.Random(0xfeed)
    (1 to 200).foreach { trial =>
      val xs = finiteDoubles(rnd, 1 + rnd.nextInt(50))
      val direct = { val s = new ExactSum; xs.foreach(s.add); s.result() }
      val sh = new scala.util.Random(rnd.nextLong()).shuffle(xs)
      val shuffled = { val s = new ExactSum; sh.foreach(s.add); s.result() }
      // random chunking into serialized partials, merged left to right
      val chunks = xs.grouped(1 + rnd.nextInt(5)).toList
      val merged = chunks.map { p =>
        val a = new ExactSum; p.foreach(a.add)
        ExactSum.deserialize(a.serialize()) // exercise serde every time
      }.reduceLeft { (a, b) => a.merge(b); a }.result()
      assert(bits(direct) == bits(shuffled), s"order-dependent, trial $trial")
      assert(bits(direct) == bits(merged), s"merge-tree-dependent, trial $trial")
    }
  }

  test("cancellation property: S ∪ −S ∪ {v} sums to exactly v") {
    val rnd = new java.util.Random(0xcafe)
    (1 to 300).foreach { trial =>
      val xs = finiteDoubles(rnd, rnd.nextInt(40))
      val v = finiteDoubles(rnd, 1).head
      val s = new ExactSum
      (xs ++ xs.map(-_) :+ v).foreach(s.add)
      val got = s.result()
      val want = if (v == 0.0) 0.0 else v // exact zero normalizes to +0.0
      assert(bits(got) == bits(want), s"cancellation failed: v=$v got=$got")
    }
  }
}
