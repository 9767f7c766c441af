package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Ports the reference's distribution-parameterized accuracy tests
  * (crick/tests/test_tdigest.py:9-107): quantile error asserted in q-space
  * with atol 0.012, cdf with atol 0.005, plus invariants and edge cases. */
class TDigestSpec extends AnyFunSuite {
  val N = 100000
  private def rng = new Random(42)

  private def distributions: Map[String, Array[Double]] = {
    val r = rng
    def gamma(shape: Double, scale: Double): Double = {
      // Marsaglia-Tsang for shape < 1 via boost
      if (shape < 1) {
        val u = r.nextDouble()
        gammaLarge(shape + 1, scale) * math.pow(u, 1.0 / shape)
      } else gammaLarge(shape, scale)
    }
    def gammaLarge(shape: Double, scale: Double): Double = {
      val d = shape - 1.0 / 3
      val c = 1.0 / math.sqrt(9 * d)
      var res = 0.0
      var done = false
      while (!done) {
        var x = 0.0; var v = 0.0
        do { x = r.nextGaussian(); v = 1 + c * x } while (v <= 0)
        v = v * v * v
        val u = r.nextDouble()
        if (u < 1 - 0.0331 * x * x * x * x ||
            math.log(u) < 0.5 * x * x + d * (1 - v + math.log(v))) {
          res = d * v * scale; done = true
        }
      }
      res
    }
    val seq = Array.tabulate(N)(_ * 1e-5)
    val mixed = (Array.fill(N / 2)(r.nextGaussian() * 1e-5) ++
      Array.fill(N / 2)(r.nextDouble() * 2 - 1))
    val shuffledMixed = r.shuffle(mixed.toSeq).toArray
    val step = Array.tabulate(N)(i => (i / 100).toDouble)
    Map(
      "gamma" -> Array.fill(N)(gamma(0.1, 0.1)),
      "uniform" -> Array.fill(N)(r.nextDouble()),
      "normal_narrow" -> Array.fill(N)(r.nextGaussian() * 1e-5),
      "sequential" -> seq,
      "reverse_sequential" -> seq.reverse,
      "mixed" -> shuffledMixed,
      "step" -> r.shuffle(step.toSeq).toArray,
      "sorted_step" -> step
    )
  }

  private def exactQuantile(sorted: Array[Double], q: Double): Double = {
    // numpy 'linear' interpolation quantile
    val pos = q * (sorted.length - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** q-space error: |cdf_exact(estimate) - q| (test_tdigest.py:52-69). */
  private def qSpaceError(sorted: Array[Double], est: Double, q: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (sorted(mid) < est) lo = mid + 1 else hi = mid
    }
    var hi2 = sorted.length; var lo2 = lo
    while (lo2 < hi2) {
      val mid = (lo2 + hi2) / 2
      if (sorted(mid) <= est) lo2 = mid + 1 else hi2 = mid
    }
    val rankLo = lo.toDouble / sorted.length
    val rankHi = lo2.toDouble / sorted.length
    if (q < rankLo) rankLo - q
    else if (q > rankHi) q - rankHi
    else 0.0
  }

  val probes = Array(0.001, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.999)

  test("quantile accuracy atol 0.012 in q-space across 8 distributions") {
    distributions.foreach { case (name, xs) =>
      val t = TDigest()
      xs.foreach(t.add(_))
      val sorted = xs.sorted
      probes.foreach { q =>
        val est = t.quantile(q)
        val err = qSpaceError(sorted, est, q)
        assert(err <= 0.012, s"$name q=$q est=$est err=$err")
      }
    }
  }

  test("cdf accuracy atol 0.005 across distributions") {
    distributions.foreach { case (name, xs) =>
      val t = TDigest()
      xs.foreach(t.add(_))
      val sorted = xs.sorted
      probes.foreach { q =>
        val x = exactQuantile(sorted, q)
        val est = t.cdf(x)
        val exact = sorted.count(_ <= x).toDouble / sorted.length
        assert(math.abs(est - exact) <= 0.005, s"$name x=$x est=$est exact=$exact")
      }
    }
  }

  test("invariants: quantiles monotone within [min,max]; cdf within [0,1]") {
    val r = rng
    val xs = Array.fill(10000)(r.nextGaussian())
    val t = TDigest()
    xs.foreach(t.add(_))
    val qs = (0 to 100).map(_ / 100.0).toArray
    val vals = t.quantiles(qs)
    vals.sliding(2).foreach(p => assert(p(0) <= p(1)))
    assert(vals.head >= xs.min && vals.last <= xs.max)
    xs.take(100).foreach { x =>
      val c = t.cdf(x)
      assert(c >= 0 && c <= 1)
    }
  }

  test("edge cases: empty, single, q<=0/q>=1 (test_tdigest.py:129-152)") {
    val empty = TDigest()
    assert(empty.quantile(0.5).isNaN && empty.cdf(1.0).isNaN)
    assert(empty.minOrNaN.isNaN && empty.maxOrNaN.isNaN)
    assert(empty.totalSize == 0)

    val single = TDigest()
    single.add(3.5)
    assert(single.quantile(0.5) == 3.5)
    assert(single.quantile(-1) == 3.5 && single.quantile(2) == 3.5)
    assert(single.cdf(3.4) == 0.0 && single.cdf(3.6) == 1.0 && single.cdf(3.5) == 0.5)

    val t = TDigest()
    Array(1.0, 2.0, 3.0).foreach(t.add(_))
    assert(t.quantile(0) == 1.0 && t.quantile(1) == 3.0)
  }

  test("non-finite x and tiny weights are dropped (tdigest_stubs.c:283-286)") {
    val t = TDigest()
    t.add(Double.NaN); t.add(Double.PositiveInfinity); t.add(Double.NegativeInfinity)
    t.add(1.0, 1e-18) // w <= DBL_EPSILON dropped
    assert(t.totalSize == 0)
    t.add(1.0)
    assert(t.totalSize == 1.0)
  }

  test("merge of split streams within tolerance; min/max folded") {
    val r = rng
    val xs = Array.fill(N)(r.nextDouble())
    val sorted = xs.sorted
    val parts = xs.grouped(N / 8).toArray
    val digests = parts.map { p => val t = TDigest(); p.foreach(t.add(_)); t }
    val merged = TDigest()
    digests.foreach(merged.merge)
    assert(merged.minOrNaN == xs.min && merged.maxOrNaN == xs.max)
    assert(math.abs(merged.totalSize - N) < 1e-6)
    probes.foreach { q =>
      val err = qSpaceError(sorted, merged.quantile(q), q)
      assert(err <= 0.02, s"q=$q err=$err") // merged tree slightly looser
    }
  }

  test("scale multiplies weights and drops ~zero centroids (tdigest_stubs.c:609-629)") {
    val t = TDigest()
    (1 to 1000).foreach(i => t.add(i.toDouble))
    val q50 = t.quantile(0.5)
    t.scaleInPlace(2.5)
    assert(math.abs(t.totalSize - 2500.0) < 1e-9)
    assert(math.abs(t.quantile(0.5) - q50) < 1e-9) // scaling preserves shape
    t.scaleInPlace(1e-20) // all weights now <= eps
    assert(t.totalSize == 0.0)
  }

  test("histogram: sums to size, edges exact (tdigest.pyx:165-229)") {
    val r = rng
    val xs = Array.fill(10000)(r.nextDouble() * 100)
    val t = TDigest()
    xs.foreach(t.add(_))
    val edges = t.histogramEdges(20)
    assert(edges.length == 21)
    assert(edges.head == xs.min && edges.last == xs.max)
    val hist = t.histogram(edges)
    assert(math.abs(hist.sum - 10000.0) < 1e-6)
    assert(hist.forall(_ >= -1e-9))
    // degenerate range widened ±0.5
    val one = TDigest(); one.add(7.0)
    val e1 = one.histogramEdges(10)
    assert(e1.head == 6.5 && e1.last == 7.5)
  }

  test("serialization round-trip preserves queries and allows further adds") {
    val r = rng
    val xs = Array.fill(10000)(r.nextGaussian())
    val t = TDigest()
    xs.foreach(t.add(_))
    val bytes = t.serialize()
    val t2 = TDigest.deserialize(bytes)
    probes.foreach(q => assert(t.quantile(q) == t2.quantile(q)))
    assert(t2.serialize().toSeq == bytes.toSeq)
    t2.add(0.0)
    assert(t2.totalSize == t.totalSize + 1)
  }

  test("compression clipping and buffer sizing (tdigest_stubs.c:57-66)") {
    assert(TDigest(5.0).compression == 20.0)
    assert(TDigest(5000.0).compression == 1000.0)
    val t = TDigest(100.0)
    assert(t.size == 200 && t.bufferSize == 42)
  }

  test("fastAsin within 2 ulp of Math.asin across the domain") {
    var i = -100000
    while (i <= 100000) {
      val x = i / 100000.0
      val a = TDigest.fastAsin(x)
      val b = math.asin(x)
      assert(math.abs(a - b) <= 2 * math.ulp(b), s"x=$x: $a vs $b")
      i += 1
    }
    assert(TDigest.fastAsin(1.0) == math.asin(1.0))
    assert(TDigest.fastAsin(-1.0) == math.asin(-1.0))
    assert(TDigest.fastAsin(Double.NaN).isNaN && TDigest.fastAsin(1.5).isNaN)
  }
}
