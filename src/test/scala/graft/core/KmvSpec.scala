package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.TextHash
import scala.util.Random

/** KMV kernel: exactness below k, estimator accuracy, monoid laws, serde,
  * jaccard against exact set computation. */
class KmvSpec extends AnyFunSuite {

  private def trials(n: Int)(body: Random => Unit): Unit =
    (0 until n).foreach(i => body(new Random(i * 7919 + 3)))

  test("exact below k: estimate equals true distinct count") {
    trials(5) { rnd =>
      val k = 64 + rnd.nextInt(200)
      val vals = Seq.fill(rnd.nextInt(k))(rnd.nextLong())
      val s = new KmvSketch(k)
      vals.foreach(v => s.add(TextHash.avalanche(v)))
      assert(s.isExact)
      assert(s.estimateDistinct == vals.map(TextHash.avalanche).distinct.size.toDouble)
    }
  }

  test("estimator accuracy: 100k distinct at k=1024 within 3/sqrt(k)") {
    val k = 1024
    val s = new KmvSketch(k)
    (1L to 100000L).foreach(v => s.add(TextHash.avalanche(v)))
    val est = s.estimateDistinct
    val rel = math.abs(est - 100000.0) / 100000.0
    assert(rel < 3.0 / math.sqrt(k), s"est=$est rel=$rel")
  }

  test("monoid laws: merge ≡ single stream, any split, idempotent re-merge") {
    trials(5) { rnd =>
      val k = 32 + rnd.nextInt(100)
      val vals = Seq.fill(500 + rnd.nextInt(1000))(
        TextHash.avalanche(rnd.nextInt(400).toLong))
      val single = new KmvSketch(k)
      vals.foreach(single.add(_))
      val cut = rnd.nextInt(vals.length + 1)
      val (l, r) = vals.splitAt(cut)
      val a = new KmvSketch(k); l.foreach(a.add(_))
      val b = new KmvSketch(k); r.foreach(b.add(_))
      a.merge(b)
      assert(a.values.toSeq == single.values.toSeq, "split-merge differs")
      // idempotent: merging the same sketch again changes nothing (sets)
      a.merge(b)
      assert(a.values.toSeq == single.values.toSeq, "re-merge not idempotent")
      // commutative
      val a2 = new KmvSketch(k); r.foreach(a2.add(_))
      val b2 = new KmvSketch(k); l.foreach(b2.add(_))
      a2.merge(b2)
      assert(a2.values.toSeq == single.values.toSeq, "merge not commutative")
    }
  }

  test("serde roundtrip preserves state and estimates") {
    trials(3) { rnd =>
      val k = 16 + rnd.nextInt(64)
      val s = new KmvSketch(k)
      (0 until rnd.nextInt(500)).foreach(_ => s.add(rnd.nextLong()))
      val back = KmvSketch.deserialize(s.serialize())
      assert(back.k == s.k && back.values.toSeq == s.values.toSeq)
      assert(back.estimateDistinct == s.estimateDistinct)
    }
  }

  test("jaccard: exact on small sets, bounded error on large overlap") {
    // exact regime: both sketches exact, union fits k
    val k = 4096
    val a = new KmvSketch(k); val b = new KmvSketch(k)
    val setA = (1L to 600L).toSet
    val setB = (401L to 1000L).toSet
    setA.foreach(v => a.add(TextHash.avalanche(v)))
    setB.foreach(v => b.add(TextHash.avalanche(v)))
    val exact = (setA & setB).size.toDouble / (setA | setB).size
    assert(math.abs(KmvSketch.jaccard(a, b) - exact) < 1e-15)
    // sampled regime: 50k ∪ 50k with 25k overlap at k=1024 → ±3/sqrt(k)
    val k2 = 1024
    val a2 = new KmvSketch(k2); val b2 = new KmvSketch(k2)
    (1L to 50000L).foreach(v => a2.add(TextHash.avalanche(v)))
    (25001L to 75000L).foreach(v => b2.add(TextHash.avalanche(v)))
    val est = KmvSketch.jaccard(a2, b2)
    val truth = 25000.0 / 75000.0
    assert(math.abs(est - truth) < 3.0 / math.sqrt(k2), s"est=$est truth=$truth")
  }

  test("setOps: exact mode returns true set sizes, jaccard, zero se") {
    val k = 4096
    val a = new KmvSketch(k); val b = new KmvSketch(k)
    val setA = (1L to 600L).toSet
    val setB = (401L to 1000L).toSet
    setA.foreach(v => a.add(TextHash.avalanche(v)))
    setB.foreach(v => b.add(TextHash.avalanche(v)))
    val r = KmvSketch.setOps(a, b)
    assert(r.exact)
    assert(r.aD == setA.size.toDouble && r.bD == setB.size.toDouble)
    assert(r.unionD == (setA | setB).size.toDouble)
    assert(r.intersectD == (setA & setB).size.toDouble)
    assert(math.abs(r.jaccard -
      (setA & setB).size.toDouble / (setA | setB).size) < 1e-15)
    assert(math.abs(r.containA -
      (setA & setB).size.toDouble / setA.size) < 1e-15)
    assert(math.abs(r.containB -
      (setA & setB).size.toDouble / setB.size) < 1e-15)
    assert(r.unionSe == 0.0 && r.intersectSe == 0.0)
    // empty ∪ empty
    val r0 = KmvSketch.setOps(new KmvSketch(16), new KmvSketch(16))
    assert(r0.exact && r0.unionD == 0.0 && r0.intersectD == 0.0 &&
      r0.jaccard == 1.0)
  }

  test("setOps: sampled estimates land within their own error bounds") {
    // 50k ∪ 50k with 25k overlap at k=1024; true union 75k, intersect 25k
    val k = 1024
    val a = new KmvSketch(k); val b = new KmvSketch(k)
    (1L to 50000L).foreach(v => a.add(TextHash.avalanche(v)))
    (25001L to 75000L).foreach(v => b.add(TextHash.avalanche(v)))
    val r = KmvSketch.setOps(a, b)
    assert(!r.exact)
    assert(r.unionSe > 0 && r.intersectSe > 0)
    // se formulas: union cv = 1/sqrt(k-2); estimates within 4 se of truth
    assert(math.abs(r.unionSe - r.unionD / math.sqrt(k - 2.0)) < 1e-9)
    assert(math.abs(r.unionD - 75000.0) <= 4 * r.unionSe,
      s"union ${r.unionD} ± ${r.unionSe}")
    assert(math.abs(r.intersectD - 25000.0) <= 4 * r.intersectSe,
      s"intersect ${r.intersectD} ± ${r.intersectSe}")
    assert(math.abs(r.jaccard - 25000.0 / 75000.0) < 3.0 / math.sqrt(k))
    // estimator is symmetric (sides swap, set results identical)
    val s = KmvSketch.setOps(b, a)
    assert(s.unionD == r.unionD && s.intersectD == r.intersectD)
    assert(s.aD == r.bD && s.containA == r.containB)
    // containment ≈ 0.5 here (25k of A's 50k are shared)
    assert(math.abs(r.containA - 0.5) < 0.1, s"containA=${r.containA}")
    // disjoint saturated sets: intersection estimate collapses toward 0
    val c = new KmvSketch(k)
    (1000001L to 1050000L).foreach(v => c.add(TextHash.avalanche(v)))
    val d = KmvSketch.setOps(a, c)
    assert(d.intersectD <= 4 * d.intersectSe + 1e-9,
      s"disjoint intersect ${d.intersectD} ± ${d.intersectSe}")
  }

  test("empty and degenerate sketches") {
    val e = new KmvSketch(16)
    assert(e.estimateDistinct == 0.0 && e.size == 0 && e.isExact)
    val f = new KmvSketch(16)
    assert(KmvSketch.jaccard(e, f) == 1.0) // both empty: identical sets
    f.add(42L)
    assert(KmvSketch.jaccard(e, f) == 0.0)
    // duplicates collapse
    val d = new KmvSketch(8)
    (0 until 100).foreach(_ => d.add(7L))
    assert(d.size == 1 && d.estimateDistinct == 1.0)
  }

  test("mixed-k merge shrinks to min capacity (no false-exact undercount)") {
    val big = new KmvSketch(1024)
    val small = new KmvSketch(64)
    (1L to 100000L).foreach(v => small.add(TextHash.avalanche(v)))
    (200001L to 200100L).foreach(v => big.add(TextHash.avalanche(v)))
    big.merge(small) // saturated small sketch into roomy big sketch
    assert(big.k == 64, "capacity must shrink to min")
    assert(!big.isExact, "must not report exact after absorbing a saturated sketch")
    val est = big.estimateDistinct
    assert(est > 50000, s"undercount: $est") // ~100100 true distinct
    // merge order must not change the outcome class
    val big2 = new KmvSketch(1024)
    (200001L to 200100L).foreach(v => big2.add(TextHash.avalanche(v)))
    val small2 = new KmvSketch(64)
    (1L to 100000L).foreach(v => small2.add(TextHash.avalanche(v)))
    small2.merge(big2)
    assert(small2.k == 64 && !small2.isExact)
    assert(math.abs(small2.estimateDistinct - est) / est < 0.35)
  }
}
